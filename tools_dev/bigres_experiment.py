"""Decisive round-2 measurement: (a) whole-net dense vs masked after
head fusion + stem fold (640x192, f32/bf16); (b) scale-1 stage at
1024x320 — dense vs masked vs tile-compact(xla-io) — where tile
activity is structurally lower. One process = one window."""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

K1, K2 = 1, 9


def slope(fn, reps=3):
    for k in (K1, K2):
        fn(k)
    out = {}
    for k in (K1, K2):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(k)
            ts.append(time.perf_counter() - t0)
        out[k] = min(ts)
    return (out[K2] - out[K1]) / (K2 - K1)


def main():
    from wavelet_monodepth_tpu.models.decoders_kitti import \
        KittiWaveletDecoder
    from wavelet_monodepth_tpu.models.resnet import ResnetEncoder, \
        num_ch_enc
    from wavelet_monodepth_tpu.ops import sparse as sp
    from wavelet_monodepth_tpu.ops.compact import (compact_wave_stage,
                                                   tile_scores)
    from wavelet_monodepth_tpu.utils import maskgen as mg

    res = {}

    # ---------- (a) whole-net 640x192 batch 16 --------------------------
    B, H, W = 16, 192, 640
    disp = mg.synthetic_depth_scene(B, H, W, seed=0)
    masks_np, ratio, dens = mg.masks_at_density(disp, 0.10)
    res["agg_density"] = round(dens, 4)
    x = jnp.asarray(mg.scene_image(disp, seed=0))
    masks = {i: jnp.asarray(m) for i, m in masks_np.items()}

    rng = jax.random.PRNGKey(0)
    encoder = ResnetEncoder(num_layers=18)
    decoder = KittiWaveletDecoder(num_ch_enc=num_ch_enc(18))
    ev = encoder.init(rng, x[:1])
    dv = decoder.init(rng, encoder.apply(ev, x[:1]))

    @functools.partial(jax.jit, static_argnames=("k", "mode"))
    def whole(ev_, dv_, img, mo, k, mode):
        def body(i, carry):
            img_i = img + (carry * 1e-9).astype(img.dtype)
            feats = encoder.apply(ev_, img_i)
            if mode == "dense":
                d = decoder.apply(dv_, feats)[("disp", 0)]
            else:
                d = decoder.apply(dv_, feats, thresh_ratio=ratio,
                                  mask_override=mo)[("disp", 0)]
            return carry + d.sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    def run_whole(label, ev_, dv_, img, mo, mode):
        try:
            t = slope(lambda k: float(whole(ev_, dv_, img, mo, k, mode)))
            res[label] = {"ms_eval": round(t * 1e3, 3),
                          "fps": round(B / t, 1)}
        except Exception as e:
            res[label] = f"ERR {type(e).__name__}: {str(e)[:80]}"
        print(label, res[label], flush=True)

    run_whole("net_dense_f32", ev, dv, x, masks, "dense")
    run_whole("net_masked_f32", ev, dv, x, masks, "edge")
    evb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), ev)
    dvb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), dv)
    xb = x.astype(jnp.bfloat16)
    run_whole("net_dense_bf16", evb, dvb, xb, masks, "dense")
    run_whole("net_masked_bf16", evb, dvb, xb, masks, "edge")

    # ---------- (b) scale-1 stage at 1024x320 batch 8 -------------------
    B2, H2, W2 = 8, 320, 1024
    hl, wl, cx, cs, cd = H2 // 4, W2 // 4, 64, 64, 32
    hh, wh = 2 * hl, 2 * wl
    disp2 = mg.synthetic_depth_scene(B2, H2, W2, seed=1)
    masks2, ratio2, dens2 = mg.masks_at_density(disp2, 0.10)
    mask = jnp.asarray(masks2[1])
    res["agg_density_1024"] = round(dens2, 4)

    ks = jax.random.split(rng, 16)
    x2 = jax.random.normal(ks[0], (B2, hl, wl, cx)) * 0.5
    skip2 = jax.random.normal(ks[1], (B2, hh, wh, cs)) * 0.5
    prm = (jax.random.normal(ks[2], (3, 3, cx, cd)) * 0.05,
           jnp.zeros((cd,)),
           jax.random.normal(ks[3], (3, 3, cd + cs, cd)) * 0.05,
           jnp.zeros((cd,)),
           jax.random.normal(ks[4], (1, 1, cd, cd)) * 0.1,
           jnp.zeros((cd,)),
           jax.random.normal(ks[5], (3, 3, cd, 3)) * 0.1,
           jnp.zeros((3,)),
           jax.random.normal(ks[6], (1, 1, cd, cd)) * 0.1,
           jnp.zeros((cd,)),
           jax.random.normal(ks[7], (3, 3, cd, 3)) * 0.1,
           jnp.zeros((3,)))

    def dense_stage(x_, skip_, p):
        from wavelet_monodepth_tpu.ops.convops import conv3x3, conv1x1
        from wavelet_monodepth_tpu.ops.image import upsample_nearest2x
        (w0, b0, w1, b1, wp1, bp1, wp3, bp3, wn1, bn1, wn3, bn3) = p
        x0 = jax.nn.elu(conv3x3(x_, w0, b0))
        cat = jnp.concatenate([upsample_nearest2x(x0), skip_], axis=-1)
        x1 = jax.nn.elu(conv3x3(cat, w1, b1))
        h = conv1x1(x1, jnp.concatenate([wp1, wn1], -1),
                    jnp.concatenate([bp1, bn1]))
        h = jnp.where(h >= 0, h, 0.1 * h)
        w3 = jnp.zeros((3, 3, 2 * cd, 6), x1.dtype)
        w3 = w3.at[:, :, :cd, :3].set(wp3)
        w3 = w3.at[:, :, cd:, 3:].set(wn3)
        y = jax.nn.sigmoid(conv3x3(h, w3, jnp.concatenate([bp3, bn3])))
        return y[..., :3] - y[..., 3:], x1

    def masked_stage(x_, skip_, m_, p):
        (w0, b0, w1, b1, wp1, bp1, wp3, bp3, wn1, bn1, wn3, bn3) = p
        from wavelet_monodepth_tpu.ops.convops import conv3x3, conv1x1
        mm = sp.stage_masks(m_)
        x0 = sp.masked_conv3x3(x_, w0, b0, mm["lowres"], mm["upconv0"],
                               "reflect", jax.nn.elu)
        u = sp.masked_upsample_concat(x0, skip_, mm["upsample"])
        x1 = sp.masked_conv3x3(u, w1, b1, None, mm["upconv1"],
                               "reflect", jax.nn.elu)
        h = conv1x1(x1 * mm["upconv1"], jnp.concatenate([wp1, wn1], -1),
                    jnp.concatenate([bp1, bn1]))
        h = jnp.where(h >= 0, h, 0.1 * h) * mm["upconv1"]
        w3 = jnp.zeros((3, 3, 2 * cd, 6), x1.dtype)
        w3 = w3.at[:, :, :cd, :3].set(wp3)
        w3 = w3.at[:, :, cd:, 3:].set(wn3)
        y = jax.nn.sigmoid(conv3x3(h, w3, jnp.concatenate([bp3, bn3])))
        return (y[..., :3] - y[..., 3:]) * mm["wavelet"], x1

    def run_stage(label, fn, *args):
        @functools.partial(jax.jit, static_argnames="k")
        def bench(k, *a):
            def body(i, carry):
                aa = (a[0] + (carry * 1e-9).astype(a[0].dtype),) + a[1:]
                yh, x1 = fn(*aa)
                return carry + (yh.sum() + x1.sum()).astype(jnp.float32) \
                    * 1e-9
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        try:
            t = slope(lambda k: float(bench(k, *args)))
            res[label] = round(t * 1e3, 3)
        except Exception as e:
            res[label] = f"ERR {type(e).__name__}: {str(e)[:80]}"
        print(label, res[label], flush=True)

    run_stage("stage1024_dense_f32", dense_stage, x2, skip2, prm)
    run_stage("stage1024_masked_f32", masked_stage, x2, skip2, mask, prm)
    sm = sp.stage_masks(mask)
    for th, tw in ((8, 32), (8, 64), (16, 64)):
        act = float((np.asarray(
            tile_scores(sm["upconv1"], th, tw)).reshape(B2, -1) > 0
        ).mean())
        cap = min(1.0, act * 1.15)
        res[f"act1024_{th}x{tw}"] = round(act, 3)
        run_stage(f"stage1024_compact_{th}x{tw}_f32",
                  lambda a, b, c, p, th=th, tw=tw, cap=cap:
                  compact_wave_stage(a, b, c, *p, i_scale=1, th=th,
                                     tw=tw, cap_ratio=cap, io="xla"),
                  x2, skip2, mask, prm)

    x2b = x2.astype(jnp.bfloat16)
    skip2b = skip2.astype(jnp.bfloat16)
    prmb = tuple(p.astype(jnp.bfloat16) for p in prm)
    run_stage("stage1024_dense_bf16", dense_stage, x2b, skip2b, prmb)
    run_stage("stage1024_masked_bf16", masked_stage, x2b, skip2b,
              mask.astype(jnp.bfloat16), prmb)
    for th, tw in ((8, 32),):
        cap = min(1.0, res[f"act1024_{th}x{tw}"] * 1.15)
        run_stage(f"stage1024_compact_{th}x{tw}_bf16",
                  lambda a, b, c, p, th=th, tw=tw, cap=cap:
                  compact_wave_stage(a, b, c, *p, i_scale=1, th=th,
                                     tw=tw, cap_ratio=cap, io="xla"),
                  x2b, skip2b, mask.astype(jnp.bfloat16), prmb)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
