"""Scale-1 stage on TPU: dense vs masked vs tile-compacted
(ops/compact.py) at edge-structured masks, sweeping tile shape and
dtype. One process = one measurement window (shared-tenancy device)."""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B = 16
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
    from wavelet_monodepth_tpu.ops import sparse as sp
    from wavelet_monodepth_tpu.ops.compact import (compact_wave_stage,
                                                   tile_scores)
    from wavelet_monodepth_tpu.utils import maskgen as mg

    hl, wl, cx, cs, cd = 48, 160, 64, 64, 32
    hh, wh = 2 * hl, 2 * wl

    disp = mg.synthetic_depth_scene(B, 192, 640, seed=0)
    masks, ratio, dens = mg.masks_at_density(disp, 0.10)
    mask = jnp.asarray(masks[1])                      # (B, 48, 160, 1)
    res = {"agg_density": round(dens, 4),
           "raw_density_s1": round(float(mask.mean()), 4)}

    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 16)
    x = jax.random.normal(ks[0], (B, hl, wl, cx)) * 0.5
    skip = jax.random.normal(ks[1], (B, hh, wh, cs)) * 0.5
    w0 = jax.random.normal(ks[2], (3, 3, cx, cd)) * 0.05
    b0 = jnp.zeros((cd,))
    w1 = jax.random.normal(ks[3], (3, 3, cd + cs, cd)) * 0.05
    b1 = jnp.zeros((cd,))
    wp1 = jax.random.normal(ks[4], (1, 1, cd, cd)) * 0.1
    bp1 = jnp.zeros((cd,))
    wp3 = jax.random.normal(ks[5], (3, 3, cd, 3)) * 0.1
    bp3 = jnp.zeros((3,))
    wn1 = jax.random.normal(ks[6], (1, 1, cd, cd)) * 0.1
    bn1 = jnp.zeros((cd,))
    wn3 = jax.random.normal(ks[7], (3, 3, cd, 3)) * 0.1
    bn3 = jnp.zeros((3,))
    params = (w0, b0, w1, b1, wp1, bp1, wp3, bp3, wn1, bn1, wn3, bn3)

    def dense_stage(x_, skip_, prm):
        (w0_, b0_, w1_, b1_, wp1_, bp1_, wp3_, bp3_, wn1_, bn1_, wn3_,
         bn3_) = prm
        from wavelet_monodepth_tpu.ops.convops import conv3x3, conv1x1
        from wavelet_monodepth_tpu.ops.image import upsample_nearest2x
        x0 = jax.nn.elu(conv3x3(x_, w0_, b0_))
        cat = jnp.concatenate([upsample_nearest2x(x0), skip_], axis=-1)
        x1 = jax.nn.elu(conv3x3(cat, w1_, b1_))
        w1h = jnp.concatenate([wp1_, wn1_], axis=-1)
        b1h = jnp.concatenate([bp1_, bn1_])
        h = conv1x1(x1, w1h, b1h)
        h = jnp.where(h >= 0, h, 0.1 * h)
        w3 = jnp.zeros((3, 3, 2 * cd, 6), x1.dtype)
        w3 = w3.at[:, :, :cd, :3].set(wp3_)
        w3 = w3.at[:, :, cd:, 3:].set(wn3_)
        b3 = jnp.concatenate([bp3_, bn3_])
        y = jax.nn.sigmoid(conv3x3(h, w3, b3))
        return y[..., :3] - y[..., 3:], x1

    def masked_stage(x_, skip_, m_, prm):
        (w0_, b0_, w1_, b1_, wp1_, bp1_, wp3_, bp3_, wn1_, bn1_, wn3_,
         bn3_) = prm
        mm = sp.stage_masks(m_)
        x0 = sp.masked_conv3x3(x_, w0_, b0_, mm["lowres"], mm["upconv0"],
                               "reflect", jax.nn.elu)
        u = sp.masked_upsample_concat(x0, skip_, mm["upsample"])
        x1 = sp.masked_conv3x3(u, w1_, b1_, None, mm["upconv1"],
                               "reflect", jax.nn.elu)
        from wavelet_monodepth_tpu.ops.convops import conv3x3, conv1x1
        w1h = jnp.concatenate([wp1_, wn1_], axis=-1)
        b1h = jnp.concatenate([bp1_, bn1_])
        h = conv1x1(x1 * mm["upconv1"], w1h, b1h)
        h = jnp.where(h >= 0, h, 0.1 * h) * mm["upconv1"]
        w3 = jnp.zeros((3, 3, 2 * cd, 6), x1.dtype)
        w3 = w3.at[:, :, :cd, :3].set(wp3_)
        w3 = w3.at[:, :, cd:, 3:].set(wn3_)
        b3 = jnp.concatenate([bp3_, bn3_])
        y = jax.nn.sigmoid(conv3x3(h, b=b3, w=w3))
        return (y[..., :3] - y[..., 3:]) * mm["wavelet"], x1

    def run(label, fn, *args):
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

    run("dense_f32", dense_stage, x, skip, params)
    run("masked_f32", masked_stage, x, skip, mask, params)

    # tile-compact sweeps; capacity set from measured activity + margin
    sm = sp.stage_masks(mask)
    for th, tw in ((8, 16), (8, 32), (8, 64), (16, 32)):
        act = float((np.asarray(
            tile_scores(sm["upconv1"], th, tw)).reshape(B, -1) > 0
        ).mean())
        cap = min(1.0, act * 1.15)
        run(f"compactP_{th}x{tw}_f32",
            lambda x_, s_, m_, prm, th=th, tw=tw, cap=cap:
            compact_wave_stage(x_, s_, m_, *prm, i_scale=1, th=th,
                               tw=tw, cap_ratio=cap, io="pallas"),
            x, skip, mask, params)
        res[f"activity_{th}x{tw}"] = round(act, 3)

    # bf16 variants of the best candidates
    xb, skb = x.astype(jnp.bfloat16), skip.astype(jnp.bfloat16)
    prmb = tuple(p.astype(jnp.bfloat16) for p in params)
    run("dense_bf16", dense_stage, xb, skb, prmb)
    run("masked_bf16", masked_stage, xb, skb, mask.astype(jnp.bfloat16),
        prmb)
    for th, tw in ((8, 16), (8, 32)):
        act = res[f"activity_{th}x{tw}"]
        cap = min(1.0, act * 1.15)
        run(f"compactP_{th}x{tw}_bf16",
            lambda x_, s_, m_, prm, th=th, tw=tw, cap=cap:
            compact_wave_stage(x_, s_, m_, *prm, i_scale=1, th=th,
                               tw=tw, cap_ratio=cap, io="pallas"),
            xb, skb, mask.astype(jnp.bfloat16), prmb)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
