"""Round-2b baseline: post-head-fusion dense/sparse slope timings and
tile-activity statistics of the bench masks (thresh 0.2, random-init
weights, batch 16) for candidate tile shapes — the numbers that decide
the compacted-tile sparse engine design."""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B, H, W, TH = 16, 192, 640, 0.2
K0, K1 = 1, 9


def slope(fn, reps=3):
    for k in (K0, K1):
        fn(k)
    out = {}
    for k in (K0, K1):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(k)
            ts.append(time.perf_counter() - t0)
        out[k] = min(ts)
    return (out[K1] - out[K0]) / (K1 - K0)


def main():
    from wavelet_monodepth_tpu.models.decoders_kitti import \
        KittiWaveletDecoder
    from wavelet_monodepth_tpu.models.resnet import ResnetEncoder, \
        num_ch_enc

    rng = jax.random.PRNGKey(0)
    encoder = ResnetEncoder(num_layers=18)
    decoder = KittiWaveletDecoder(num_ch_enc=num_ch_enc(18))
    x1 = jax.random.uniform(rng, (1, H, W, 3), jnp.float32)
    enc_vars = encoder.init(rng, x1)
    dec_vars = decoder.init(rng, encoder.apply(enc_vars, x1))
    x = jax.random.uniform(rng, (B, H, W, 3), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("k", "th"))
    def chained(ev, dv, img, k, th=None):
        def body(i, carry):
            img_i = img + (carry * 1e-9).astype(img.dtype)
            if th is None:
                d = decoder.apply(dv, encoder.apply(ev, img_i))[("disp", 0)]
            else:
                d = decoder.apply(dv, encoder.apply(ev, img_i),
                                  thresh_ratio=th)[("disp", 0)]
            return carry + d.sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    res = {}
    for name, (vars_, img, th) in {
        "dense_f32": ((enc_vars, dec_vars), x, None),
        "masked_f32": ((enc_vars, dec_vars), x, TH),
    }.items():
        ev, dv = vars_
        t = slope(lambda k: float(chained(ev, dv, img, k, th)))
        res[name] = {"ms_per_eval": round(t * 1e3, 3),
                     "us_per_frame": round(t / B * 1e6, 1)}
        print(name, res[name], flush=True)

    evb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), enc_vars)
    dvb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), dec_vars)
    xb = x.astype(jnp.bfloat16)
    for name, th in {"dense_bf16": None, "masked_bf16": TH}.items():
        t = slope(lambda k: float(chained(evb, dvb, xb, k, th)))
        res[name] = {"ms_per_eval": round(t * 1e3, 3),
                     "us_per_frame": round(t / B * 1e6, 1)}
        print(name, res[name], flush=True)

    # ----- mask statistics ---------------------------------------------
    @jax.jit
    def get_masks(ev, dv, img):
        out = decoder.apply(dv, encoder.apply(ev, img), thresh_ratio=TH)
        keep = {}
        for s in (0, 1, 2):
            for kind in ("upconv0_mask", "upconv1_mask", "wavelet_mask",
                         "lowres_mask"):
                keep[(kind, s)] = out[(kind, s)]
        return keep

    masks = jax.device_get(get_masks(enc_vars, dec_vars, x))
    stats = {}
    for (kind, s), m in masks.items():
        m = np.asarray(m)[..., 0]          # (B, h, w)
        dens = float(m.mean())
        row = {"shape": list(m.shape[1:]), "density": round(dens, 4)}
        for th_, tw_ in ((8, 32), (8, 64), (8, 128), (16, 64), (16, 128),
                         (16, 256), (32, 128)):
            hh, ww = m.shape[1], m.shape[2]
            nh, nw = -(-hh // th_), -(-ww // tw_)
            if nh * nw < 2:
                continue
            pad = np.zeros((m.shape[0], nh * th_, nw * tw_), m.dtype)
            pad[:, :hh, :ww] = m
            t = pad.reshape(m.shape[0], nh, th_, nw, tw_)
            act = (t.max(axis=(2, 4)) > 0).mean()
            row[f"act_{th_}x{tw_}"] = round(float(act), 3)
        stats[f"{kind}_s{s}"] = row
        print(f"{kind}_s{s}", row, flush=True)

    res["mask_stats"] = stats
    print(json.dumps(res))


if __name__ == "__main__":
    main()
