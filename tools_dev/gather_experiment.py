"""Primitive microbench for the pixel-granular (site-compacted) sparse
engine: XLA row-gather / row-scatter / index-build / compacted-GEMM
throughput at KITTI scale-1 shapes, vs the dense conv bar.

The reference's sparse engine is gather -> GEMM -> scatter per conv
(KITTI/layers.py:409-480). Tile-granular skipping cannot win on real
edge masks (thin curves touch ~half the tiles — see PERF.md round-2
mask-stats); the pixel-granular XLA formulation scales with density IF
row gathers/scatters run near HBM bandwidth. This measures that.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B, HL, WL, CX = 16, 48, 160, 64        # scale-1 lo-res entry
HH, WH = 96, 320                       # scale-1 hi-res
CS, CD = 64, 32
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
    from wavelet_monodepth_tpu.utils import maskgen as mg
    from wavelet_monodepth_tpu.ops.sparse import stage_masks

    res = {}
    disp = mg.synthetic_depth_scene(B, 192, 640, seed=0)
    masks, ratio, dens = mg.masks_at_density(disp, 0.10)
    sm = stage_masks(jnp.asarray(masks[1]))
    m_u1 = np.asarray(sm["upconv1"])[..., 0]          # (B, 96, 320)
    res["u1_density"] = float(m_u1.mean())

    # site list (raster order, zero-padded to static K)
    flat = m_u1.reshape(-1)
    sites = np.nonzero(flat)[0].astype(np.int32)
    kcap = int(1.15 * len(sites))
    sites = np.pad(sites, (0, kcap - len(sites)))
    res["n_sites"] = int((flat > 0).sum())
    res["kcap"] = kcap

    # dense padded feature map analog (cat after pad: B, 98, 322, 96)
    rng = jax.random.PRNGKey(0)
    hp, wp = HH + 2, WH + 2
    catp = jax.random.normal(rng, (B * hp * wp, CS + CD), jnp.float32)
    w1 = jax.random.normal(rng, (3, 3, CS + CD, CD), jnp.float32) * 0.05
    b1 = jnp.zeros((CD,))

    # map hi-res site id (b, y, x) -> padded flat row id of (y+1, x+1)
    bb, rem = np.divmod(sites, HH * WH)
    yy, xx = np.divmod(rem, WH)
    prow = (bb * hp + (yy + 1)) * wp + (xx + 1)
    prow = jnp.asarray(prow.astype(np.int32))

    # --- 1. row gather: triple rows (x-1..x+1) at y-1, y, y+1 ----------
    catp3 = catp.reshape(B * hp, wp * (CS + CD))

    @jax.jit
    def gather_patches(cp, pr):
        c = CS + CD
        rows = []
        for dy in (-1, 0, 1):
            start = (pr + dy * wp - 1) * c
            idx = start[:, None] + jnp.arange(3 * c)[None, :]
            rows.append(jnp.take(cp.reshape(-1), idx, axis=0))
        return jnp.concatenate(rows, axis=-1)        # (K, 9c)

    @functools.partial(jax.jit, static_argnames="k")
    def bench_gather(cp, pr, k):
        def body(i, carry):
            p = gather_patches(cp, pr + (carry.astype(jnp.int32) & 1))
            return carry + p[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    t = slope(lambda k: float(bench_gather(catp, prow, k)))
    gb = kcap * 9 * (CS + CD) * 4 * 2 / 1e9
    res["gather_patches"] = {"ms": round(t * 1e3, 3),
                             "GBps_rw": round(gb / t, 1)}
    print("gather", res["gather_patches"], flush=True)

    # --- 2. compacted conv: gather + GEMM + scatter --------------------
    w1r = w1.reshape(9 * (CS + CD), CD)

    @functools.partial(jax.jit, static_argnames="k")
    def bench_conv_compact(cp, pr, w, b, k):
        def body(i, carry):
            p = gather_patches(cp, pr + (carry.astype(jnp.int32) & 1))
            y = jax.nn.elu(p @ w + b)                # (K, CD)
            out = jnp.zeros((B * HH * WH, CD), jnp.float32)
            out = out.at[pr].set(y)                  # row scatter
            return carry + out.sum() * 1e-12
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    t = slope(lambda k: float(bench_conv_compact(catp, prow, w1r, b1, k)))
    res["conv_compact"] = {"ms": round(t * 1e3, 3)}
    print("conv_compact", res["conv_compact"], flush=True)

    # --- 3. the dense bar: XLA 3x3 VALID conv on the padded map --------
    cat4 = catp.reshape(B, hp, wp, CS + CD)

    @functools.partial(jax.jit, static_argnames="k")
    def bench_conv_dense(c4, w, b, k):
        def body(i, carry):
            y = jax.lax.conv_general_dilated(
                c4 + carry * 1e-12, w, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return carry + jax.nn.elu(y + b).sum() * 1e-12
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    t = slope(lambda k: float(bench_conv_dense(cat4, w1, b1, k)))
    res["conv_dense"] = {"ms": round(t * 1e3, 3)}
    print("conv_dense", res["conv_dense"], flush=True)

    # --- 4. index build: cumsum + scatter vs top_k ---------------------
    mflat = jnp.asarray(flat.astype(np.float32))

    @functools.partial(jax.jit, static_argnames="k")
    def bench_idx(m, k):
        def body(i, carry):
            mm = m + carry * 1e-12
            slot = jnp.cumsum(mm > 0.5) - 1
            pos = jnp.where(mm > 0.5, slot, kcap)
            lst = jnp.zeros((kcap,), jnp.int32).at[pos].set(
                jnp.arange(mm.shape[0], dtype=jnp.int32), mode="drop")
            return carry + lst.sum().astype(jnp.float32) * 1e-12
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    t = slope(lambda k: float(bench_idx(mflat, k)))
    res["index_build_cumsum"] = {"ms": round(t * 1e3, 3)}
    print("index_build", res["index_build_cumsum"], flush=True)

    @functools.partial(jax.jit, static_argnames="k")
    def bench_topk(m, k):
        def body(i, carry):
            _, idx = jax.lax.top_k(m + carry * 1e-12, kcap)
            return carry + idx.sum().astype(jnp.float32) * 1e-12
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    try:
        t = slope(lambda k: float(bench_topk(mflat, k)))
        res["index_build_topk"] = {"ms": round(t * 1e3, 3)}
    except Exception as e:
        res["index_build_topk"] = {"error": str(e)[:100]}
    print("topk", res["index_build_topk"], flush=True)

    # --- 5. bf16 variants of gather+conv -------------------------------
    catb = catp.astype(jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames="k")
    def bench_conv_compact_bf16(cp, pr, w, b, k):
        def body(i, carry):
            c = CS + CD
            rows = []
            for dy in (-1, 0, 1):
                start = (pr + dy * wp - 1 + (carry.astype(jnp.int32)
                                             & 1)) * c
                idx = start[:, None] + jnp.arange(3 * c)[None, :]
                rows.append(jnp.take(cp.reshape(-1), idx, axis=0))
            p = jnp.concatenate(rows, axis=-1)
            y = jax.nn.elu(p @ w + b)
            out = jnp.zeros((B * HH * WH, CD), jnp.bfloat16)
            out = out.at[pr].set(y)
            return carry + out.sum().astype(jnp.float32) * 1e-12
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    t = slope(lambda k: float(bench_conv_compact_bf16(
        catb, prow, w1r.astype(jnp.bfloat16), b1.astype(jnp.bfloat16), k)))
    res["conv_compact_bf16"] = {"ms": round(t * 1e3, 3)}
    print("conv_compact_bf16", res["conv_compact_bf16"], flush=True)

    @functools.partial(jax.jit, static_argnames="k")
    def bench_conv_dense_bf16(c4, w, b, k):
        def body(i, carry):
            y = jax.lax.conv_general_dilated(
                c4 + (carry * 1e-12).astype(jnp.bfloat16), w, (1, 1),
                "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return carry + jax.nn.elu(y + b).sum().astype(jnp.float32) \
                * 1e-12
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    t = slope(lambda k: float(bench_conv_dense_bf16(
        cat4.astype(jnp.bfloat16), w1.astype(jnp.bfloat16),
        b1.astype(jnp.bfloat16), k)))
    res["conv_dense_bf16"] = {"ms": round(t * 1e3, 3)}
    print("conv_dense_bf16", res["conv_dense_bf16"], flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
