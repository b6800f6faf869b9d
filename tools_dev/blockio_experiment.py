"""Block-granular gather/scatter candidates for the tile-compact engine.

Attribution (PERF.md round-2b): compacted-tile CONVS cost 0.32 ms vs
3.67 ms dense stage — the engine loses only on glue (pretile+take 2.64,
scatter 1.48). This measures block-IO variants at (8,32) tiles, K=921:
  gather: pretile+take (baseline) | vmap(dynamic_slice) windows
  scatter: .at[idx].set on tile stack (baseline) | windowed lax.scatter
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

B, HH, WH, C = 16, 96, 320, 64
TH, TW, HALO = 8, 32, 2
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
    res = {}
    rng = jax.random.PRNGKey(0)
    nh, nw = HH // TH, WH // TW
    kcap = 921
    x = jax.random.normal(rng, (B, HH + 2 * HALO, WH + 2 * HALO, C),
                          jnp.float32)

    tid = (jnp.arange(kcap, dtype=jnp.int32) * 7) % (B * nh * nw)
    bb = tid // (nh * nw)
    ty = (tid // nw) % nh
    tx = tid % nw

    def run(label, fn, *args):
        @functools.partial(jax.jit, static_argnames="k")
        def bench(k, *a):
            def body(i, carry):
                aa = (a[0] + (carry * 1e-9).astype(a[0].dtype),) + a[1:]
                return carry + fn(*aa).sum().astype(jnp.float32) * 1e-9
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        try:
            t = slope(lambda k: float(bench(k, *args)))
            res[label] = round(t * 1e3, 3)
        except Exception as e:
            res[label] = f"ERR {type(e).__name__}: {str(e)[:90]}"
        print(label, res[label], flush=True)

    # ---- gather via vmapped dynamic_slice windows ----------------------
    def gather_vds(x_, b_, y_, x2_):
        def one(bi, yi, xi):
            return jax.lax.dynamic_slice(
                x_, (bi, yi, xi, 0),
                (1, TH + 2 * HALO, TW + 2 * HALO, C))[0]
        return jax.vmap(one)(b_, y_ * TH, x2_ * TW)
    run("gather_vmap_ds", gather_vds, x, bb, ty, tx)

    # ---- gather via one-hot matmul (MXU as a crossbar) ------------------
    # rows: (B*nh, (TH+2H)*Wp*C) row-slabs; one-hot (K, B*nh) selects row
    # slabs, columns sliced after. Probably memory-crazy; measure anyway.
    # (skipped: slab width Wp*C*(TH+4) too large)

    # ---- scatter variants ----------------------------------------------
    vals = jax.random.normal(rng, (kcap, TH, TW, 32), jnp.float32)

    def scatter_stack(v_, t_):
        out = jnp.zeros((B * nh * nw, TH, TW, 32), v_.dtype)
        out = out.at[t_].set(v_)
        return out.reshape(B, nh, nw, TH, TW, 32).transpose(
            0, 1, 3, 2, 4, 5).reshape(B, HH, WH, 32)
    run("scatter_stack_baseline", scatter_stack, vals, tid)

    def scatter_windowed(v_, b_, y_, x2_):
        idx = jnp.stack([b_, y_ * TH, x2_ * TW], axis=-1)
        return jnp.zeros((B, HH, WH, 32), v_.dtype).at[
            b_[:, None, None, None],
            (y_ * TH)[:, None, None, None]
            + jnp.arange(TH)[None, :, None, None],
            (x2_ * TW)[:, None, None, None]
            + jnp.arange(TW)[None, None, :, None],
            jnp.arange(32)[None, None, None, :]].set(v_)
    run("scatter_windowed_fancy", scatter_windowed, vals, bb, ty, tx)

    def scatter_lax(v_, b_, y_, x2_):
        idx = jnp.stack([b_, y_ * TH, x2_ * TW], axis=-1)
        dn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2, 3),
            inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0, 1, 2))
        return jax.lax.scatter(
            jnp.zeros((B, HH, WH, 32), v_.dtype), idx,
            v_, dn, indices_are_sorted=False, unique_indices=True,
            mode=jax.lax.GatherScatterMode.CLIP)
    run("scatter_lax_windowed", scatter_lax, vals, bb, ty, tx)

    # window-scatter but into the (B*nT, th, tw, c) stack (aligned rows)
    def scatter_stack_rows(v_, t_):
        out = jnp.zeros((B * nh * nw, TH * TW * 32), v_.dtype)
        return out.at[t_].set(v_.reshape(kcap, -1))
    run("scatter_stack_flatrows", scatter_stack_rows, vals, tid)

    # gather via take of flat tile rows (contiguous 32KB rows)
    stack = jax.random.normal(rng, (B * nh * nw, TH * TW * 32))

    def gather_flatrows(s_, t_):
        return jnp.take(s_, t_, axis=0)
    run("gather_take_flatrows", gather_flatrows, stack, tid)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
