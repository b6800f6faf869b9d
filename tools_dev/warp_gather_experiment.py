"""Warp-gather formulation shootout at the train-step shape:
(12, 192, 640, 12ch f32) source, 1.47M sites, 48B rows.

Variants: batched take_along_axis (current), flat axis-0 take (global
indices), explicit lax.gather, bf16 rows, and 2-slice lax.gather
((1,2,2C) windows). Slope-timed, forward only.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

N, H, W, C4 = 12, 192, 640, 12


def slope(fn, ks=(1, 9), reps=3):
    for k in ks:
        fn(k)
    out = {}
    for k in ks:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(k)
            ts.append(time.perf_counter() - t0)
        out[k] = min(ts)
    return (out[max(ks)] - out[min(ks)]) / (max(ks) - min(ks))


def bench(name, fn, cat, idx):
    @functools.partial(jax.jit, static_argnames="reps")
    def chain(cat, idx, reps):
        acc = jnp.zeros((), jnp.float32)
        for r in range(reps):
            v = fn(cat, (idx + r) % (H * W))
            acc = acc + v.astype(jnp.float32).sum()
        return acc
    try:
        s = slope(lambda k: float(chain(cat, idx, reps=k)))
        print(json.dumps({"case": name, "ms": round(s * 1e3, 3)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"case": name,
                          "err": f"{type(e).__name__}: {str(e)[:90]}"}),
              flush=True)


def main():
    rng = jax.random.PRNGKey(0)
    cat = jax.random.normal(rng, (N, H, W, C4), jnp.float32)
    # smooth near-raster indices like a real warp
    base = jnp.tile(jnp.arange(H * W, dtype=jnp.int32)[None], (N, 1))
    jit = jax.random.randint(rng, (N, H * W), -40, 40, jnp.int32)
    idx = jnp.clip(base + jit, 0, H * W - 1)

    def v_tal(cat, idx):
        flat = cat.reshape(N, H * W, C4)
        return jnp.take_along_axis(flat, idx[..., None], axis=1)
    bench("take_along_axis (current)", v_tal, cat, idx)

    def v_flat0(cat, idx):
        flat = cat.reshape(N * H * W, C4)
        g = (jnp.arange(N, dtype=jnp.int32)[:, None] * (H * W) + idx
             ).reshape(-1)
        return jnp.take(flat, g, axis=0)
    bench("flat axis-0 take", v_flat0, cat, idx)

    def v_bf16(cat, idx):
        flat = cat.astype(jnp.bfloat16).reshape(N, H * W, C4)
        return jnp.take_along_axis(flat, idx[..., None], axis=1)
    bench("take_along_axis bf16", v_bf16, cat, idx)

    def v_flat0_bf16(cat, idx):
        flat = cat.astype(jnp.bfloat16).reshape(N * H * W, C4)
        g = (jnp.arange(N, dtype=jnp.int32)[:, None] * (H * W) + idx
             ).reshape(-1)
        return jnp.take(flat, g, axis=0)
    bench("flat axis-0 take bf16", v_flat0_bf16, cat, idx)

    def v_gather2(cat, idx):
        # (1, 2, 6ch) slices from (N, H, W, 2C): both x-neighbours in
        # one descriptor; needs only [img, down] channel stack (half the
        # concat work of the 4-stack).
        src = cat.reshape(N, H, W, C4)[..., : C4 // 2]
        y0 = idx // W
        x0 = idx % W
        starts = jnp.stack([y0, jnp.minimum(x0, W - 2)], axis=-1)
        dnums = lax.GatherDimensionNumbers(
            offset_dims=(2, 3, 4),
            collapsed_slice_dims=(),
            start_index_map=(1, 2),
            operand_batching_dims=(0,),
            start_indices_batching_dims=(0,))
        return lax.gather(src, starts, dnums,
                          slice_sizes=(1, 1, 2, C4 // 2),
                          mode=lax.GatherScatterMode.CLIP)
    bench("lax.gather (1,2,C) slices", v_gather2, cat, idx)


if __name__ == "__main__":
    main()
