"""Measure scale-1 decoder op variants standalone (slope method).

Targets from the trace (batch 16, f32):
  upconv_1_1 conv (96->32 @ 96x320) ............ 2.11 ms
  waveconv_1 heads (2x [1x1 32->32, leaky, 3x3 32->3] + sigmoids) 2.51 ms

Variants:
  heads_base     — exactly the current math (two heads, jax.nn.leaky_relu)
  heads_where    — leaky as jnp.where
  heads_combined — one 1x1 (32->64) + one block-diagonal 3x3 (64->6)
  heads_*_bf16   — same in bf16
  upconv11_f32 / _bf16 — the big conv alone
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, H, W, C = 16, 96, 320, 32
K1, K2 = 1, 9


def slope(fn, ks=(K1, K2), reps=3):
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


def conv(x, w, b, pad="reflect"):
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=pad)
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def main():
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 12)
    x = jax.random.normal(ks[0], (B, H, W, C), jnp.float32)
    wsq_p = jax.random.normal(ks[1], (1, 1, C, C)) * 0.1
    wsq_n = jax.random.normal(ks[2], (1, 1, C, C)) * 0.1
    bsq_p = jax.random.normal(ks[3], (C,)) * 0.1
    bsq_n = jax.random.normal(ks[4], (C,)) * 0.1
    wc_p = jax.random.normal(ks[5], (3, 3, C, 3)) * 0.1
    wc_n = jax.random.normal(ks[6], (3, 3, C, 3)) * 0.1
    bc_p = jax.random.normal(ks[7], (3,)) * 0.1
    bc_n = jax.random.normal(ks[8], (3,)) * 0.1
    w11 = jax.random.normal(ks[9], (3, 3, 96, 32)) * 0.05
    b11 = jax.random.normal(ks[10], (32,)) * 0.1
    x96 = jax.random.normal(ks[11], (B, H, W, 96), jnp.float32)

    def heads_base(xx):
        hp = jax.nn.leaky_relu(
            jax.lax.conv_general_dilated(
                xx, wsq_p.astype(xx.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            + bsq_p.astype(xx.dtype), 0.1)
        hn = jax.nn.leaky_relu(
            jax.lax.conv_general_dilated(
                xx, wsq_n.astype(xx.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            + bsq_n.astype(xx.dtype), 0.1)
        yp = jax.nn.sigmoid(conv(hp, wc_p.astype(xx.dtype),
                                 bc_p.astype(xx.dtype)))
        yn = jax.nn.sigmoid(conv(hn, wc_n.astype(xx.dtype),
                                 bc_n.astype(xx.dtype)))
        return yp - yn

    def heads_where(xx):
        def leaky(v):
            return jnp.where(v >= 0, v, 0.1 * v)
        hp = leaky(jax.lax.conv_general_dilated(
            xx, wsq_p.astype(xx.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
            + bsq_p.astype(xx.dtype))
        hn = leaky(jax.lax.conv_general_dilated(
            xx, wsq_n.astype(xx.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
            + bsq_n.astype(xx.dtype))
        yp = jax.nn.sigmoid(conv(hp, wc_p.astype(xx.dtype),
                                 bc_p.astype(xx.dtype)))
        yn = jax.nn.sigmoid(conv(hn, wc_n.astype(xx.dtype),
                                 bc_n.astype(xx.dtype)))
        return yp - yn

    def heads_combined(xx):
        wsq = jnp.concatenate([wsq_p, wsq_n], axis=-1).astype(xx.dtype)
        bsq = jnp.concatenate([bsq_p, bsq_n]).astype(xx.dtype)
        h = jax.lax.conv_general_dilated(
            xx, wsq, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bsq
        h = jnp.where(h >= 0, h, 0.1 * h)
        wc = jnp.zeros((3, 3, 2 * C, 6), xx.dtype)
        wc = wc.at[:, :, :C, :3].set(wc_p.astype(xx.dtype))
        wc = wc.at[:, :, C:, 3:].set(wc_n.astype(xx.dtype))
        bc = jnp.concatenate([bc_p, bc_n]).astype(xx.dtype)
        y = jax.nn.sigmoid(conv(h, wc, bc))
        return y[..., :3] - y[..., 3:]

    def upconv11(xx):
        y = conv(xx, w11.astype(xx.dtype), b11.astype(xx.dtype))
        return jax.nn.elu(y)

    def chain(fn, x0, k):
        y = x0
        carry = jnp.zeros((), jnp.float32)
        for _ in range(k):
            out = fn(x0 + (carry * 1e-9).astype(x0.dtype))
            carry = carry + out.sum().astype(jnp.float32)
        return carry

    cases = {
        "heads_base_f32": (heads_base, x),
        "heads_where_f32": (heads_where, x),
        "heads_combined_f32": (heads_combined, x),
        "heads_base_bf16": (heads_base, x.astype(jnp.bfloat16)),
        "heads_combined_bf16": (heads_combined, x.astype(jnp.bfloat16)),
        "upconv11_f32": (upconv11, x96),
        "upconv11_bf16": (upconv11, x96.astype(jnp.bfloat16)),
    }
    # numeric check first (CPU-exactness not needed; just sanity)
    ref = heads_base(x)
    for name in ("heads_where_f32", "heads_combined_f32"):
        fn, xx = cases[name]
        err = float(jnp.max(jnp.abs(fn(xx) - ref)))
        print(json.dumps({"check": name, "maxerr_vs_base": err}),
              flush=True)

    for name, (fn, xx) in cases.items():
        jfn = jax.jit(functools.partial(chain, fn, xx),
                      static_argnames=("k",))
        s = slope(lambda k: float(jfn(k=k)))
        print(json.dumps({"case": name, "ms_per_eval": s * 1e3}),
              flush=True)


if __name__ == "__main__":
    main()
