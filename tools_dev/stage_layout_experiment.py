"""Scale-1 decoder stage: NHWC vs NCHW layouts, f32 vs bf16 (slope).

Stage (per trace, 4.9 ms of the 8.9 ms net): x (16,48,160,64)
  -> upconv_1_0 (3x3 reflect 64->32 + ELU)
  -> nearest x2 -> concat skip (16,96,320,64) -> 96ch
  -> upconv_1_1 (3x3 reflect 96->32 + ELU)
  -> combined heads (1x1 32->64 + leaky + 3x3 64->6 + sigmoid, pos-neg)
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = 16


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


def main():
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 10)
    x = jax.random.normal(ks[0], (B, 48, 160, 64)) * 0.5
    skip = jax.random.normal(ks[1], (B, 96, 320, 64)) * 0.5
    w00 = jax.random.normal(ks[2], (3, 3, 64, 32)) * 0.05
    b00 = jnp.zeros((32,))
    w11 = jax.random.normal(ks[3], (3, 3, 96, 32)) * 0.05
    b11 = jnp.zeros((32,))
    wsq = jax.random.normal(ks[4], (1, 1, 32, 64)) * 0.1
    bsq = jnp.zeros((64,))
    wc = jax.random.normal(ks[5], (3, 3, 64, 6)) * 0.1
    bc = jnp.zeros((6,))

    def stage_nhwc(xx, sk, dt):
        def conv(v, w, b, dn=("NHWC", "HWIO", "NHWC")):
            v = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)),
                        mode="reflect")
            return jax.lax.conv_general_dilated(
                v, w.astype(dt), (1, 1), "VALID",
                dimension_numbers=dn) + b.astype(dt)
        y = jax.nn.elu(conv(xx, w00, b00))
        n, h, w_, c = y.shape
        y = jnp.broadcast_to(y[:, :, None, :, None, :],
                             (n, h, 2, w_, 2, c)).reshape(n, 2*h, 2*w_, c)
        y = jnp.concatenate([y, sk], axis=-1)
        y = jax.nn.elu(conv(y, w11, b11))
        h2 = jax.lax.conv_general_dilated(
            y, wsq.astype(dt), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bsq.astype(dt)
        h2 = jnp.where(h2 >= 0, h2, 0.1 * h2)
        o = jax.nn.sigmoid(conv(h2, wc, bc))
        return o[..., :3] - o[..., 3:]

    def stage_nchw(xx, sk, dt):
        # xx (B, 64, 48, 160), sk (B, 64, 96, 320)
        def conv(v, w, b):
            v = jnp.pad(v, ((0, 0), (0, 0), (1, 1), (1, 1)),
                        mode="reflect")
            return jax.lax.conv_general_dilated(
                v, w.astype(dt), (1, 1), "VALID",
                dimension_numbers=("NCHW", "HWIO", "NCHW")
            ) + b.astype(dt)[None, :, None, None]
        y = jax.nn.elu(conv(xx, w00, b00))
        n, c, h, w_ = y.shape
        y = jnp.broadcast_to(y[:, :, :, None, :, None],
                             (n, c, h, 2, w_, 2)).reshape(n, c, 2*h, 2*w_)
        y = jnp.concatenate([y, sk], axis=1)
        y = jax.nn.elu(conv(y, w11, b11))
        h2 = jax.lax.conv_general_dilated(
            y, wsq.astype(dt), (1, 1), "VALID",
            dimension_numbers=("NCHW", "HWIO", "NCHW")
        ) + bsq.astype(dt)[None, :, None, None]
        h2 = jnp.where(h2 >= 0, h2, 0.1 * h2)
        o = jax.nn.sigmoid(conv(h2, wc, bc))
        return o[:, :3] - o[:, 3:]

    cases = {}
    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        cases[f"nhwc_{tag}"] = (stage_nhwc, x.astype(dt), skip.astype(dt),
                                dt)
        cases[f"nchw_{tag}"] = (stage_nchw,
                                jnp.transpose(x, (0, 3, 1, 2)).astype(dt),
                                jnp.transpose(skip, (0, 3, 1, 2)
                                              ).astype(dt), dt)

    # numeric sanity: nchw == nhwc
    a = stage_nhwc(x, skip, jnp.float32)
    bb = stage_nchw(jnp.transpose(x, (0, 3, 1, 2)),
                    jnp.transpose(skip, (0, 3, 1, 2)), jnp.float32)
    err = float(jnp.max(jnp.abs(jnp.transpose(bb, (0, 2, 3, 1)) - a)))
    print(json.dumps({"check": "nchw_vs_nhwc", "maxerr": err}), flush=True)

    def chain(fn, x0, sk, dt, k):
        carry = jnp.zeros((), jnp.float32)
        for _ in range(k):
            out = fn(x0 + (carry * 1e-9).astype(x0.dtype), sk, dt)
            carry = carry + out.sum().astype(jnp.float32)
        return carry

    for name, (fn, xx, sk, dt) in cases.items():
        jfn = jax.jit(functools.partial(chain, fn, xx, sk, dt),
                      static_argnames=("k",))
        s = slope(lambda k: float(jfn(k=k)))
        print(json.dumps({"case": name, "ms_per_eval": s * 1e3}),
              flush=True)


if __name__ == "__main__":
    main()
