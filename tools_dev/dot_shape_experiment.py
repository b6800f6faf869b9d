"""MXU shape microbench: how do thin output dims cost on the v5e?

The decoder's convs are GEMMs with tiny N (cout 32/6) and huge M
(spatial). If time scales with ceil(N/128) the standard orientation
wastes 4-20x; if the transposed orientation (N=spatial, M=cout) is
cheaper, the fused kernel should hold activations channels-major.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

S = 30720 * 16      # batch-16 scale-1 spatial sites


def slope(fn, ks=(1, 17), reps=3):
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

    def bench(m, k, n, dt, tag):
        a = jax.random.normal(rng, (m, k), jnp.float32).astype(dt) * 0.1
        b = jax.random.normal(rng, (k, n), jnp.float32).astype(dt) * 0.1

        def chain(a_, b_, reps):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(reps):
                y = (a_ + (acc * 1e-9).astype(dt)) @ b_
                acc = acc + y.sum().astype(jnp.float32)
                del y
            return acc
        jfn2 = jax.jit(chain, static_argnames=("reps",))
        s = slope(lambda kk: float(jfn2(a, b, reps=kk)))
        flops = 2 * m * k * n
        print(json.dumps({"case": tag, "ms": s * 1e3,
                          "tflops": flops / s / 1e12}), flush=True)

    for dt, t in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        bench(S, 288, 32, dt, f"M=S K=288 N=32 {t}")
        bench(S, 864, 32, dt, f"M=S K=864 N=32 {t}")
        bench(S, 864, 128, dt, f"M=S K=864 N=128 {t}")
        bench(S, 576, 6, dt, f"M=S K=576 N=6 {t}")
    # transposed orientation: wide N = spatial, skinny M = channels
    for dt, t in ((jnp.bfloat16, "bf16"),):
        bench(32, 288, S, dt, f"M=32 K=288 N=S {t}")
        bench(32, 864, S, dt, f"M=32 K=864 N=S {t}")
        bench(6, 576, S, dt, f"M=6 K=576 N=S {t}")
        bench(128, 864, S, dt, f"M=128 K=864 N=S {t}")


if __name__ == "__main__":
    main()
