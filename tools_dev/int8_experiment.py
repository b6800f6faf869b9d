"""int8 conv probe on the v5e: is s8xs8->s32 conv fast enough to beat
bf16 at this model's conv shapes?

The net runs at ~22% of bf16 peak (bandwidth-bound, PERF.md TRACED), so
halving weight+activation bytes could win even without the 2x int8 MXU
rate. Two timings per shape: raw conv (chained via wrapping astype) and
conv + realistic dequant->clip->requant epilogue (the cost a dynamic
quantized serving path would actually pay between layers).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

B = 16
DIMS = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                  ("NHWC", "HWIO", "NHWC"))


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


def conv(x, w, stride=1):
    return lax.conv_general_dilated(
        x, w, (stride, stride), "SAME", dimension_numbers=DIMS,
        preferred_element_type=jnp.int32 if x.dtype == jnp.int8 else None)


def bench_case(tag, h, w_, cin, cout, ksz=3, stride=1):
    rng = jax.random.PRNGKey(0)
    res = {"case": tag}
    flops = 2 * B * (h // stride) * (w_ // stride) * ksz * ksz * cin * cout

    # bf16 baseline: conv + leaky epilogue, chained through a 1x1 mixer
    # back to cin channels so iterations serialize.
    xb = (jax.random.normal(rng, (B, h, w_, cin), jnp.float32) * 0.1
          ).astype(jnp.bfloat16)
    wb = (jax.random.normal(rng, (ksz, ksz, cin, cout), jnp.float32) * 0.1
          ).astype(jnp.bfloat16)
    mixb = (jax.random.normal(rng, (1, 1, cout, cin), jnp.float32) * 0.1
            ).astype(jnp.bfloat16)

    def chain_bf16(x, w, mix, reps):
        for _ in range(reps):
            y = jax.nn.leaky_relu(conv(x, w, stride), 0.2)
            if stride > 1:
                y = jnp.repeat(jnp.repeat(y, stride, 1), stride, 2)
            x = conv(y, mix).astype(jnp.bfloat16)
        return x.sum()
    j = jax.jit(chain_bf16, static_argnames="reps")
    s = slope(lambda k: float(j(xb, wb, mixb, reps=k)))
    res["bf16_ms"] = round(s * 1e3, 4)
    res["bf16_tflops"] = round(flops / s / 1e12, 1)

    # int8: s8 conv -> s32 -> f32 scale + leaky + dynamic requant to s8
    xi = jax.random.randint(rng, (B, h, w_, cin), -127, 128, jnp.int8)
    wi = jax.random.randint(rng, (ksz, ksz, cin, cout), -127, 128, jnp.int8)
    mixi = jax.random.randint(rng, (1, 1, cout, cin), -127, 128, jnp.int8)

    def requant(y32, scale):
        yf = y32.astype(jnp.float32) * scale
        yf = jax.nn.leaky_relu(yf, 0.2)
        s_ = 127.0 / (jnp.max(jnp.abs(yf)) + 1e-8)
        return jnp.clip(jnp.round(yf * s_), -127, 127).astype(jnp.int8)

    def chain_i8(x, w, mix, reps):
        for _ in range(reps):
            y = requant(conv(x, w, stride), 1e-4)
            if stride > 1:
                y = jnp.repeat(jnp.repeat(y, stride, 1), stride, 2)
            x = requant(conv(y, mix), 1e-4)
        return x.astype(jnp.int32).sum()
    try:
        j = jax.jit(chain_i8, static_argnames="reps")
        s = slope(lambda k: int(j(xi, wi, mixi, reps=k)))
        res["int8_ms"] = round(s * 1e3, 4)
        res["int8_tops"] = round(flops / s / 1e12, 1)
        res["speedup"] = round(res["bf16_ms"] / res["int8_ms"], 2)
    except Exception as e:
        res["int8_ms"] = f"ERR {type(e).__name__}: {str(e)[:100]}"
    print(json.dumps(res), flush=True)


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    bench_case("stem 7x7/2 3->64 @192x640", 192, 640, 3, 64, 7, 2)
    bench_case("layer1 3x3 64->64 @48x160", 48, 160, 64, 64)
    bench_case("layer2 3x3 128->128 @24x80", 24, 80, 128, 128)
    bench_case("layer3 3x3 256->256 @12x40", 12, 40, 256, 256)
    bench_case("upconv_1_1 3x3 96->32 @96x320", 96, 320, 96, 32)
    bench_case("waveconv 3x3 32->12 @96x320", 96, 320, 32, 12)


if __name__ == "__main__":
    main()
