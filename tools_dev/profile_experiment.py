"""Round-2 TPU timing reconciliation experiment (PERF.md 'traced' agenda).

Measures the dense KITTI R18 640x192 forward, batch 16, three ways:
  1. fori-slope   — bench.py's current method (fori_loop-serialized evals)
  2. unroll-slope — K UNROLLED carry-chained evals in one jit (no loop
                    machinery; slope removes fetch/dispatch constants)
  3. jax.profiler — device trace, if the axon backend supports it

Also times a single 96x320x64->64 conv3x3 by unroll-slope to anchor
per-conv cost against PERF.md's kernel dissection.

Writes findings to stdout (run under nohup, poll the log).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH = 16


def slope(fn, ks, reps=3):
    """fn(k) -> fetches a scalar after k chained evals. Returns s/eval."""
    for k in ks:
        fn(k)          # compile
    out = {}
    for k in ks:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(k)
            ts.append(time.perf_counter() - t0)
        out[k] = min(ts)
    k0, k1 = min(ks), max(ks)
    return (out[k1] - out[k0]) / (k1 - k0), out


def main():
    from wavelet_monodepth_tpu.models.decoders_kitti import \
        KittiWaveletDecoder
    from wavelet_monodepth_tpu.models.resnet import ResnetEncoder, num_ch_enc

    print("devices:", jax.devices(), flush=True)
    H, W = 192, 640
    rng = jax.random.PRNGKey(0)
    encoder = ResnetEncoder(num_layers=18)
    decoder = KittiWaveletDecoder(num_ch_enc=num_ch_enc(18))
    x1 = jax.random.uniform(rng, (1, H, W, 3), jnp.float32)
    enc_vars = encoder.init(rng, x1)
    dec_vars = decoder.init(rng, encoder.apply(enc_vars, x1))
    x = jax.random.uniform(rng, (BATCH, H, W, 3), jnp.float32)

    def fwd(ev, dv, img):
        return decoder.apply(dv, encoder.apply(ev, img))[("disp", 0)]

    # ---- 1. fori-slope (bench.py method) --------------------------------
    @functools.partial(jax.jit, static_argnames=("k",))
    def chained_fori(ev, dv, img, k):
        def body(i, carry):
            d = fwd(ev, dv, img + carry * 1e-9)
            return carry + d.sum()
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    s_fori, raw_fori = slope(
        lambda k: float(chained_fori(enc_vars, dec_vars, x, k)), (1, 11))
    print(json.dumps({"method": "fori_slope", "s_per_eval": s_fori,
                      "per_frame_us": s_fori / BATCH * 1e6,
                      "raw": raw_fori}), flush=True)

    # ---- 2. unroll-slope -------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("k",))
    def chained_unroll(ev, dv, img, k):
        carry = jnp.float32(0.0)
        for _ in range(k):
            d = fwd(ev, dv, img + carry * 1e-9)
            carry = carry + d.sum()
        return carry

    s_unr, raw_unr = slope(
        lambda k: float(chained_unroll(enc_vars, dec_vars, x, k)), (1, 5))
    print(json.dumps({"method": "unroll_slope", "s_per_eval": s_unr,
                      "per_frame_us": s_unr / BATCH * 1e6,
                      "raw": raw_unr}), flush=True)

    # ---- 3. jax.profiler trace ------------------------------------------
    try:
        jitted = jax.jit(fwd)
        float(jitted(enc_vars, dec_vars, x).sum())   # compile
        with jax.profiler.trace("/tmp/wmd_trace"):
            for _ in range(8):
                r = jitted(enc_vars, dec_vars, x)
            r.block_until_ready()
        import glob
        import os
        files = sorted(glob.glob("/tmp/wmd_trace/**/*", recursive=True))
        print(json.dumps({"method": "profiler",
                          "files": [f for f in files
                                    if os.path.isfile(f)][:20]}),
              flush=True)
    except Exception as e:
        print(json.dumps({"method": "profiler",
                          "error": f"{type(e).__name__}: {e}"}), flush=True)

    # ---- 4. single conv anchor ------------------------------------------
    from wavelet_monodepth_tpu.ops import convops
    kx = jax.random.normal(rng, (BATCH, 96, 320, 64), jnp.float32)
    kw = jax.random.normal(rng, (3, 3, 64, 64), jnp.float32) * 0.05
    kb = jnp.zeros((64,), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("k",))
    def conv_chain(x0, w, b, k):
        y = x0
        for _ in range(k):
            y = convops.conv3x3(y, w, b, "reflect")
        return y.sum()

    s_conv, raw_conv = slope(
        lambda k: float(conv_chain(kx, kw, kb, k)), (1, 17))
    print(json.dumps({"method": "conv_unroll_slope",
                      "s_per_conv_batch16": s_conv,
                      "per_image_us": s_conv / BATCH * 1e6,
                      "raw": raw_conv}), flush=True)

    # ---- 5. XLA cost analysis flops for context --------------------------
    try:
        comp = jax.jit(fwd).lower(enc_vars, dec_vars, x).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        print(json.dumps({"method": "cost_analysis",
                          "flops": ca.get("flops"),
                          "bytes": ca.get("bytes accessed")}), flush=True)
    except Exception as e:
        print(json.dumps({"method": "cost_analysis",
                          "error": f"{type(e).__name__}: {e}"}), flush=True)


if __name__ == "__main__":
    main()
