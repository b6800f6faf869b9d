"""Benchmark: KITTI ResNet18 640x192 inference on one chip — dense
wavelet decode vs sparse decode (masked-dense and Pallas tile-skipping
paths).

Prints ONE JSON line:
  {"metric": "kitti_r18_640x192_sparse_fps", "value": <frames/sec>,
   "unit": "frames/sec", "vs_baseline": <sparse_fps / dense_fps>}

Measurement: on this machine's remote-attached TPU, `block_until_ready`
does not actually await execution and single fetches pay a large relay
sync, so naive dispatch timing is meaningless (see PERF.md). Device time
is measured by the slope method: one jit containing K serialized model
evaluations (fori_loop, carry-dependent), fetched once; per-eval time =
(t(K1) - t(K0)) / (K1 - K0). Sparse density is pinned near the paper's
~10% operating point (threshold 0.2 with random-init weights;
README.md:97).
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

BATCH = 16
TH = 0.2
K0, K1 = 1, 11


def main():
    from wavelet_monodepth_tpu.models.decoders_kitti import \
        KittiWaveletDecoder
    from wavelet_monodepth_tpu.models.resnet import ResnetEncoder, num_ch_enc
    from wavelet_monodepth_tpu.ops.sparse import compute_density

    H, W = 192, 640
    rng = jax.random.PRNGKey(0)
    encoder = ResnetEncoder(num_layers=18)
    decoder = KittiWaveletDecoder(num_ch_enc=num_ch_enc(18))
    x1 = jax.random.uniform(rng, (1, H, W, 3), jnp.float32)
    enc_vars = encoder.init(rng, x1)
    dec_vars = decoder.init(rng, encoder.apply(enc_vars, x1))
    x = jax.random.uniform(rng, (BATCH, H, W, 3), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("k", "th", "pallas"))
    def chained(ev, dv, img, k, th=None, pallas=False):
        def body(i, carry):
            img_i = img + carry * 1e-9      # serialize iterations
            if th is None:
                d = decoder.apply(dv, encoder.apply(ev, img_i))[("disp",
                                                                 0)]
            else:
                d = decoder.apply(dv, encoder.apply(ev, img_i),
                                  thresh_ratio=th,
                                  use_pallas=pallas)[("disp", 0)]
            return carry + d.sum()
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    def device_seconds_per_frame(th=None, pallas=False, reps=2):
        float(chained(enc_vars, dec_vars, x, K0, th, pallas))  # compile
        float(chained(enc_vars, dec_vars, x, K1, th, pallas))

        def t(k):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(chained(enc_vars, dec_vars, x, k, th, pallas))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        return (t(K1) - t(K0)) / (K1 - K0) / BATCH

    t_dense = device_seconds_per_frame()
    t_masked = device_seconds_per_frame(th=TH)
    try:
        t_pallas = device_seconds_per_frame(th=TH, pallas=True)
    except Exception as e:
        print(f"pallas path failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        t_pallas = float("inf")

    # bf16 inference option (slope-measured): modest but real win
    evb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16),
                                 enc_vars)
    dvb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16),
                                 dec_vars)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chained16(ev, dv, img, k):
        def body(i, carry):
            img_i = img + (carry * 1e-9).astype(img.dtype)
            d = decoder.apply(dv, encoder.apply(ev, img_i))[("disp", 0)]
            return carry + d.sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    def bf16_seconds_per_frame(reps=2):
        xb = x.astype(jnp.bfloat16)
        float(chained16(evb, dvb, xb, K0))
        float(chained16(evb, dvb, xb, K1))

        def t(k):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(chained16(evb, dvb, xb, k))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        return (t(K1) - t(K0)) / (K1 - K0) / BATCH

    try:
        t_bf16 = bf16_seconds_per_frame()
    except Exception:
        t_bf16 = float("inf")

    @jax.jit
    def density_of(ev, dv, img):
        out = decoder.apply(dv, encoder.apply(ev, img), thresh_ratio=TH)
        return compute_density(out)

    density = float(density_of(enc_vars, dec_vars, x))

    fps = {"dense": 1.0 / t_dense, "masked": 1.0 / t_masked,
           "pallas": (0.0 if t_pallas == float("inf") else 1.0 / t_pallas)}
    best_name = max(("masked", "pallas"), key=lambda k: fps[k])
    result = {
        "metric": "kitti_r18_640x192_sparse_fps",
        "value": round(fps[best_name], 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps[best_name] / fps["dense"], 3),
        "extra": {
            "dense_fps": round(fps["dense"], 2),
            "sparse_masked_fps": round(fps["masked"], 2),
            "sparse_pallas_fps": round(fps["pallas"], 2),
            "best_sparse_path": best_name,
            "dense_bf16_fps": round(0.0 if t_bf16 == float("inf")
                                    else 1.0 / t_bf16, 2),
            "density": round(density, 4),
            "batch": BATCH,
            "measurement": "slope (serialized on-device loop)",
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
