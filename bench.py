"""Benchmark: KITTI ResNet18 640x192 batch-1 inference throughput on one
chip — dense wavelet decode vs sparse decode (masked-dense and Pallas
tile-skipping paths).

Prints ONE JSON line:
  {"metric": "kitti_r18_640x192_sparse_fps", "value": <frames/sec>,
   "unit": "frames/sec", "vs_baseline": <sparse_fps / dense_fps>}

Throughput is measured by pipelined dispatch (submit N frames without
blocking, block once) — the batch-1 latency serving pattern. The primary
number is the best sparse path at the default 0.05 threshold (the
reference's --threshold default; ~10% density with trained weights,
README.md:97); vs_baseline is its wall-clock speedup over our own dense
decode on the same chip (the reference reports FLOPs only, BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def _throughput(fn, args, iters=100, warmup=8):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return iters / (time.perf_counter() - t0)


def main():
    from wavelet_monodepth_tpu.models.decoders_kitti import \
        KittiWaveletDecoder
    from wavelet_monodepth_tpu.models.resnet import ResnetEncoder, num_ch_enc
    from wavelet_monodepth_tpu.ops.sparse import compute_density

    H, W = 192, 640
    rng = jax.random.PRNGKey(0)
    encoder = ResnetEncoder(num_layers=18)
    decoder = KittiWaveletDecoder(num_ch_enc=num_ch_enc(18))
    x = jax.random.uniform(rng, (1, H, W, 3), jnp.float32)
    enc_vars = encoder.init(rng, x)
    feats = encoder.apply(enc_vars, x)
    dec_vars = decoder.init(rng, feats)

    @jax.jit
    def dense(ev, dv, img):
        return decoder.apply(dv, encoder.apply(ev, img))[("disp", 0)]

    # threshold 0.2 lands at ~11% coefficient density with random-init
    # weights — the paper's ~10% operating point (with trained weights the
    # reference's default 0.05 threshold lands there instead, README.md:97)
    TH = 0.2

    @jax.jit
    def sparse_masked(ev, dv, img):
        out = decoder.apply(dv, encoder.apply(ev, img), thresh_ratio=TH)
        return out[("disp", 0)], compute_density(out)

    @jax.jit
    def sparse_pallas(ev, dv, img):
        out = decoder.apply(dv, encoder.apply(ev, img), thresh_ratio=TH,
                            use_pallas=True)
        return out[("disp", 0)], compute_density(out)

    fps_dense = _throughput(dense, (enc_vars, dec_vars, x))
    fps_masked = _throughput(sparse_masked, (enc_vars, dec_vars, x))
    try:
        fps_pallas = _throughput(sparse_pallas, (enc_vars, dec_vars, x))
    except Exception as e:  # pallas path must not take down the bench
        print(f"pallas path failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        fps_pallas = 0.0
    _, density = sparse_masked(enc_vars, dec_vars, x)

    # context numbers: bf16 full model (MXU-native) and batch-16 dense
    # throughput (dispatch-amortized device capacity)
    evb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16),
                                 enc_vars)
    dvb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16),
                                 dec_vars)
    fps_bf16 = _throughput(dense, (evb, dvb, x.astype(jnp.bfloat16)))
    x16 = jnp.tile(x, (16, 1, 1, 1))
    fps_b16 = 16 * _throughput(dense, (enc_vars, dec_vars, x16),
                               iters=25, warmup=3)
    try:
        fps_b16_pallas = 16 * _throughput(
            sparse_pallas, (enc_vars, dec_vars, x16), iters=25, warmup=3)
    except Exception as e:
        print(f"batched pallas failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        fps_b16_pallas = 0.0

    best = max(fps_masked, fps_pallas)
    result = {
        "metric": "kitti_r18_640x192_sparse_fps",
        "value": round(best, 2),
        "unit": "frames/sec",
        "vs_baseline": round(best / fps_dense, 3),
        "extra": {
            "dense_fps": round(fps_dense, 2),
            "sparse_masked_fps": round(fps_masked, 2),
            "sparse_pallas_fps": round(fps_pallas, 2),
            "density": round(float(density), 4),
            "dense_bf16_fps": round(fps_bf16, 2),
            "dense_batch16_fps": round(fps_b16, 2),
            "sparse_pallas_batch16_fps": round(fps_b16_pallas, 2),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
