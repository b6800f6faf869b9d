"""Benchmark: KITTI ResNet18 640x192 inference throughput on one chip.

Prints ONE JSON line:
  {"metric": "kitti_r18_640x192_sparse10_fps", "value": <frames/sec>,
   "unit": "frames/sec", "vs_baseline": <sparse_fps / dense_fps>}

The primary number is batch-1 sparse-decode throughput at ~10% coefficient
density (the paper's headline operating point, reference README.md:97);
vs_baseline is the wall-clock speedup of the sparse path over our own
dense decode on the same chip (the north-star ratio; the reference only
reports FLOPs, BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def _bench(fn, args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


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

    # threshold 0.05 is the reference's default --threshold; with trained
    # weights it lands near 10% density (README.md:97)
    @jax.jit
    def sparse(ev, dv, img):
        out = decoder.apply(dv, encoder.apply(ev, img), thresh_ratio=0.05)
        return out[("disp", 0)], compute_density(out)

    t_dense = _bench(dense, (enc_vars, dec_vars, x))
    t_sparse = _bench(sparse, (enc_vars, dec_vars, x))
    _, density = sparse(enc_vars, dec_vars, x)

    fps_sparse = 1.0 / t_sparse
    fps_dense = 1.0 / t_dense
    result = {
        "metric": "kitti_r18_640x192_sparse_fps",
        "value": round(fps_sparse, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps_sparse / fps_dense, 3),
        "extra": {
            "dense_fps": round(fps_dense, 2),
            "density": round(float(density), 4),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
