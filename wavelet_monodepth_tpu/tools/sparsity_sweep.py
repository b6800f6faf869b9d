"""Sparsity sweep — the notebooks-as-a-script
(`KITTI/sparsity_test_notebook.ipynb`, `NYUv2/sparsity_test_notebook.ipynb`).

Runs the wavelet decoder densely and sparsely at a range of thresholds on
one image (or random features), reporting per-threshold: coefficient
density, counted GFLOPs (the paper's x-axis), wall-clock latency on this
chip (the TPU upgrade of that x-axis), and disparity deviation vs the
dense output. Emits a JSON curve for plotting score-vs-latency.

Usage:
  python -m wavelet_monodepth_tpu.tools.sparsity_sweep \
      [--image path.jpg] [--torch_model_path weights/] \
      [--thresholds -1 0.01 0.02 0.05 0.1 0.2]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ..models.decoders_kitti import KittiWaveletDecoder
    from ..models.resnet import ResnetEncoder, num_ch_enc
    from ..ops.sparse import compute_density

    p = argparse.ArgumentParser(description="sparsity sweep")
    p.add_argument("--image", type=str, default=None)
    p.add_argument("--torch_model_path", type=str, default=None)
    p.add_argument("--num_layers", type=int, default=18)
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--thresholds", nargs="+", type=float,
                   default=[-1, 0.01, 0.02, 0.05, 0.1, 0.2])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)

    encoder = ResnetEncoder(num_layers=args.num_layers)
    decoder = KittiWaveletDecoder(num_ch_enc=num_ch_enc(args.num_layers))
    rng = jax.random.PRNGKey(0)

    if args.image:
        from PIL import Image
        img = Image.open(args.image).convert("RGB").resize(
            (args.width, args.height), Image.LANCZOS)
        x = jnp.asarray(np.asarray(img, np.float32) / 255.0)[None]
    else:
        x = jax.random.uniform(rng, (1, args.height, args.width, 3))

    enc_vars = encoder.init(rng, x)
    feats = encoder.apply(enc_vars, x)
    dec_vars = decoder.init(rng, feats)
    if args.torch_model_path:
        import os
        from . import torch_import as ti
        enc_vars = ti.import_resnet_encoder(
            ti.load_pth(os.path.join(args.torch_model_path,
                                     "encoder.pth")), args.num_layers)
        dec_vars = ti.import_kitti_wavelet_decoder(
            ti.load_pth(os.path.join(args.torch_model_path, "depth.pth")))

    import functools

    @functools.partial(jax.jit, static_argnames=("thresh",))
    def forward(image, thresh):
        f = encoder.apply(enc_vars, image)
        if thresh is None:
            return decoder.apply(dec_vars, f)
        return decoder.apply(dec_vars, f, thresh_ratio=thresh)

    def bench(thresh):
        out = forward(x, thresh)
        jax.block_until_ready(out[("disp", 0)])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = forward(x, thresh)
        jax.block_until_ready(out[("disp", 0)])
        return out, (time.perf_counter() - t0) / args.iters

    dense_out, dense_t = bench(None)
    dense_disp = np.asarray(dense_out[("disp", 0)])

    rows = []
    for th in args.thresholds:
        out, t = bench(float(th))
        disp = np.asarray(out[("disp", 0)])
        rows.append({
            "threshold": th,
            "density": float(compute_density(out)),
            "gflops": float(np.mean(out[("total_ops", -1)])) / 1e9,
            "latency_ms": t * 1e3,
            "dense_latency_ms": dense_t * 1e3,
            "disp_mae_vs_dense": float(np.abs(disp - dense_disp).mean()),
        })
        print(f"thresh={th:6.3f} density={rows[-1]['density']:.4f} "
              f"GFLOPs={rows[-1]['gflops']:7.3f} "
              f"latency={rows[-1]['latency_ms']:7.3f}ms "
              f"mae={rows[-1]['disp_mae_vs_dense']:.5f}")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
