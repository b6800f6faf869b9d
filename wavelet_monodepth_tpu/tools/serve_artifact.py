"""Run a StableHLO serving artifact over images — the serving half of
`export_serving`: no model-building Python, just deserialize + call.

The reference's deployment story stops at ONNX-minded tweaks
(`mobilenetv2_encoder.py:18-30`); here the loop is closed TPU-natively:
`export_serving --bundle_params` writes the program + params, and this
runner loads both, decodes images to the artifact's feed size (C++
threaded decoder when built, PIL otherwise), batches them, and writes
`<stem>_disp.npy` per image (the `test_simple.py` output contract).
Images ship uint8 when the artifact was exported with --uint8_input.

Usage:
  python -m wavelet_monodepth_tpu.tools.serve_artifact \
      --artifact /tmp/r18_640x192 --images 'imgs/*.jpg' --out preds/
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="run a serving artifact")
    p.add_argument("--artifact", type=str, required=True,
                   help="path prefix from export_serving (reads "
                        ".stablehlo/.json/.params.msgpack)")
    p.add_argument("--images", type=str, required=True,
                   help="image path, glob, or directory")
    p.add_argument("--out", type=str, default=None,
                   help="output dir (default: next to each image)")
    p.add_argument("--num_workers", type=int, default=4)
    return p.parse_args(argv)


def _resolve_images(spec: str):
    if os.path.isdir(spec):
        paths = sorted(
            p for p in glob.glob(os.path.join(spec, "*"))
            if p.lower().endswith((".jpg", ".jpeg", ".png")))
    else:
        paths = sorted(glob.glob(spec)) if any(
            c in spec for c in "*?[") else [spec]
    if not paths:
        raise FileNotFoundError(f"no images match {spec!r}")
    return paths


def _decode(paths, height, width, num_workers):
    """uint8 NHWC batch via the native threaded decoder, PIL fallback."""
    from ..data import native_loader as nl
    if nl.available():
        return nl.decode_resize_batch_u8(paths, height, width,
                                         num_threads=num_workers)
    import numpy as np
    from PIL import Image
    out = np.empty((len(paths), height, width, 3), np.uint8)
    for i, p in enumerate(paths):
        img = Image.open(p).convert("RGB").resize(
            (width, height), Image.LANCZOS)
        out[i] = np.asarray(img, np.uint8)
    return out


def main(argv=None):
    args = parse_args(argv)
    import flax.serialization
    import jax
    import jax.numpy as jnp
    import numpy as np

    with open(args.artifact + ".json") as f:
        meta = json.load(f)
    with open(args.artifact + ".stablehlo", "rb") as f:
        program = jax.export.deserialize(f.read())
    bundle = args.artifact + ".params.msgpack"
    if not os.path.exists(bundle):
        raise FileNotFoundError(
            f"{bundle} not found — export with --bundle_params")
    with open(bundle, "rb") as f:
        tree = flax.serialization.msgpack_restore(f.read())
    enc_vars, dec_vars = tree["enc"], tree["dec"]

    b, h, w = meta["batch"], meta["height"], meta["width"]
    u8_in = meta.get("input_dtype") == "uint8"
    paths = _resolve_images(args.images)
    if args.out:
        os.makedirs(args.out, exist_ok=True)

    n_done = 0
    t0 = time.time()
    for start in range(0, len(paths), b):
        chunk = paths[start:start + b]
        batch = _decode(chunk, h, w, args.num_workers)
        if len(chunk) < b:          # static shapes: pad the tail batch
            pad = np.repeat(batch[-1:], b - len(chunk), axis=0)
            batch = np.concatenate([batch, pad], axis=0)
        x = (jnp.asarray(batch) if u8_in
             else jnp.asarray(batch, jnp.float32) / 255.0)
        out = program.call(enc_vars, dec_vars, x)
        disp = np.asarray(out[0] if isinstance(out, (tuple, list))
                          else out)
        for i, p in enumerate(chunk):
            stem = os.path.splitext(os.path.basename(p))[0]
            dest = (args.out if args.out else os.path.dirname(p)) or "."
            np.save(os.path.join(dest, f"{stem}_disp.npy"),
                    disp[i, :, :, 0])
            n_done += 1
    dt = time.time() - t0
    print(f"served {n_done} images in {dt:.2f}s "
          f"({1e3 * dt / max(1, n_done):.1f} ms/img incl. host decode; "
          f"model {meta['model']}, {meta['dtype']}, "
          f"input {meta.get('input_dtype', 'float32')})")


if __name__ == "__main__":
    main()
