"""Single-image inference CLI — the `KITTI/test_simple.py:27-185`
equivalent.

Loads a checkpoint (our msgpack format via --model_path, or reference
.pth files via --torch_model_path), reads the feed size from the
checkpoint metadata, runs dense or sparse wavelet decoding, and writes
<name>_disp.npy (scaled disparity), per-scale 4-coefficient wavelet
.npys, and a magma-colormapped _disp.jpeg with 95th-percentile vmax.

Usage:
  python -m wavelet_monodepth_tpu.tools.infer --image_path img.jpg \
      --torch_model_path weights_folder [--use_sparse --threshold 0.1]
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Single-image depth inference")
    p.add_argument("--image_path", type=str, required=True)
    p.add_argument("--model_path", type=str, default=None,
                   help="folder with state.msgpack + meta.json")
    p.add_argument("--torch_model_path", type=str, default=None,
                   help="folder with reference encoder.pth/depth.pth")
    p.add_argument("--encoder_type", choices=["resnet"],
                   default="resnet",
                   help="resnet only (the reference test_simple.py "
                        "ships resnet checkpoints; no mobilenet "
                        "importer mapping exists)")
    p.add_argument("--num_layers", type=int, choices=[18, 50], default=18)
    p.add_argument("--ext", type=str, default="png")
    p.add_argument("--use_wavelets", action="store_true", default=True)
    p.add_argument("--use_sparse", action="store_true")
    p.add_argument("--threshold", type=float, default=0.1)
    p.add_argument("--bfloat16", action="store_true",
                   help="run the model in bfloat16 (outputs f32)")
    return p.parse_args(argv)


def load_variables(args):
    """Load (enc_vars, dec_vars, feed_h, feed_w) from either checkpoint
    format (ours or reference .pth). Shared by infer and export_serving."""
    import jax
    import jax.numpy as jnp
    from ..models.decoders_kitti import KittiWaveletDecoder
    from ..models.resnet import ResnetEncoder, num_ch_enc

    if not (args.model_path or args.torch_model_path):
        raise SystemExit("pass --model_path (folder with state.msgpack "
                         "+ meta.json) or --torch_model_path (folder "
                         "with the reference's encoder.pth/depth.pth)")
    encoder = ResnetEncoder(num_layers=args.num_layers)
    decoder = KittiWaveletDecoder(num_ch_enc=num_ch_enc(args.num_layers))

    if args.torch_model_path:
        from . import torch_import as ti
        enc_sd = ti.load_pth(os.path.join(args.torch_model_path,
                                          "encoder.pth"))
        dec_sd = ti.load_pth(os.path.join(args.torch_model_path,
                                          "depth.pth"))
        enc_vars = ti.import_resnet_encoder(enc_sd, args.num_layers)
        dec_vars = ti.import_kitti_wavelet_decoder(dec_sd)
        meta = ti.encoder_metadata(enc_sd)
        feed_h, feed_w = meta.get("height", 192), meta.get("width", 640)
    else:
        from ..utils import checkpoint as ckpt
        meta = ckpt.load_meta(args.model_path)
        feed_h = meta.get("height", 192)
        feed_w = meta.get("width", 640)
        rng = jax.random.PRNGKey(0)
        x = jnp.zeros((1, feed_h, feed_w, 3), jnp.float32)
        enc_vars = encoder.init(rng, x)
        feats = encoder.apply(enc_vars, x)
        dec_vars = decoder.init(rng, feats)
        import flax.serialization
        from ..utils.checkpoint import load_raw_state
        raw = load_raw_state(args.model_path)
        params = raw.get("params", raw)
        enc_vars = {"params": flax.serialization.from_state_dict(
                        enc_vars["params"], params["encoder"]),
                    "batch_stats": flax.serialization.from_state_dict(
                        enc_vars["batch_stats"],
                        raw["batch_stats"]["encoder"])}
        dec_vars = {"params": flax.serialization.from_state_dict(
                        dec_vars["params"], params["depth"])}

    return encoder, decoder, enc_vars, dec_vars, feed_h, feed_w


def load_model(args):
    import jax.numpy as jnp

    encoder, decoder, enc_vars, dec_vars, feed_h, feed_w = \
        load_variables(args)

    if getattr(args, "bfloat16", False):
        from ..utils.precision import cast_floats
        enc_vars = cast_floats(enc_vars, jnp.bfloat16)
        dec_vars = cast_floats(dec_vars, jnp.bfloat16)

    def forward(image, thresh):
        feats = encoder.apply(enc_vars, image)
        if thresh is None:
            return decoder.apply(dec_vars, feats)
        return decoder.apply(dec_vars, feats, thresh_ratio=thresh)

    if getattr(args, "bfloat16", False):
        from ..utils.precision import wrap_forward_bf16
        forward = wrap_forward_bf16(forward)
    return forward, (feed_h, feed_w)


def colormap_disp(disp: np.ndarray) -> np.ndarray:
    """Magma colormap with 95th-percentile vmax
    (`test_simple.py:166-175`), without matplotlib dependency at runtime."""
    import matplotlib.cm as cm
    import matplotlib as mpl
    vmax = np.percentile(disp, 95)
    norm = mpl.colors.Normalize(vmin=disp.min(), vmax=vmax)
    mapper = cm.ScalarMappable(norm=norm, cmap="magma")
    return (mapper.to_rgba(disp)[:, :, :3] * 255).astype(np.uint8)


def main(argv=None):
    import jax.numpy as jnp
    from PIL import Image
    from ..ops.geometry import disp_to_depth
    from ..ops.image import resize_bilinear

    args = parse_args(argv)
    forward, (feed_h, feed_w) = load_model(args)

    if os.path.isfile(args.image_path):
        paths = [args.image_path]
        outdir = os.path.dirname(args.image_path)
    elif os.path.isdir(args.image_path):
        paths = glob.glob(os.path.join(args.image_path, f"*.{args.ext}"))
        outdir = args.image_path
    else:
        raise FileNotFoundError(args.image_path)

    print(f"-> Predicting on {len(paths)} test images")
    for idx, path in enumerate(paths):
        # the reference's guard checks '_disp.jpg' while writing .jpeg
        # (`test_simple.py:126` — a second run would re-process its own
        # colormaps); skip BOTH spellings
        if path.endswith(("_disp.jpg", "_disp.jpeg")):
            continue
        img = Image.open(path).convert("RGB")
        ow, oh = img.size
        img = img.resize((feed_w, feed_h), Image.LANCZOS)
        x = jnp.asarray(np.asarray(img, np.float32) / 255.0)[None]

        thresh = args.threshold if args.use_sparse else None
        outputs = forward(x, thresh)
        disp = outputs[("disp", 0)]
        disp_resized = resize_bilinear(disp, oh, ow)

        name = os.path.splitext(os.path.basename(path))[0]
        scaled_disp, _ = disp_to_depth(disp, 0.1, 100)
        np.save(os.path.join(outdir, f"{name}_disp.npy"),
                np.asarray(scaled_disp).transpose(0, 3, 1, 2))

        if args.use_wavelets:
            for scale in range(4):
                h, w = feed_h // 2 ** (scale + 1), feed_w // 2 ** (scale + 1)
                coeffs = np.zeros((h, w, 4), np.float32)
                for j, c in enumerate(["LL", "LH", "HL", "HH"]):
                    coeffs[..., j] = np.asarray(
                        outputs[("wavelets", scale, c)])[0, :, :, 0]
                np.save(os.path.join(outdir,
                                     f"{name}_scale_{scale}_wavelets.npy"),
                        coeffs)

        im = Image.fromarray(
            colormap_disp(np.asarray(disp_resized)[0, :, :, 0]))
        im.save(os.path.join(outdir, f"{name}_disp.jpeg"))
        print(f"   Processed {idx + 1} of {len(paths)} images")
    print("-> Done!")


if __name__ == "__main__":
    main()
