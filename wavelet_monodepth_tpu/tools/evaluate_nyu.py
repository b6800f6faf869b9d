"""NYUv2 evaluation CLI — `NYUv2/evaluate.py:19-107` equivalent.

Loads nyu_depth_v2_labeled.mat + splits.mat (654 official test images),
optional NYUv2-OC++ edge GT pngs, runs the model (dense or sparse) and
prints abs_rel / rmse / log10 / deltas (+ eps_acc / eps_comp with edges).

Usage:
  python -m wavelet_monodepth_tpu.tools.evaluate_nyu \
      --data_path nyu_depth_v2_labeled.mat --splits_path splits.mat \
      --load_weights_folder ckpt/ [--edges_dir nyu_oc] [--use_sparse]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def adopt_normalize_input(load_weights_folder, cli_flag: bool) -> bool:
    """A checkpoint trained in this repo with normalize_input=True (the
    pre-round-4 default; real ImageNet normalization, a documented
    deviation — the reference's flag is a silent no-op) must be
    evaluated the way it was trained. opt.json sits next to the
    weights_<epoch> folders; adopt its setting unless the CLI already
    asked for normalization."""
    if cli_flag or not load_weights_folder:
        return cli_flag
    opt_json = os.path.join(
        os.path.dirname(os.path.abspath(load_weights_folder)), "opt.json")
    if os.path.exists(opt_json):
        import json
        with open(opt_json) as f:
            saved = json.load(f)
        if saved.get("normalize_input"):
            print("adopting normalize_input=True from the checkpoint's "
                  f"{opt_json}")
            return True
    return cli_flag


def main(argv=None):
    import jax

    from ..eval import nyu_eval
    from ..models.factory import make_nyu_decoder, make_nyu_encoder
    from ..utils.config import NyuOptions

    p = argparse.ArgumentParser(description="evaluate_nyu")
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--splits_path", type=str, required=True)
    p.add_argument("--edges_dir", type=str, default=None)
    p.add_argument("--load_weights_folder", type=str, default=None)
    p.add_argument("--torch_model_path", type=str, default=None,
                   help="reference model.pth (encoder.*/decoder.* "
                        "scopes, `NYUv2/load_save_utils.py`)")
    p.add_argument("--encoder_type", type=str, default="densenet")
    p.add_argument("--num_layers", type=int, default=161)
    p.add_argument("--use_wavelets", action="store_true")
    p.add_argument("--use_sparse", action="store_true")
    p.add_argument("--use_224", action="store_true")
    p.add_argument("--disparity", action="store_true")
    p.add_argument("--threshold", type=float, default=-1)
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument("--save_wavelets_dir", type=str, default=None)
    p.add_argument("--bfloat16", action="store_true",
                   help="run the model in bfloat16 (outputs f32)")
    p.add_argument("--normalize_input", action="store_true",
                   help="real ImageNet input normalization (deviation; "
                        "the reference's flag is a silent no-op — see "
                        "DEVIATIONS.md). Auto-adopted from the "
                        "checkpoint's opt.json when present")
    args = p.parse_args(argv)

    normalize_input = adopt_normalize_input(args.load_weights_folder,
                                            args.normalize_input)

    opts = NyuOptions(encoder_type=args.encoder_type,
                      num_layers=args.num_layers,
                      use_wavelets=args.use_wavelets,
                      use_sparse=args.use_sparse, use_224=args.use_224,
                      disparity=args.disparity,
                      normalize_input=normalize_input)

    import jax.numpy as jnp
    encoder, num_ch_enc = make_nyu_encoder(opts)
    decoder = make_nyu_decoder(num_ch_enc, opts)
    rng = jax.random.PRNGKey(0)
    h, w = (224, 224) if args.use_224 else (480, 640)
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    enc_vars = encoder.init(rng, x)
    feats = encoder.apply(enc_vars, x)
    dec_vars = decoder.init(rng, feats)

    if args.torch_model_path:
        from . import torch_import as ti
        sd = ti.load_pth(args.torch_model_path)
        if opts.encoder_type != "densenet":
            raise SystemExit("--torch_model_path import currently "
                             "supports the densenet161 family")
        enc_vars = ti.import_densenet_encoder(sd)
        if args.use_wavelets:
            dec_vars = ti.import_nyu_wave_decoder(sd)
        else:
            raise SystemExit("--torch_model_path import currently "
                             "supports the DecoderWave family "
                             "(--use_wavelets)")
    elif args.load_weights_folder:
        import flax.serialization
        from ..utils.checkpoint import load_raw_state
        raw = load_raw_state(args.load_weights_folder)
        enc_vars = {
            "params": flax.serialization.from_state_dict(
                enc_vars["params"], raw["params"]["encoder"]),
            "batch_stats": flax.serialization.from_state_dict(
                enc_vars["batch_stats"], raw["batch_stats"]["encoder"])}
        dec_vars = {"params": flax.serialization.from_state_dict(
            dec_vars["params"], raw["params"]["decoder"])}

    if args.bfloat16:
        from ..utils.precision import cast_floats
        enc_vars = cast_floats(enc_vars, jnp.bfloat16)
        dec_vars = cast_floats(dec_vars, jnp.bfloat16)

    import functools

    @functools.partial(jax.jit, static_argnames=("thresh",))
    def forward(image, thresh=None):
        feats = encoder.apply(enc_vars, image)
        if thresh is not None and args.use_wavelets and args.use_sparse:
            return decoder.apply(dec_vars, feats, thresh_ratio=thresh)
        return decoder.apply(dec_vars, feats)

    if args.bfloat16:
        from ..utils.precision import wrap_forward_bf16
        forward = wrap_forward_bf16(forward)

    rgb, depth = nyu_eval.load_nyu_labeled(args.data_path,
                                           args.splits_path)
    if args.max_images:
        rgb, depth = rgb[:args.max_images], depth[:args.max_images]

    edges = None
    if args.edges_dir:
        from PIL import Image
        edges = np.stack([
            np.array(Image.open(os.path.join(
                args.edges_dir, f"{i:04d}.png"))) > 0
            for i in range(1, rgb.shape[0] + 1)])

    thresh = args.threshold if args.use_sparse else None
    result = nyu_eval.evaluate(forward, rgb, depth, edges_gt=edges,
                               use_disparity=args.disparity,
                               use_224=args.use_224,
                               sparse_threshold=thresh,
                               save_wavelets_dir=args.save_wavelets_dir)
    keys = ["abs_rel", "rmse", "log10", "a1", "a2", "a3"]
    if "eps_acc" in result:
        keys += ["eps_acc", "eps_comp"]
    print(("{:>10} " * len(keys)).format(*keys))
    print(("{:10.4f} " * len(keys)).format(*[result[k] for k in keys]))


if __name__ == "__main__":
    main()
