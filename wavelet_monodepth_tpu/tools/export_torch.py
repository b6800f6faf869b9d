"""Export a checkpoint trained HERE to the reference's .pth layout.

The inverse of the torch importer: models trained in this framework can
be dropped into the reference unchanged — per-model state dicts with its
exact names (`KITTI/trainer.py:733-773`: encoder.pth with embedded
height/width/use_stereo ints, depth.pth, pose_encoder.pth/pose.pth; NYU
single model.pth with encoder./decoder. scopes,
`NYUv2/load_save_utils.py:11-20`). Also the cross-validation path for
the golden gates: evaluate the same weights in both frameworks.

Usage:
  python -m wavelet_monodepth_tpu.tools.export_torch \
      --load_weights_folder log/mono_model/models/weights_19 \
      [--out DIR] [--model auto|kitti|nyu]
"""

from __future__ import annotations

import argparse
import os


def _save_pth(path: str, sd: dict):
    import torch
    torch.save({k: (v if isinstance(v, int) else torch.as_tensor(v))
                for k, v in sd.items()}, path)
    print(f"wrote {path} ({len(sd)} entries)")


def main(argv=None):
    from . import torch_import as ti
    from ..utils.checkpoint import load_meta, load_raw_state

    p = argparse.ArgumentParser(
        description="export a checkpoint to the reference's .pth layout")
    p.add_argument("--load_weights_folder", type=str, required=True)
    p.add_argument("--out", type=str, default=None,
                   help="output dir (default: <folder>/torch_export)")
    p.add_argument("--model", choices=["auto", "kitti", "nyu"],
                   default="auto")
    args = p.parse_args(argv)

    folder = args.load_weights_folder
    out = args.out or os.path.join(folder, "torch_export")
    os.makedirs(out, exist_ok=True)

    raw = load_raw_state(folder)
    meta = load_meta(folder)
    params = raw.get("params", raw)
    stats = raw.get("batch_stats", {})

    kind = args.model
    if kind == "auto":
        if "depth" in params:
            kind = "kitti"
        elif "decoder" in params:
            kind = "nyu"
        else:
            raise SystemExit(f"cannot infer model family from param "
                             f"groups {sorted(params)}; pass --model")

    if kind == "kitti":
        enc_meta = {k: meta[k] for k in ("height", "width", "use_stereo")
                    if k in meta}
        missing = [k for k in ("height", "width", "use_stereo")
                   if k not in enc_meta]
        if missing:
            # the reference's test_simple.py:85-86 reads
            # loaded_dict['height'/'width'] at inference — exporting
            # without them produces an encoder.pth it cannot load
            print(f"WARNING: meta.json lacks {missing}; the reference's "
                  "test_simple.py needs height/width embedded in "
                  "encoder.pth — re-export from a checkpoint folder "
                  "with meta.json, or add the keys by hand")
        _save_pth(os.path.join(out, "encoder.pth"),
                  ti.export_resnet_encoder(
                      {"params": params["encoder"],
                       "batch_stats": stats.get("encoder", {})},
                      meta=enc_meta))
        depth = {"params": params["depth"]}
        if "waveconv_4_ll" in params["depth"]:
            _save_pth(os.path.join(out, "depth.pth"),
                      ti.export_kitti_wavelet_decoder(depth))
        else:
            scales = sorted(int(k.split("_")[1])
                            for k in params["depth"]
                            if k.startswith("dispconv_"))
            _save_pth(os.path.join(out, "depth.pth"),
                      ti.export_kitti_baseline_decoder(
                          depth, tuple(scales)))
        if "pose_encoder" in params:
            _save_pth(os.path.join(out, "pose_encoder.pth"),
                      ti.export_resnet_encoder(
                          {"params": params["pose_encoder"],
                           "batch_stats": stats.get("pose_encoder", {})},
                          prefix=""))
        if "pose" in params:
            exporter = (ti.export_pose_cnn
                        if "conv_0" in params["pose"]
                        else ti.export_pose_decoder)
            _save_pth(os.path.join(out, "pose.pth"),
                      exporter({"params": params["pose"]}))
    else:
        enc = params["encoder"]
        if "conv0" not in enc:
            raise SystemExit(
                "NYU export currently supports the DenseNet161 encoder "
                "(the published config); this checkpoint's encoder "
                f"params look like {sorted(enc)[:3]}...")
        sd = ti.export_densenet_encoder(
            {"params": enc, "batch_stats": stats.get("encoder", {})})
        sd.update(ti.export_nyu_wave_decoder(
            {"params": params["decoder"]}))
        _save_pth(os.path.join(out, "model.pth"), sd)
    return out


if __name__ == "__main__":
    main()
