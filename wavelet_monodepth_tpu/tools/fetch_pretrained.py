"""Pretrained-checkpoint helper — the `KITTI/utils.py:51-114` equivalent
(monodepth2-style model downloader), adapted for offline environments.

This build environment has no network egress, so instead of downloading
this tool (a) documents where the published checkpoints live, (b)
verifies a local folder has the files the evaluators need, and (c)
sanity-loads them through the torch importer.

Usage:
  python -m wavelet_monodepth_tpu.tools.fetch_pretrained --check weights/
"""

from __future__ import annotations

import argparse
import os

# Published WaveletMonoDepth checkpoints (reference README.md:85-95,
# 134-141) and the torchvision ImageNet backbones the trainer
# initializes from.
KNOWN_MODELS = {
    "kitti_resnet18_640x192": "WaveletMonoDepth release: "
                              "ResNet18, Stereo+DepthHints, 640x192",
    "kitti_resnet50_640x192": "WaveletMonoDepth release: ResNet50 640x192",
    "kitti_resnet18_1024x320": "WaveletMonoDepth release: "
                               "ResNet18 1024x320",
    "kitti_resnet50_1024x320": "WaveletMonoDepth release: "
                               "ResNet50 1024x320",
    "nyu_densenet": "WaveletMonoDepth release: DenseNet161 NYUv2",
    "imagenet_resnet18": "torchvision resnet18 ImageNet weights",
    "imagenet_resnet50": "torchvision resnet50 ImageNet weights",
    "imagenet_densenet161": "torchvision densenet161 ImageNet weights",
    "imagenet_mobilenet_v2": "torchvision mobilenet_v2 ImageNet weights",
}

KITTI_FILES = ("encoder.pth", "depth.pth")
NYU_FILES = ("model.pth",)


def check_folder(path: str) -> dict:
    """Verify a weights folder and sanity-load it through the importer."""
    report = {"path": path, "kind": None, "ok": False, "details": []}
    if all(os.path.exists(os.path.join(path, f)) for f in KITTI_FILES):
        report["kind"] = "kitti"
        from . import torch_import as ti
        enc = ti.load_pth(os.path.join(path, "encoder.pth"))
        meta = ti.encoder_metadata(enc)
        report["details"].append(f"encoder meta: {meta}")
        num_layers = 18 if any("layer1.1.conv1" in k and
                               "layer1.2" not in k for k in enc) else 50
        try:
            ti.import_resnet_encoder(enc, num_layers)
            dec = ti.load_pth(os.path.join(path, "depth.pth"))
            ti.import_kitti_wavelet_decoder(dec)
            report["ok"] = True
            report["details"].append(
                f"imported as resnet{num_layers} + wavelet decoder")
        except KeyError as e:
            report["details"].append(f"import failed on key {e}")
    elif all(os.path.exists(os.path.join(path, f)) for f in NYU_FILES):
        report["kind"] = "nyu"
        from . import torch_import as ti
        sd = ti.load_pth(os.path.join(path, "model.pth"))
        try:
            ti.import_densenet_encoder(sd)
            ti.import_nyu_wave_decoder(sd)
            report["ok"] = True
            report["details"].append("imported DenseNet161 + DecoderWave")
        except KeyError as e:
            report["details"].append(f"import failed on key {e}")
    else:
        report["details"].append(
            f"no {KITTI_FILES} or {NYU_FILES} found")
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description="fetch_pretrained")
    p.add_argument("--check", type=str, default=None,
                   help="verify a local weights folder")
    p.add_argument("--list", action="store_true")
    args = p.parse_args(argv)
    if args.list or not args.check:
        print("Known model checkpoints (download on a connected machine "
              "from the WaveletMonoDepth / torchvision releases):")
        for k, v in KNOWN_MODELS.items():
            print(f"  {k:28s} {v}")
        return
    report = check_folder(args.check)
    print(report)
    raise SystemExit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
