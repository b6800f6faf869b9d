"""Self-golden gate: close the train->eval loop on the soaked checkpoint.

Takes the checkpoint produced by tools_dev/soak_kitti_experiment.py (the
production KITTI config trained 2000 steps on the real TPU over the
geometrically-exact synthetic mount) and runs three legs the golden
gates can't run without external data (VERDICT r4 item 2):

  A. FULL published eval protocol (tools/evaluate_depth.py: flip
     post-process fusion, eigen crop, x5.4 stereo scaling,
     `evaluate_depth.py:82-323`) dense — metrics must be finite and the
     model must have genuinely learned (abs_rel well below the ~0.45
     a constant-disparity predictor scores on this mount).
  B. The same protocol sparse at a threshold ladder; at the operating
     point nearest 10% density, abs_rel may differ from dense by at
     most 1.5% RELATIVE — previously this claim rested on the sweep's
     300-step weights only.
  C. Torch oracle: export the checkpoint with tools/export_torch.py,
     load the ACTUAL reference decoder (`KITTI/networks/decoders/
     depth_decoder.py:72-168`, pytorch_wavelets stubbed with the
     closed-form Haar synthesis it spells out at :225-239) from the
     exported depth.pth, forward it on encoder features computed by OUR
     soaked encoder on a REAL mount test frame, and compare disparity
     maps scale-by-scale.

Writes artifacts/self_golden_r5.json.

Run (after the soak): WMD_SOAK_DATA=/tmp/kitti_synth \
    WMD_SOAK_LOGDIR=/tmp/soak_logs \
    nohup python tools_dev/self_golden_experiment.py \
    > /tmp/self_golden.log 2>&1 &
"""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA = os.environ.get("WMD_SOAK_DATA", "/tmp/kitti_synth")
LOG_DIR = os.environ.get("WMD_SOAK_LOGDIR", "/tmp/soak_logs")
MODEL = os.environ.get("WMD_SOAK_MODEL", "soak_r5")
THRESHOLDS = (0.02, 0.05, 0.1)
TARGET_DENSITY = 0.10

EVAL_BASE = ["--data_path", DATA, "--eval_split", "eigen",
             "--eval_stereo", "--use_wavelets", "--post_process",
             "--height", "192", "--width", "640", "--num_layers", "18",
             "--batch_size", "8"]


def newest_checkpoint() -> str:
    folders = glob.glob(os.path.join(LOG_DIR, MODEL, "models",
                                     "weights_*"))
    assert folders, f"no checkpoints under {LOG_DIR}/{MODEL}"
    return max(folders, key=lambda p: int(p.rsplit("_", 1)[1]))


# --------------------------------------------------------------------------
# Leg C helpers: load the reference decoder with the Haar-IDWT stub
# (same closed-form synthesis tests/test_reference_parity.py proves is a
# true inverse via its analysis round-trip test).
# --------------------------------------------------------------------------

def load_reference_decoder(depth_pth: str):
    import importlib.util
    import types

    import torch
    import torch.nn.functional as F

    class _HaarIDWT(torch.nn.Module):
        def __init__(self, wave="haar", mode="zero"):
            super().__init__()
            assert wave == "haar"

        def forward(self, coeffs):
            yl, yh_list = coeffs
            (yh,) = yh_list
            lf, hf = yl / 2, yh / 2
            lh, hl, hh = hf[:, :, 0], hf[:, :, 1], hf[:, :, 2]
            r00 = lf + lh + hl + hh
            r01 = lf + lh - hl - hh
            r10 = lf - lh + hl - hh
            r11 = lf - lh - hl + hh
            st = torch.stack([r00, r01, r10, r11], dim=2)
            n, c, _, h, w = st.shape
            return F.pixel_shuffle(st.reshape(n, c * 4, h, w), 2)

    stub = types.ModuleType("pytorch_wavelets")
    stub.IDWT = _HaarIDWT
    stub.DWTInverse = _HaarIDWT
    sys.modules.setdefault("pytorch_wavelets", stub)

    ref_root = "/root/reference/KITTI"
    saved_layers = sys.modules.pop("layers", None)
    sys.path.insert(0, ref_root)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_kitti_depth_decoder",
            f"{ref_root}/networks/decoders/depth_decoder.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(ref_root)
        sys.modules.pop("layers", None)
        if saved_layers is not None:
            sys.modules["layers"] = saved_layers

    dec = mod.DepthWaveProgressiveDecoder(
        num_ch_enc=np.array((64, 64, 128, 256, 512)))
    sd = torch.load(depth_pth, map_location="cpu", weights_only=True)
    dec.load_state_dict(sd, strict=True)
    dec.eval()
    return dec


def torch_oracle(ckpt: str) -> dict:
    """Export the soaked checkpoint and cross-forward the reference
    decoder on our encoder's features from a real mount test frame."""
    import cv2
    import jax
    import jax.numpy as jnp
    import torch

    from wavelet_monodepth_tpu.tools import export_torch
    from wavelet_monodepth_tpu.tools.evaluate_depth import _load_forward
    from wavelet_monodepth_tpu.models.factory import (
        make_depth_decoder, make_depth_encoder)
    from wavelet_monodepth_tpu.utils.config import parse_kitti_args

    out_dir = os.path.join(ckpt, "torch_export")
    export_torch.main(["--load_weights_folder", ckpt, "--out", out_dir])

    opts = parse_kitti_args(EVAL_BASE + ["--load_weights_folder", ckpt])
    # rebuild enc/dec vars exactly like the eval CLI does
    import flax.serialization
    from wavelet_monodepth_tpu.utils.checkpoint import load_raw_state
    encoder, num_ch_enc = make_depth_encoder(opts)
    decoder = make_depth_decoder(num_ch_enc, opts)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 192, 640, 3), jnp.float32)
    enc_vars = encoder.init(rng, x0)
    feats0 = encoder.apply(enc_vars, x0)
    dec_vars = decoder.init(rng, feats0)
    raw = load_raw_state(ckpt)
    enc_vars = {
        "params": flax.serialization.from_state_dict(
            enc_vars["params"], raw["params"]["encoder"]),
        "batch_stats": flax.serialization.from_state_dict(
            enc_vars["batch_stats"], raw["batch_stats"]["encoder"])}
    dec_vars = {"params": flax.serialization.from_state_dict(
        dec_vars["params"], raw["params"]["depth"])}

    # one real test frame from the mount
    from wavelet_monodepth_tpu.data import kitti as kitti_data
    from wavelet_monodepth_tpu.data.splits import resolve_split_dir
    split_dir = resolve_split_dir("eigen", DATA)
    line = kitti_data.readlines(
        os.path.join(split_dir, "test_files.txt"))[0].split()
    img_path = os.path.join(
        DATA, line[0], "image_02", "data", f"{int(line[1]):010d}.jpg")
    img = cv2.cvtColor(cv2.imread(img_path), cv2.COLOR_BGR2RGB)
    img = cv2.resize(img, (640, 192), interpolation=cv2.INTER_AREA)
    x = jnp.asarray(img[None].astype(np.float32) / 255.0)

    # the cross-forward compares OUR decoder against torch-CPU f32;
    # on the TPU, f32 convs default to bf16-pass precision (~2.5e-3
    # max disp error on trained weights — round-5 finding), so pin
    # true-f32 for this numeric oracle only
    with jax.default_matmul_precision("highest"):
        feats = encoder.apply(enc_vars, x)
        ours = decoder.apply(dec_vars, feats)

    ref_dec = load_reference_decoder(os.path.join(out_dir, "depth.pth"))
    tfeats = [torch.from_numpy(
        np.transpose(np.asarray(f, np.float32), (0, 3, 1, 2)))
        for f in feats]
    with torch.no_grad():
        ref_out = ref_dec(tfeats)

    errs = {}
    for s in range(4):
        ref = np.transpose(ref_out[("disp", s)].numpy(), (0, 2, 3, 1))
        got = np.asarray(ours[("disp", s)], np.float32)
        assert got.shape == ref.shape, (s, got.shape, ref.shape)
        errs[f"disp{s}_maxerr"] = float(np.max(np.abs(got - ref)))
    errs["pred_disp0_mean"] = float(np.mean(
        np.asarray(ours[("disp", 0)])))
    return errs


def main():
    ckpt = newest_checkpoint()
    print(f"[self-golden] checkpoint: {ckpt}", flush=True)
    from wavelet_monodepth_tpu.tools.evaluate_depth import main as ev_main

    print("[self-golden] leg A: dense full-protocol eval", flush=True)
    dense = ev_main(EVAL_BASE + ["--load_weights_folder", ckpt])

    print("[self-golden] leg B: sparse threshold ladder", flush=True)
    sparse_rows = []
    for th in THRESHOLDS:
        r = ev_main(EVAL_BASE + ["--load_weights_folder", ckpt,
                                 "--use_sparse", "--threshold", str(th)])
        sparse_rows.append({"threshold": th,
                            "density": r["density_mean"],
                            "metrics": r["metrics"]})
        print(f"[self-golden] th={th}: density="
              f"{r['density_mean']:.4f} abs_rel="
              f"{r['metrics']['abs_rel']:.4f}", flush=True)
    op = min(sparse_rows,
             key=lambda r: abs((r["density"] or 1.0) - TARGET_DENSITY))
    d_abs = dense["metrics"]["abs_rel"]
    s_abs = op["metrics"]["abs_rel"]
    rel_delta = abs(s_abs - d_abs) / d_abs

    print("[self-golden] leg C: torch-oracle cross-forward", flush=True)
    oracle = torch_oracle(ckpt)

    checks = {
        "dense_metrics_finite": all(
            np.isfinite(v) for v in dense["metrics"].values()),
        # a constant-disparity predictor scores ~0.45 abs_rel on this
        # mount; require clear learning headroom below that
        "dense_learned": dense["metrics"]["abs_rel"] < 0.25,
        "sparse_near_10pct_exists": abs(
            (op["density"] or 1.0) - TARGET_DENSITY) < 0.08,
        "sparse_absrel_delta_le_1p5pct": rel_delta <= 0.015,
        "oracle_disp_close": all(
            oracle[f"disp{s}_maxerr"] <= 1e-3 for s in range(4)),
    }
    summary = {
        "checkpoint": ckpt,
        "dense": dense["metrics"],
        "sparse_rows": sparse_rows,
        "operating_point": {"threshold": op["threshold"],
                            "density": op["density"]},
        "sparse_vs_dense_absrel_rel_delta": rel_delta,
        "torch_oracle": oracle,
        "checks": checks,
        "ok": all(checks.values()),
    }
    out = os.path.join(REPO, "artifacts", "self_golden_r5.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1), flush=True)
    print(f"[self-golden] {'PASS' if summary['ok'] else 'FAIL'} -> {out}",
          flush=True)


if __name__ == "__main__":
    main()
