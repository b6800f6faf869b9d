"""Tune the self-golden gate (tests/test_self_golden.py): how many
epochs of the stabilized production config (stereo + exact hints +
wavelets, hint_disp_l1_weight=1, disp_head_bias=-4) does the tiny synth
mount need before the FULL eval protocol (flip post-process, eigen crop,
x5.4) yields abs_rel below the gate threshold, and how big is the gap to
the 1-epoch near-random baseline?

Trains once with per-epoch checkpoints, then evaluates a ladder of
epochs. CPU-pinned (axon sitecustomize overrides env vars, CLAUDE.md
landmine #1).

Run: nohup python tools_dev/self_golden_tune_experiment.py \
        > /tmp/self_golden_tune.log 2>&1 &
"""

import io
import os
import re
import sys
import contextlib

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

H, W = 96, 320
ROOT = "/tmp/sg_tune/mount"
LOGS = "/tmp/sg_tune/logs"
EPOCHS = int(os.environ.get("SG_TUNE_EPOCHS", "20"))
N_TRAIN = int(os.environ.get("SG_TUNE_NTRAIN", "10"))
HINT_W = os.environ.get("SG_TUNE_HINT_W", "1.0")
ROOT = os.environ.get("SG_TUNE_MOUNT", ROOT)
LOGS = os.environ.get("SG_TUNE_LOGS", LOGS)


def main():
    from wavelet_monodepth_tpu.data.synth import fabricate
    from wavelet_monodepth_tpu.tools.train_kitti import main as train_main
    from wavelet_monodepth_tpu.tools.evaluate_depth import main as ev_main

    if not os.path.isdir(ROOT):
        # NEAR scene range: at 96x320 (1/4 eval resolution) the default
        # 70 m background subtends <1.5 px of stereo disparity — below
        # what photometric training can resolve there (measured: far-
        # mount abs_rel plateaus ~0.7-1.0 regardless of hint space)
        fabricate(ROOT, n_train=N_TRAIN, n_val=2, n_test=4, progress=False,
                  write_hints=True, hint_size=(H, W),
                  z_range=(2.0, 12.0), bg_depth=14.0)
    print("mount ready", flush=True)

    train_main(["--data_path", ROOT, "--log_dir", LOGS,
                "--model_name", "tune", "--split", "eigen",
                "--height", str(H), "--width", str(W),
                "--batch_size", "2", "--num_epochs", str(EPOCHS),
                "--use_stereo", "--frame_ids", "0",
                "--use_depth_hints", "--use_wavelets",
                "--hint_disp_l1_weight", HINT_W,
                "--disp_head_bias", "-4.0",
                "--log_frequency", "10", "--save_frequency", "1",
                "--num_layers", "18"])
    print("train done", flush=True)

    for ep in (0, 1, 3, 5, 7, 9, 11, 13, 15, 17, 19):
        ckpt = os.path.join(LOGS, "tune", "models", f"weights_{ep}")
        if not os.path.isdir(ckpt):
            continue
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            ev_main(["--data_path", ROOT, "--eval_split", "eigen",
                     "--eval_stereo", "--use_wavelets", "--post_process",
                     "--height", str(H), "--width", str(W),
                     "--batch_size", "2",
                     "--load_weights_folder", ckpt, "--num_layers", "18"])
        out = buf.getvalue()
        row = [ln for ln in out.splitlines()
               if "&" in ln and "abs_rel" not in ln][-1]
        vals = [float(v) for v in row.replace("\\\\", "").split("&")
                if v.strip()]
        print(f"epoch {ep:2d}: abs_rel={vals[0]:.4f} rmse={vals[2]:.3f} "
              f"a1={vals[4]:.3f}", flush=True)


if __name__ == "__main__":
    main()
