"""Continuation soak: extend the round-5 KITTI soak checkpoint and
nail down the anon-RSS question with data.

The 1920-step soak (tools_dev/soak_kitti_experiment.py) passed every
check except `anon_rss_stable` (anon peaked at 38.6 GB then fell back
to 21 GB — a sawtooth, not obviously a leak) and left a checkpoint
whose disparity is still nearly flat (self_golden leg A: abs_rel 0.56,
wavelet density 2.9%). This stage:

  * relaunches the PRODUCTION train CLI with --auto_resume and a higher
    --num_epochs (default 18 -> +12 epochs / +3840 steps from epoch 6),
  * runs it under MALLOC_ARENA_MAX=2 — if the phase-B anon ramp was
    glibc per-thread arena growth/fragmentation (4 loader workers + TB
    + relay client threads on this box), capping arenas flattens it;
    if anon still staircases, it is a real reference-holding leak,
  * samples (t, rss_mb, anon_mb) every 10 s and PERSISTS the full
    timeline in the artifact (the first soak only kept aggregates,
    which is why its peak/last numbers could not be interpreted),
  * re-checks: losses finite, per-epoch means still falling from the
    phase-B tail, final checkpoint exists, anon second-half max within
    1.25x of first-half max.

Writes artifacts/soak_kitti_r5_cont.json.

Reference system under test: `KITTI/trainer.py:182-229` (run_epoch x
num_epochs), continued past the first soak's 6 epochs.

Run (after the first soak): WMD_SOAK_DATA=/root/data_synth \
    WMD_SOAK_LOGDIR=/root/soak_logs \
    nohup python tools_dev/soak_continue_experiment.py \
    > /tmp/soak_cont.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.environ.get("WMD_SOAK_DATA", "/root/data_synth")
LOG_DIR = os.environ.get("WMD_SOAK_LOGDIR", "/root/soak_logs")
MODEL = "soak_r5"
NUM_EPOCHS = int(os.environ.get("WMD_CONT_EPOCHS", "18"))
STEPS_PER_CALL = int(os.environ.get("WMD_SOAK_SPC", "4"))
ARENA_MAX = os.environ.get("WMD_CONT_ARENA_MAX", "2")

ARGS = ["--data_path", DATA, "--split", "eigen",
        "--use_stereo", "--frame_ids", "0",
        "--use_depth_hints", "--use_wavelets",
        "--height", "192", "--width", "640",
        "--num_layers", "18", "--batch_size", "12", "--bfloat16",
        "--num_epochs", str(NUM_EPOCHS),
        # lighter telemetry than the first soak (4 log events/epoch —
        # each event fetches train+val visual batches over the relay,
        # which dominated the first soak's 1594 ms/step wall vs the
        # 736 ms/step windowed rate)
        "--log_frequency", "80", "--log_always",
        "--steps_per_call", str(STEPS_PER_CALL),
        "--num_workers", "4",
        "--hint_disp_l1_weight", "1.0", "--disp_head_bias", "-4.0",
        "--auto_resume",
        "--model_name", MODEL, "--log_dir", LOG_DIR]

LINE_RE = re.compile(
    r"epoch\s+(\d+) \| batch\s+(\d+) \| forward: +([0-9.]+)s "
    r"\(examples/s: +([0-9.]+)\) \| dataloading: ([0-9.]+)s "
    r"\| loss: ([0-9.naninf-]+)")


def monitor_rss(pid: int, out: list, stop: threading.Event):
    while not stop.is_set():
        try:
            rss = anon = None
            with open(f"/proc/{pid}/smaps_rollup") as f:
                for ln in f:
                    if ln.startswith("Rss:"):
                        rss = int(ln.split()[1]) // 1024
                    elif ln.startswith("Anonymous:"):
                        anon = int(ln.split()[1]) // 1024
            if rss is not None:
                out.append((round(time.time(), 1), rss, anon))
        except OSError:
            return
        stop.wait(10.0)


def main():
    train_log = os.path.join(LOG_DIR, "train_console_cont.log")
    if os.path.exists(train_log):
        os.remove(train_log)
    env = dict(os.environ, MALLOC_ARENA_MAX=ARENA_MAX)
    t0 = time.time()
    print(f"[cont] resuming {MODEL} to {NUM_EPOCHS} epochs "
          f"(MALLOC_ARENA_MAX={ARENA_MAX})", flush=True)
    logf = open(train_log, "ab", buffering=0)
    proc = subprocess.Popen(
        [sys.executable, "-m", "wavelet_monodepth_tpu.tools.train_kitti"]
        + ARGS, cwd=REPO, stdout=logf, stderr=subprocess.STDOUT, env=env)
    rss, stop = [], threading.Event()
    threading.Thread(target=monitor_rss, args=(proc.pid, rss, stop),
                     daemon=True).start()
    rc = proc.wait()
    stop.set()
    wall = time.time() - t0
    print(f"[cont] exited rc={rc} after {wall:.0f}s", flush=True)

    with open(train_log, errors="replace") as f:
        log = f.read()
    resume_m = re.search(r"auto-resume: restoring (\S+), continuing "
                         r"at epoch (\d+)", log)
    steps = [dict(epoch=int(m.group(1)), loss=float(m.group(6)),
                  examples_s=float(m.group(4)))
             for m in LINE_RE.finditer(log)]
    losses = [s["loss"] for s in steps]
    by_epoch = {}
    for s in steps:
        by_epoch.setdefault(s["epoch"], []).append(s["loss"])
    epoch_mean = {e: sum(v) / len(v) for e, v in sorted(by_epoch.items())}
    ems = list(epoch_mean.values())
    anon = [a for _, _, a in rss if a is not None]
    half = len(anon) // 2

    checks = {
        "completed": rc == 0,
        "resumed": resume_m is not None,
        "all_losses_finite":
            len(losses) > 0 and
            all(l == l and abs(l) < 1e9 for l in losses),
        "loss_still_falling":
            len(ems) >= 4 and sum(ems[-2:]) < sum(ems[:2]),
        "final_checkpoint_exists": os.path.exists(os.path.join(
            LOG_DIR, MODEL, "models", f"weights_{NUM_EPOCHS - 1}",
            "state.msgpack")),
        "anon_rss_stable": (
            len(anon) > 3 and
            max(anon[half:]) < 1.25 * max(anon[:half])),
    }
    summary = {
        "config": (f"continuation to {NUM_EPOCHS} epochs, "
                   f"MALLOC_ARENA_MAX={ARENA_MAX}, "
                   f"steps_per_call={STEPS_PER_CALL}, log_frequency=80"),
        "wall_s": wall,
        "resumed_at_epoch": (int(resume_m.group(2))
                             if resume_m else None),
        "epoch_mean_loss": epoch_mean,
        "examples_s_late": (
            sum(s["examples_s"] for s in steps[-8:]) / 8
            if len(steps) >= 8 else None),
        "anon_mb_max": max(anon, default=None),
        "anon_mb_last": anon[-1] if anon else None,
        "rss_timeline": rss,
        "checks": checks,
        "ok": all(checks.values()),
    }
    out = os.path.join(REPO, "artifacts", "soak_kitti_r5_cont.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "rss_timeline"}, indent=1), flush=True)
    print(f"[cont] {'PASS' if summary['ok'] else 'FAIL'} -> {out}",
          flush=True)


if __name__ == "__main__":
    main()
