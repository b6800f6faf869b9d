"""Full-system KITTI training soak on the real TPU.

Runs the PRODUCTION train CLI (tools/train_kitti.py — stereo + depth
hints, R18 640x192, bf16-mp, b12, uint8 device-augment feed, TB logging,
per-epoch checkpoints) as a black-box subprocess over the synthetic
mount (data/synth.py), for 2000 steps, with:

  * an RSS/step monitor sampling the trainer process every 10 s,
  * a mid-run SIGKILL once the epoch-`kill_after_epoch` checkpoint
    lands (preemption simulation), then a relaunch with --auto_resume,
  * a post-run analysis that parses the train log + TB-scalar cadence
    and writes artifacts/soak_kitti_r5.json with pass/fail checks:
    loss finite everywhere and trending down, resume continued from the
    right epoch, steady-state step time stable (no retrace creep), RSS
    stable.

Reference system under test: `KITTI/trainer.py:182-229` (run_epoch x
num_epochs) — the reference's whole purpose, never previously executed
sustained on this hardware.

Run: nohup python tools_dev/soak_kitti_experiment.py > /tmp/soak.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import re
import signal
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.environ.get("WMD_SOAK_DATA", "/root/data_synth")
LOG_DIR = os.environ.get("WMD_SOAK_LOGDIR", "/root/soak_logs")
MODEL = "soak_r5"
NUM_EPOCHS = 25          # x steps_per_epoch() -> >=2000 steps
KILL_AFTER_EPOCH = 12    # SIGKILL once weights_12 exists (mid-run)


def steps_per_epoch() -> int:
    with open(os.path.join(DATA, "splits", "eigen",
                           "train_files.txt")) as f:
        n = sum(1 for ln in f if ln.strip())
    return n // 12

ARGS = ["--data_path", DATA, "--split", "eigen",
        "--use_stereo", "--frame_ids", "0",
        "--use_depth_hints", "--use_wavelets",
        "--height", "192", "--width", "640",
        "--num_layers", "18", "--batch_size", "12", "--bfloat16",
        "--num_epochs", str(NUM_EPOCHS),
        "--log_frequency", "20", "--num_workers", "4",
        # from-scratch stabilizers (utils/config.py / DEVIATIONS.md):
        # no ImageNet weights exist offline, and a scratch init under
        # the reference's log-depth hint loss collapses to a depth rail
        # (round-5 diagnosis, PERF.md). The reference never trains from
        # scratch — these two opt-ins are the offline substitute.
        "--hint_disp_l1_weight", "1.0", "--disp_head_bias", "-4.0",
        "--model_name", MODEL, "--log_dir", LOG_DIR]

LINE_RE = re.compile(
    r"epoch\s+(\d+) \| batch\s+(\d+) \| forward: +([0-9.]+)s "
    r"\(examples/s: +([0-9.]+)\) \| dataloading: ([0-9.]+)s "
    r"\| loss: ([0-9.naninf-]+)")


def monitor_rss(pid: int, out: list, stop: threading.Event):
    while not stop.is_set():
        try:
            with open(f"/proc/{pid}/status") as f:
                for ln in f:
                    if ln.startswith("VmRSS"):
                        out.append((time.time(),
                                    int(ln.split()[1]) // 1024))
                        break
        except OSError:
            return
        stop.wait(10.0)


def launch(extra, log_path):
    logf = open(log_path, "ab", buffering=0)
    proc = subprocess.Popen(
        [sys.executable, "-m", "wavelet_monodepth_tpu.tools.train_kitti"]
        + ARGS + extra,
        cwd=REPO, stdout=logf, stderr=subprocess.STDOUT)
    rss, stop = [], threading.Event()
    t = threading.Thread(target=monitor_rss, args=(proc.pid, rss, stop),
                         daemon=True)
    t.start()
    return proc, rss, stop


def ckpt_dir(epoch):
    return os.path.join(LOG_DIR, MODEL, "models", f"weights_{epoch}")


def main():
    os.makedirs(LOG_DIR, exist_ok=True)
    train_log = os.path.join(LOG_DIR, "train_console.log")
    if os.path.exists(os.path.join(LOG_DIR, MODEL)):
        import shutil
        shutil.rmtree(os.path.join(LOG_DIR, MODEL))
    for f in (train_log,):
        if os.path.exists(f):
            os.remove(f)

    t0 = time.time()
    print(f"[soak] phase A: launching trainer ({NUM_EPOCHS} epochs, "
          f"kill after epoch {KILL_AFTER_EPOCH})", flush=True)
    proc, rss_a, stop_a = launch([], train_log)
    killed_at = None
    while proc.poll() is None:
        if os.path.isdir(ckpt_dir(KILL_AFTER_EPOCH)):
            time.sleep(5)          # let the checkpoint finish writing
            print(f"[soak] weights_{KILL_AFTER_EPOCH} exists -> SIGKILL "
                  f"(preemption sim) at t={time.time() - t0:.0f}s",
                  flush=True)
            proc.send_signal(signal.SIGKILL)
            killed_at = time.time()
            break
        time.sleep(5)
    proc.wait()
    stop_a.set()
    if killed_at is None:
        print("[soak] FAIL: trainer exited before the kill checkpoint "
              f"(rc={proc.returncode})", flush=True)
        sys.exit(1)

    print("[soak] phase B: relaunch with --auto_resume", flush=True)
    proc, rss_b, stop_b = launch(["--auto_resume"], train_log)
    rc = proc.wait()
    stop_b.set()
    wall = time.time() - t0
    print(f"[soak] phase B exited rc={rc} after {wall:.0f}s total",
          flush=True)

    # ---- analysis ----
    with open(train_log, errors="replace") as f:
        log = f.read()
    steps = []
    for m in LINE_RE.finditer(log):
        steps.append(dict(epoch=int(m.group(1)), batch=int(m.group(2)),
                          forward_s=float(m.group(3)),
                          examples_s=float(m.group(4)),
                          dataload_s=float(m.group(5)),
                          loss=float(m.group(6))))
    resume_line = re.search(r"auto-resume: restoring (\S+), continuing "
                            r"at epoch (\d+)", log)
    losses = [s["loss"] for s in steps]
    # per-epoch mean loss from logged lines
    by_epoch = {}
    for s in steps:
        by_epoch.setdefault(s["epoch"], []).append(s["loss"])
    epoch_mean = {e: sum(v) / len(v) for e, v in sorted(by_epoch.items())}
    # steady-state wall rate from phase B (all >=1000 steps, one logged
    # line at most): epochs_remaining * 80 steps / phase-B wall time
    phase_b_wall = time.time() - killed_at
    resumed_epoch = int(resume_line.group(2)) if resume_line else None
    spe = steps_per_epoch()
    steps_b = (NUM_EPOCHS - resumed_epoch) * spe if resumed_epoch else None
    rss_all = rss_a + rss_b

    def rate_window(lo, hi):
        xs = [s for s in steps if lo <= s["epoch"] < hi]
        return (sum(x["examples_s"] for x in xs) / len(xs)) if xs else None

    checks = {
        "completed": rc == 0,
        "resumed_from_killed_epoch":
            resumed_epoch == KILL_AFTER_EPOCH + 1,
        "all_losses_finite": all(l == l and abs(l) < 1e9 for l in losses),
        "loss_trending_down":
            len(epoch_mean) >= 6 and
            (sum(list(epoch_mean.values())[-3:]) / 3
             < 0.7 * sum(list(epoch_mean.values())[:3]) / 3),
        "final_checkpoint_exists": os.path.isdir(ckpt_dir(NUM_EPOCHS - 1)),
        "rss_stable": (len(rss_b) > 3 and
                       max(r for _, r in rss_b[len(rss_b) // 2:])
                       < 1.25 * max(r for _, r in
                                    rss_b[:len(rss_b) // 2])),
    }
    summary = {
        "config": "R18 640x192 b12 bf16-mp stereo+hints uint8-feed",
        "steps_per_epoch": spe,
        "total_steps": NUM_EPOCHS * spe,
        "wall_s": wall,
        "killed_after_epoch": KILL_AFTER_EPOCH,
        "resumed_at_epoch": resumed_epoch,
        "first_losses": losses[:3],
        "last_losses": losses[-3:],
        "epoch_mean_loss": epoch_mean,
        "examples_s_early(ep1-3)": rate_window(1, 4),
        "examples_s_late(ep8-12)": rate_window(8, 13),
        "phase_b_wall_s": phase_b_wall,
        "phase_b_steps": steps_b,
        "phase_b_ms_per_step": (1e3 * phase_b_wall / steps_b
                                if steps_b else None),
        "rss_mb_first": rss_all[0][1] if rss_all else None,
        "rss_mb_max": max((r for _, r in rss_all), default=None),
        "rss_mb_last": rss_all[-1][1] if rss_all else None,
        "tb_event_files": sorted(
            os.path.join(m, f)
            for m in ("train", "val")
            if os.path.isdir(os.path.join(LOG_DIR, MODEL, m))
            for f in os.listdir(os.path.join(LOG_DIR, MODEL, m))
            if "tfevents" in f),
        "checks": checks,
        "ok": all(checks.values()),
    }
    out = os.path.join(REPO, "artifacts", "soak_kitti_r5.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1), flush=True)
    print(f"[soak] {'PASS' if summary['ok'] else 'FAIL'} -> {out}",
          flush=True)


if __name__ == "__main__":
    main()
