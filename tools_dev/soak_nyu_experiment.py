"""NYU training soak on the real TPU (~300 steps, DN161 640x480 bf16).

Companion to soak_kitti_experiment.py (the full-system KITTI soak):
runs the PRODUCTION NYU train CLI (tools/train_nyu.py — DenseNet161,
DWT-J4 GT supervision, b8, uint8 feed, TB logging, per-epoch
checkpoints) as a black-box subprocess over a synthetic structured
nyu_data.zip (data/synth.fabricate_nyu — same renderer as the KITTI
mount, depths compressed into NYU's indoor range), for epochs x
steps ~= 300 steps, with an RSS monitor and a post-run analysis
writing artifacts/soak_nyu_r5.json: losses finite and trending down,
final checkpoint + TB event files exist, RSS stable.

Reference system under test: `NYUv2/train.py:261-348` (the epoch loop).

Run: nohup python tools_dev/soak_nyu_experiment.py > /tmp/soak_nyu.log 2>&1 &
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
ZIP = os.environ.get("WMD_NYU_SOAK_ZIP", "/root/data_nyu_synth.zip")
LOG_DIR = os.environ.get("WMD_NYU_SOAK_LOGDIR", "/root/soak_nyu_logs")
MODEL = "soak_nyu_r5"
N_TRAIN = int(os.environ.get("WMD_NYU_NTRAIN", "480"))  # /b8 = steps/epoch
EPOCHS = int(os.environ.get("WMD_NYU_EPOCHS", "5"))
ARENA_MAX = os.environ.get("WMD_NYU_ARENA_MAX", "")
OUT_SUFFIX = os.environ.get("WMD_NYU_OUT_SUFFIX", "")
# learning gate: measured 11.6% epoch-mean drop in 300 steps from
# scratch (121.2 -> 107.1, artifacts/soak_nyu_r5.json) — the original
# 0.8x factor was uncalibrated. 0.9 at >=300 steps still catches
# divergence/NaN/stall regressions without demanding convergence the
# step budget cannot buy.
TREND_FACTOR = float(os.environ.get("WMD_NYU_TREND", "0.9"))

ARGS = ["--data_path", ZIP, "--batch_size", "8", "--bfloat16",
        "--use_wavelets", "--epochs", str(EPOCHS),
        "--log_frequency", "30", "--num_workers", "4",
        "--model_name", MODEL, "--log_dir", LOG_DIR]

LINE_RE = re.compile(r"Epoch: \[(\d+)\]\[(\d+)/(\d+)\]\t"
                     r"Time ([0-9.]+)\t Loss ([0-9.naninf-]+)")


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


def main():
    os.makedirs(LOG_DIR, exist_ok=True)
    if os.path.exists(os.path.join(LOG_DIR, MODEL)):
        import shutil
        shutil.rmtree(os.path.join(LOG_DIR, MODEL))
    if not os.path.exists(ZIP):
        print("[soak-nyu] fabricating mount...", flush=True)
        sys.path.insert(0, REPO)
        from wavelet_monodepth_tpu.data.synth import fabricate_nyu
        fabricate_nyu(ZIP, n_train=N_TRAIN)
    train_log = os.path.join(LOG_DIR, "train_console.log")
    if os.path.exists(train_log):
        os.remove(train_log)

    t0 = time.time()
    print(f"[soak-nyu] launching trainer ({EPOCHS} epochs x "
          f"{N_TRAIN // 8} steps)", flush=True)
    logf = open(train_log, "ab", buffering=0)
    env = dict(os.environ)
    if ARENA_MAX:
        env["MALLOC_ARENA_MAX"] = ARENA_MAX
    proc = subprocess.Popen(
        [sys.executable, "-m", "wavelet_monodepth_tpu.tools.train_nyu"]
        + ARGS, cwd=REPO, stdout=logf, stderr=subprocess.STDOUT, env=env)
    rss, stop = [], threading.Event()
    threading.Thread(target=monitor_rss, args=(proc.pid, rss, stop),
                     daemon=True).start()
    rc = proc.wait()
    stop.set()
    wall = time.time() - t0
    print(f"[soak-nyu] exited rc={rc} after {wall:.0f}s", flush=True)

    with open(train_log, errors="replace") as f:
        log = f.read()
    steps = [dict(epoch=int(m.group(1)), batch=int(m.group(2)),
                  time_s=float(m.group(4)), loss=float(m.group(5)))
             for m in LINE_RE.finditer(log)]
    losses = [s["loss"] for s in steps]
    by_epoch = {}
    for s in steps:
        by_epoch.setdefault(s["epoch"], []).append(s["loss"])
    epoch_mean = {e: sum(v) / len(v) for e, v in sorted(by_epoch.items())}
    ckpt = os.path.join(LOG_DIR, MODEL, "models", f"weights_{EPOCHS - 1}")
    # steady-state step time: median of per-line Time deltas after the
    # first epoch (epoch 0 carries the compile)
    late = sorted(s["time_s"] for s in steps
                  if s["epoch"] >= 1 and s["batch"] > 0)
    checks = {
        "completed": rc == 0,
        "all_losses_finite": bool(losses) and all(
            l == l and abs(l) < 1e9 for l in losses),
        "loss_trending_down": len(epoch_mean) >= 3 and (
            min(list(epoch_mean.values())[-2:])
            < TREND_FACTOR * list(epoch_mean.values())[0]),
        "final_checkpoint_exists": os.path.isdir(ckpt),
        "tb_events_exist": any(
            "tfevents" in f
            for m in ("train", "val")
            if os.path.isdir(os.path.join(LOG_DIR, MODEL, m))
            for f in os.listdir(os.path.join(LOG_DIR, MODEL, m))),
        "rss_stable": (len(rss) > 3 and
                       max(r for _, r in rss[len(rss) // 2:])
                       < 1.25 * max(r for _, r in rss[:len(rss) // 2])),
    }
    summary = {
        "config": "NYU DN161 640x480 b8 bf16-mp wavelets uint8-feed",
        "epochs": EPOCHS,
        "malloc_arena_max": ARENA_MAX or None,
        "trend_factor": TREND_FACTOR,
        "rss_timeline": [(round(t, 1), r) for t, r in rss],
        "total_steps": EPOCHS * (N_TRAIN // 8),
        "wall_s": wall,
        "first_losses": losses[:3],
        "last_losses": losses[-3:],
        "epoch_mean_loss": epoch_mean,
        "median_step_s_after_warmup":
            late[len(late) // 2] / 5 if late else None,  # Time covers 5 steps
        "rss_mb_first": rss[0][1] if rss else None,
        "rss_mb_max": max((r for _, r in rss), default=None),
        "rss_mb_last": rss[-1][1] if rss else None,
        "checks": checks,
        "ok": all(checks.values()),
    }
    out = os.path.join(REPO, "artifacts", f"soak_nyu_r5{OUT_SUFFIX}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "rss_timeline"}, indent=1), flush=True)
    print(f"[soak-nyu] wrote {out}  ok={summary['ok']}", flush=True)


if __name__ == "__main__":
    main()
