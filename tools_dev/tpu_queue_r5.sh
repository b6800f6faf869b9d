#!/bin/bash
# Sequential round-5 TPU measurement queue (single shared chip — never
# run two device-touching jobs concurrently; CLAUDE.md landmine #4/#7).
# Each stage is bounded and logs to its own file; a relay outage fails
# the stage but the queue proceeds so later stages can retry contact.
#
#   nohup bash tools_dev/tpu_queue_r5.sh > /tmp/queue.log 2>&1 &
set -u
cd /root/repo

stage() {
  local name="$1"; shift
  echo "[queue] ===== $name start $(date -u +%H:%M:%S) ====="
  "$@" > "/tmp/q_${name}.log" 2>&1
  echo "[queue] ===== $name exit=$? $(date -u +%H:%M:%S) ====="
}

export WMD_SOAK_DATA=/root/data_synth
export WMD_SOAK_LOGDIR=/root/soak_logs
export WMD_NYU_SOAK_ZIP=/root/data_nyu_synth.zip

stage soak_kitti timeout 10800 python tools_dev/soak_kitti_experiment.py
stage self_golden timeout 4200 python tools_dev/self_golden_experiment.py
stage soak_nyu timeout 5400 python tools_dev/soak_nyu_experiment.py
stage bench_grid timeout 5400 python -m wavelet_monodepth_tpu.tools.bench_grid \
  --out artifacts/bench_grid_r5.json
echo "[queue] ALL DONE $(date -u +%H:%M:%S)"
