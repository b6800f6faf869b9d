#!/bin/bash
# Round-5 TPU queue, phase 2: waits for phase 1 (tpu_queue_r5.sh) to
# finish, then extends the KITTI soak checkpoint (+12 epochs, RSS
# timeline, MALLOC_ARENA_MAX A/B) and re-runs the self-golden gate on
# the continued checkpoint with the f32-pinned torch oracle.
#
#   nohup bash tools_dev/tpu_queue_r5b.sh > /tmp/queue2.log 2>&1 &
set -u
cd /root/repo

stage() {
  local name="$1"; shift
  echo "[queue2] ===== $name start $(date -u +%H:%M:%S) ====="
  "$@" > "/tmp/q_${name}.log" 2>&1
  echo "[queue2] ===== $name exit=$? $(date -u +%H:%M:%S) ====="
}

# wait for phase 1 (poll its pid file; the chip is single-tenant for
# us — never overlap device-touching jobs)
Q1PID=$(cat /tmp/queue.pid 2>/dev/null || echo 0)
while [ "$Q1PID" != 0 ] && kill -0 "$Q1PID" 2>/dev/null; do
  sleep 30
done
echo "[queue2] phase 1 queue is gone; starting $(date -u +%H:%M:%S)"

export WMD_SOAK_DATA=/root/data_synth
export WMD_SOAK_LOGDIR=/root/soak_logs

stage soak_cont timeout 9000 python tools_dev/soak_continue_experiment.py
stage self_golden2 timeout 4200 python tools_dev/self_golden_experiment.py
echo "[queue2] ALL DONE $(date -u +%H:%M:%S)"
