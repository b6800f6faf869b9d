#!/bin/bash
# Round-5 TPU queue, phase 2: waits for phase 1 (tpu_queue_r5.sh, pid in
# /tmp/queue.pid) to finish, then:
#   1. fabricates a NEAR-RANGE synthetic mount (the first soak's mount
#      used the far defaults — its 70 m background subtends ~3 px of
#      stereo disparity at 640 px, starving photometric supervision;
#      round-5 warp_scale_probe confirmed the geometry itself is exact),
#   2. reruns the production KITTI soak on it (fresh model, kill+resume,
#      MALLOC_ARENA_MAX=2 A/B for the anon-RSS ramp, RSS timeline),
#   3. re-runs the self-golden gate on the new checkpoint with the
#      f32-pinned torch oracle.
#
#   WMD_SOAK_HINT_W=<w> nohup bash tools_dev/tpu_queue_r5b.sh \
#       > /tmp/queue2.log 2>&1 &
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

export WMD_SOAK_DATA=/root/data_synth_near
export WMD_SOAK_LOGDIR=/root/soak_logs
export WMD_SOAK_MODEL=soak_r5n
export WMD_SOAK_EPOCHS=10
export WMD_SOAK_KILL_EPOCH=5
export WMD_SOAK_HINT_W=${WMD_SOAK_HINT_W:-4.0}
export WMD_SOAK_ARENA_MAX=2
export WMD_SOAK_OUT_SUFFIX=b

if [ ! -d /root/data_synth_near ]; then
  stage fab_near python -m wavelet_monodepth_tpu.data.synth \
    --root /root/data_synth_near --n_train 1920 --n_val 48 --n_test 32 \
    --write_hints --z_near 2.0 --z_far 12.0 --bg_depth 14.0
fi

stage soak_kitti2 timeout 10800 python tools_dev/soak_kitti_experiment.py
stage self_golden2 timeout 4200 python tools_dev/self_golden_experiment.py

# NYU rerun: 10 epochs (600 steps), arena cap A/B + persisted RSS
# timeline, calibrated trend gate (see soak_nyu_experiment.py)
export WMD_NYU_EPOCHS=10
export WMD_NYU_ARENA_MAX=2
export WMD_NYU_OUT_SUFFIX=b
stage soak_nyu2 timeout 7200 python tools_dev/soak_nyu_experiment.py
echo "[queue2] ALL DONE $(date -u +%H:%M:%S)"
