#!/bin/bash
# Round-2 on-chip measurement queue (rebuilt after /tmp wipe).
# Runs each queued measurement sequentially (NEVER two TPU processes at
# once), appending results to MEASUREMENTS_r2_auto.log in the repo so the
# round driver's end-of-round commit captures them.
cd /root/repo
LOG=/root/repo/MEASUREMENTS_r2_auto.log
run() {
  local tag="$1"; shift
  local to="$1"; shift
  echo "=== [$tag] $(date -u +%H:%M:%S) :: $*" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  echo "--- [$tag] rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}

echo "###### queue start $(date -u) ######" >> "$LOG"
# [0c] gate: packed mask readback (bench production path)
run 0c-packbits 900 python tools/check_packbits_onchip.py
# [H] headline bench, default kernel (orientation y)
run H-bench-default 3000 python bench.py
# [0b] MSDA microbench: orientation A/B
run 0b-msda-y 900 python tools/bench_msda_micro.py --pallas --orient y
run 0b-msda-auto 900 python tools/bench_msda_micro.py --pallas --orient auto
# [H2] headline bench with swapped-orientation kernel
run H-bench-auto 3000 env S2D_MSDA_IMPL=pallas_auto python bench.py
# [0] gate: fused point-loss Mosaic parity (flip default on pass)
run 0-pointloss-gate 1800 python tools/check_point_loss_onchip.py
# q_tile sweep on the winning orientation
run qtile-1024 1200 env S2D_MSDA_QTILE=1024 python bench.py
# transport microbench
run transport 1200 python tools/bench_transport.py
# train step with auto orientation
run train-auto 2400 python tools/bench_train_step.py --msda-orient auto
# fused point-loss bench (standalone)
run pointloss-bench 1200 python tools/bench_point_loss.py
# keymask discovery batching
run keymask 1800 python tools/bench_keymask.py
echo "###### queue done $(date -u) ######" >> "$LOG"
