#!/bin/bash
# Round-3 on-chip measurement queue.
# Runs each queued measurement sequentially (NEVER two TPU processes at
# once), appending results to MEASUREMENTS_r3_auto.log in the repo so the
# round driver's end-of-round commit captures them.
cd /root/repo
LOG=/root/repo/MEASUREMENTS_r3_auto.log
run() {
  local tag="$1"; shift
  local to="$1"; shift
  echo "=== [$tag] $(date -u +%H:%M:%S) :: $*" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  echo "--- [$tag] rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}

echo "###### queue start $(date -u) ######" >> "$LOG"
# (point-loss legs removed: the fused kernel was measured on-chip, lost, and was deleted — see PERFORMANCE.md round 3)
# [3] eval composition at the production kernel (pallas_auto)
run eval-ablate 1800 python tools/bench_eval_ablate.py
# [4] train step: production CLI defaults (pallas_auto + lattice)
run train-cli-defaults 3000 python tools/bench_train_step.py --cli-defaults
# [5] train step: orient y with the same flags (the A/B VERDICT asked for)
run train-pallas-y 3000 python tools/bench_train_step.py \
  --student-pallas --teacher-pallas --point-sampling lattice --msda-orient y
# [6] transport attribution (packed-upload anomaly)
run transport-attrib 1800 python tools/bench_transport_attrib.py
# [H] headline bench at defaults (ADVICE r2: pin the non-default leg
# explicitly; pallas_auto IS the default now)
run H-bench 3000 python bench.py
echo "###### queue done $(date -u) ######" >> "$LOG"
