#!/bin/bash
# Round-3 on-chip measurement queue, phase 2 (post point-loss alignment fix
# + corr-map CoTracker rewrite). Waits for phase 1 to finish first (never
# two TPU processes at once).
cd /root/repo
LOG=/root/repo/MEASUREMENTS_r3_auto.log
while ! grep -q "queue done" "$LOG"; do sleep 20; done
run() {
  local tag="$1"; shift
  local to="$1"; shift
  echo "=== [$tag] $(date -u +%H:%M:%S) :: $*" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  echo "--- [$tag] rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}

echo "###### queue2 start $(date -u) ######" >> "$LOG"
# (point-loss legs removed: the fused kernel was measured on-chip, lost, and was deleted — see PERFORMANCE.md round 3)
# [3] postprocess stage attribution (the 12.5 ms tail)
run postprocess 1800 python tools/bench_postprocess.py
# [4] keymask trackers, BOTH backends (VERDICT #8) after the corr-map rewrite
run keymask-both 2400 python tools/bench_keymask.py --neural
echo "###### queue2 done $(date -u) ######" >> "$LOG"
