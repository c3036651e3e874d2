#!/bin/bash
# Round-3 queue phase 4: headline bench after the composed-postprocess +
# H-blend resize work, plus the postprocess stage re-check. Waits for
# phase 3.
cd /root/repo
LOG=/root/repo/MEASUREMENTS_r3_auto.log
while ! grep -q "queue3 done" "$LOG"; do sleep 20; done
run() {
  local tag="$1"; shift
  local to="$1"; shift
  echo "=== [$tag] $(date -u +%H:%M:%S) :: $*" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  echo "--- [$tag] rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}
echo "###### queue4 start $(date -u) ######" >> "$LOG"
run H-bench2 3000 python bench.py
run postprocess2 1800 python tools/bench_postprocess.py
run eval-ablate2 1800 python tools/bench_eval_ablate.py
echo "###### queue4 done $(date -u) ######" >> "$LOG"
