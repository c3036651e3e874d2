#!/bin/bash
# Round-3 queue phase 3: end-to-end eval-CLI wall-clock (VERDICT r2 #5),
# packed vs unpacked readback A/B. Waits for phase 2.
cd /root/repo
LOG=/root/repo/MEASUREMENTS_r3_auto.log
while ! grep -q "queue2 done" "$LOG"; do sleep 20; done
run() {
  local tag="$1"; shift
  local to="$1"; shift
  echo "=== [$tag] $(date -u +%H:%M:%S) :: $*" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  echo "--- [$tag] rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}
echo "###### queue3 start $(date -u) ######" >> "$LOG"
run evalcli-packed 3000 env S2D_PACK_MASKS=1 python tools/bench_eval_cli.py --videos 4 --t 16
run evalcli-unpacked 3000 env S2D_PACK_MASKS=0 python tools/bench_eval_cli.py --videos 4 --t 16
echo "###### queue3 done $(date -u) ######" >> "$LOG"
