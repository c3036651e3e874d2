#!/bin/bash
# Round-3 queue 7: waits for queue6b's pid to exit, then attributes the
# non-MSDA forward (~15 ms: backbone vs decoder vs proj/FPN/mask-head) with
# the new bench_eval_ablate variants, and refreshes the default headline.
# Usage: nohup bash tools/run_measurement_queue7.sh >> MEASUREMENTS_r3_auto.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
log() { echo "=== [$1] $(date -u +%H:%M:%S) :: $2"; }

PREV_PID="$(cat /tmp/queue6_r3.pid 2>/dev/null || echo 0)"
while [ "$PREV_PID" != 0 ] && kill -0 "$PREV_PID" 2>/dev/null; do sleep 120; done

echo "###### queue7 start $(date -u) ######"

log eval-parts "bench_eval_ablate --t 8: enc/dec/backbone attribution"
timeout 3600 python tools/bench_eval_ablate.py --t 8
echo "--- [eval-parts] rc=$? $(date -u +%H:%M:%S)"

log bench-headline "bench.py at defaults (fresh headline after queue6b)"
timeout 3600 python bench.py
echo "--- [bench-headline] rc=$? $(date -u +%H:%M:%S)"

echo "###### queue7 done $(date -u) ######"
