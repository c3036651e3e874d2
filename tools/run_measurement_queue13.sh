#!/bin/bash
# Round-4 queue 13: the remaining long leg after queue12's decision
# legs finished — the reference-exact naive yardstick arm at seed 1
# (~79 s/step full scale; resumable, a timeout window loses <=10 steps).
# Usage: nohup bash tools/run_measurement_queue13.sh >> MEASUREMENTS_r4_auto.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
log() { echo "=== [$1] $(date -u +%H:%M:%S) :: $2"; }

echo "###### queue13 start $(date -u) ######"

out=ab_full_seed1_naive.json
for i in $(seq 1 8); do
  log ab-full-s1-naive "attempt $i/8"
  timeout 3600 python tools/ab_convergence.py --scale full --ckpt-every 10 \
    --resume --out "$out" --steps 150 --seed 1 --arms naive
  echo "--- [ab-full-s1-naive] attempt $i rc=$? $(date -u +%H:%M:%S)"
  [ -f "$out" ] && break
done
[ -f "$out" ] && echo "--- [ab-full-s1-naive] DONE: $out" || echo "--- [ab-full-s1-naive] FAILED after 8 attempts"

echo "###### queue13 done $(date -u) ######"
