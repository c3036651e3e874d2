#!/bin/bash
# Round-5 queue 14: second seed for the MATCHER_NUM_POINTS=20000 harm
# verdict (VERDICT r4 weak #6 — the mp-20K convergence evidence rested on
# seed 0 alone). Same arm spec as queue12's seed-0 leg, at seed 1.
# Usage: nohup bash tools/run_measurement_queue14.sh >> MEASUREMENTS_r5_auto.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
log() { echo "=== [$1] $(date -u +%H:%M:%S) :: $2"; }

echo "###### queue14 start $(date -u) ######"
out=ab_full_seed1_mp20k.json
for i in $(seq 1 4); do
  log ab-full-s1-mp20k "attempt $i/4"
  timeout 3600 python tools/ab_convergence.py --scale full --ckpt-every 10 \
    --resume --out "$out" --steps 150 --seed 1 --arms iid --matcher-points 20000
  echo "--- [ab-full-s1-mp20k] attempt $i rc=$? $(date -u +%H:%M:%S)"
  [ -f "$out" ] && break
done
[ -f "$out" ] && echo "--- [ab-full-s1-mp20k] DONE: $out" || echo "--- [ab-full-s1-mp20k] FAILED"
echo "###### queue14 done $(date -u) ######"
