#!/bin/bash
# Round-3 queue 6: full-scale convergence A/B retry after the make_batch
# palette fix (queue5's runs crashed on colors[ni] with n=8).
# Usage: bash tools/run_measurement_queue6.sh >> MEASUREMENTS_r3_auto.log 2>&1
set -u
cd "$(dirname "$0")/.."
log() { echo "=== [$1] $(date -u +%H:%M:%S) :: $2"; }

echo "###### queue6 start $(date -u) ######"

log ab-full-smoke "ab_convergence --scale full --steps 3 (compile + sanity)"
timeout 3600 python tools/ab_convergence.py --scale full --steps 3 \
  --arms naive,iid,lattice --out /tmp/ab_full_smoke.json
echo "--- [ab-full-smoke] rc=$? $(date -u +%H:%M:%S)"

log ab-full-s0 "ab_convergence --scale full --steps 300 --seed 0"
timeout 10800 python tools/ab_convergence.py --scale full --steps 300 \
  --seed 0 --out ab_full_seed0.json
echo "--- [ab-full-s0] rc=$? $(date -u +%H:%M:%S)"

echo "###### queue6 done $(date -u) ######"
