#!/bin/bash
# Round-3 queue 6 (rev b): full-scale convergence A/B after the palette
# fix, the pallas-auction batch-1 Mosaic fix, and the naive-arm layer
# scan (the unrolled 10-layer pools OOM'd HBM); then the matcher-points
# lever (queue7 legs folded in so the chip pipeline stays full).
# Usage: bash tools/run_measurement_queue6.sh >> MEASUREMENTS_r3_auto.log 2>&1
set -u
cd "$(dirname "$0")/.."
log() { echo "=== [$1] $(date -u +%H:%M:%S) :: $2"; }

echo "###### queue6b start $(date -u) ######"

log ab-full-s0 "ab_convergence --scale full --steps 150 --seed 0"
timeout 14400 python tools/ab_convergence.py --scale full --steps 150 \
  --seed 0 --out ab_full_seed0.json
echo "--- [ab-full-s0] rc=$? $(date -u +%H:%M:%S)"

for mp in 0 40000 20000 10000; do
  log "crit-mp$mp" "criterion pair, lattice+amp, matcher-points=$mp"
  timeout 1800 python tools/bench_criterion.py --amp \
    --point-sampling lattice --matcher-points "$mp"
  echo "--- [crit-mp$mp] rc=$? $(date -u +%H:%M:%S)"
done

log train-mp20k "train step, CLI defaults + matcher-points 20000"
timeout 3000 python tools/bench_train_step.py --cli-defaults \
  --matcher-points 20000
echo "--- [train-mp20k] rc=$? $(date -u +%H:%M:%S)"

log ab-full-mp20k "full-scale convergence A/B, matcher-points 20000 (vs ab-full-s0)"
timeout 10800 python tools/ab_convergence.py --scale full --steps 150 \
  --seed 0 --arms iid,lattice --matcher-points 20000 \
  --out ab_full_seed0_mp20k.json
echo "--- [ab-full-mp20k] rc=$? $(date -u +%H:%M:%S)"

echo "###### queue6b done $(date -u) ######"
