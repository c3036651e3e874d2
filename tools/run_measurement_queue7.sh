#!/bin/bash
# Round-3 queue 7: matcher_num_points lever (criterion pair is 421 ms of
# the 0.82 s train step; the matcher cost scan is ~300 ms of that and
# linear in the matcher point count).
# Usage: bash tools/run_measurement_queue7.sh >> MEASUREMENTS_r3_auto.log 2>&1
set -u
cd "$(dirname "$0")/.."
log() { echo "=== [$1] $(date -u +%H:%M:%S) :: $2"; }

echo "###### queue7 start $(date -u) ######"

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

log ab-full-mp20k "full-scale convergence A/B, matcher-points 20000 (vs queue6 baseline)"
timeout 10800 python tools/ab_convergence.py --scale full --steps 300 \
  --seed 0 --arms iid,lattice --matcher-points 20000 \
  --out ab_full_seed0_mp20k.json
echo "--- [ab-full-mp20k] rc=$? $(date -u +%H:%M:%S)"

echo "###### queue7 done $(date -u) ######"
