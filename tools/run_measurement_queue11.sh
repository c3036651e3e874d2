#!/bin/bash
# Round-4 queue 11: remaining measurement legs after the seed-0 full-scale
# A/B (queue10) finished and the interactive e2e-eval benches ran.
# Priority order: seed-1 production arms (confirm the iid-vs-lattice
# default decision with a 2nd seed) > matcher-points measurements
# (VERDICT r3 #4) > the slow seed-1 naive yardstick arm.
# All ab_convergence legs are resumable (--ckpt-every 10, --resume):
# a timeout window loses at most 10 steps.
# Usage: nohup bash tools/run_measurement_queue11.sh >> MEASUREMENTS_r4_auto.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
log() { echo "=== [$1] $(date -u +%H:%M:%S) :: $2"; }

# run_ab <leg> <max_attempts> <out.json> <args...>
run_ab() {
  local leg="$1" tries="$2" out="$3"; shift 3
  for i in $(seq 1 "$tries"); do
    log "$leg" "attempt $i/$tries"
    timeout 3600 python tools/ab_convergence.py --scale full --ckpt-every 10 \
      --resume --out "$out" "$@"
    echo "--- [$leg] attempt $i rc=$? $(date -u +%H:%M:%S)"
    [ -f "$out" ] && break
  done
  [ -f "$out" ] && echo "--- [$leg] DONE: $out" || echo "--- [$leg] FAILED after $tries attempts"
}

echo "###### queue11 start $(date -u) ######"

run_ab ab-s1-prod 6 ab_full_seed1_prod.json --steps 150 --seed 1 --arms iid,lattice

run_ab ab-s0-mp20k 4 ab_full_seed0_mp20k.json --steps 150 --seed 0 \
  --arms iid --matcher-points 20000

log crit-mp20k "criterion pair, lattice+amp, matcher-points=20000"
timeout 1800 python tools/bench_criterion.py --amp \
  --point-sampling lattice --matcher-points 20000
echo "--- [crit-mp20k] rc=$? $(date -u +%H:%M:%S)"

log crit-mp40k "criterion pair, lattice+amp, matcher-points=40000"
timeout 1800 python tools/bench_criterion.py --amp \
  --point-sampling lattice --matcher-points 40000
echo "--- [crit-mp40k] rc=$? $(date -u +%H:%M:%S)"

log train-mp20k "train step, CLI defaults + matcher-points 20000"
timeout 2400 python tools/bench_train_step.py --cli-defaults \
  --matcher-points 20000
echo "--- [train-mp20k] rc=$? $(date -u +%H:%M:%S)"

run_ab ab-s1-naive 6 ab_full_seed1_naive.json --steps 150 --seed 1 --arms naive

log bench-final "headline bench.py (regression gate + MFU)"
timeout 3600 python bench.py
echo "--- [bench-final] rc=$? $(date -u +%H:%M:%S)"

echo "###### queue11 done $(date -u) ######"
