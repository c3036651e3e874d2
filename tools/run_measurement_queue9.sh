#!/bin/bash
# Round-3 queue 9: rerun of the queue6b/7/8 legs lost to the 00:20 UTC
# host restart (nothing persisted — the naive arm died at step 50 and
# per-arm persistence only fires on arm completion). Time-bounded for the
# remaining session: the ~3h full-scale naive arm is NOT rerun (its
# 2-step smoke numbers + the toy-scale 3-arm A/B stand in; every arm
# below still scores against the frozen naive-criterion yardstick), and
# legs are ordered by decision value: lattice-vs-iid at full scale, then
# the matcher-points lever, then the headline refresh.
# Usage: nohup bash tools/run_measurement_queue9.sh >> MEASUREMENTS_r3_auto.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
log() { echo "=== [$1] $(date -u +%H:%M:%S) :: $2"; }

echo "###### queue9 start $(date -u) ######"

log ab-full-s0 "ab_convergence full, 150 steps, seed 0, arms iid,lattice"
timeout 2700 python tools/ab_convergence.py --scale full --steps 150 \
  --seed 0 --arms iid,lattice --out ab_full_seed0.json
echo "--- [ab-full-s0] rc=$? $(date -u +%H:%M:%S)"

log ab-full-s0-mp20k "same arms, matcher-points 20000"
timeout 2400 python tools/ab_convergence.py --scale full --steps 150 \
  --seed 0 --arms iid,lattice --matcher-points 20000 \
  --out ab_full_seed0_mp20k.json
echo "--- [ab-full-s0-mp20k] rc=$? $(date -u +%H:%M:%S)"

log crit-mp20k "criterion pair, lattice+amp, matcher-points=20000"
timeout 1500 python tools/bench_criterion.py --amp \
  --point-sampling lattice --matcher-points 20000
echo "--- [crit-mp20k] rc=$? $(date -u +%H:%M:%S)"

log train-mp20k "train step, CLI defaults + matcher-points 20000"
timeout 2400 python tools/bench_train_step.py --cli-defaults \
  --matcher-points 20000
echo "--- [train-mp20k] rc=$? $(date -u +%H:%M:%S)"

log bench-headline "bench.py at defaults (headline refresh)"
timeout 1800 python bench.py
echo "--- [bench-headline] rc=$? $(date -u +%H:%M:%S)"

log ab-full-s1 "ab_convergence seed 1, iid+lattice, matcher-points 0"
timeout 2400 python tools/ab_convergence.py --scale full --steps 150 \
  --seed 1 --arms iid,lattice --out ab_full_seed1.json
echo "--- [ab-full-s1] rc=$? $(date -u +%H:%M:%S)"

log eval-parts "bench_eval_ablate --t 8: enc/dec/backbone attribution"
timeout 2400 python tools/bench_eval_ablate.py --t 8
echo "--- [eval-parts] rc=$? $(date -u +%H:%M:%S)"

echo "###### queue9 done $(date -u) ######"
