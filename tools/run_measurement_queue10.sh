#!/bin/bash
# Round-4 queue 10: the full-scale convergence A/B (VERDICT r3 next-round
# #1) plus the matcher-points on-chip measurements (#4). Every
# ab_convergence leg runs with --resume and intra-arm checkpointing
# (--ckpt-every 10, ~285MB pickle at repo root, gitignored), retried in
# 60-min timeout windows: a timeout or host restart now loses at most 10
# steps of the current arm instead of the whole run (round 3 lost ~6h to
# exactly that). Outputs land at the REPO root (not /tmp) so they survive
# host restarts.
# Usage: nohup bash tools/run_measurement_queue10.sh >> MEASUREMENTS_r4_auto.log 2>&1 &
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

echo "###### queue10 start $(date -u) ######"

# Decision-relevant production arms first, then the naive yardstick arm
# (the slow one, ~40-70 s/step observed round 3).
run_ab ab-full-s0 8 ab_full_seed0.json --steps 150 --seed 0 --arms iid,lattice,naive

run_ab ab-full-s0-mp20k 4 ab_full_seed0_mp20k.json --steps 150 --seed 0 \
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

run_ab ab-full-s1 8 ab_full_seed1.json --steps 150 --seed 1 --arms iid,lattice,naive

echo "###### queue10 done $(date -u) ######"
