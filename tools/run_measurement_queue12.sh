#!/bin/bash
# Round-4 queue 12: legs re-staged after the host restart wiped the
# queue10/11 state (seed-0 full-scale A/B results survived in
# AB_CONVERGENCE.md "Full scale"; the JSONs + checkpoints did not).
# Priority: matcher-points measurements (VERDICT r3 #4) first — they are
# short and decision-relevant — then the seed-1 production arms that
# second the iid-default decision, then the slow seed-1 naive yardstick.
# All ab_convergence legs are resumable (--ckpt-every 10, --resume): a
# timeout window loses at most 10 steps. Outputs land at the repo root.
# Usage: nohup bash tools/run_measurement_queue12.sh >> MEASUREMENTS_r4_auto.log 2>&1 &
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

echo "###### queue12 start $(date -u) ######"

log crit-mp20k "criterion pair, amp, matcher-points=20000"
timeout 1800 python tools/bench_criterion.py --amp --matcher-points 20000
echo "--- [crit-mp20k] rc=$? $(date -u +%H:%M:%S)"

log crit-mp40k "criterion pair, amp, matcher-points=40000"
timeout 1800 python tools/bench_criterion.py --amp --matcher-points 40000
echo "--- [crit-mp40k] rc=$? $(date -u +%H:%M:%S)"

log train-mp20k "train step, CLI defaults + matcher-points 20000"
timeout 2400 python tools/bench_train_step.py --cli-defaults --matcher-points 20000
echo "--- [train-mp20k] rc=$? $(date -u +%H:%M:%S)"

log train-mp0 "train step, CLI defaults (matcher-points=0 baseline, same session)"
timeout 2400 python tools/bench_train_step.py --cli-defaults
echo "--- [train-mp0] rc=$? $(date -u +%H:%M:%S)"

# seed-1 production arms: second seed for the iid-vs-lattice default
# decision (AB_CONVERGENCE.md "Full scale", seed 0 committed)
run_ab ab-full-s1-prod 6 ab_full_seed1_prod.json --steps 150 --seed 1 --arms iid,lattice

# matcher-points convergence arm (seed 0, iid): does the cheaper matcher
# cost scan change the training outcome?
run_ab ab-full-s0-mp20k 4 ab_full_seed0_mp20k.json --steps 150 --seed 0 \
  --arms iid --matcher-points 20000

# the slow reference-exact yardstick arm at seed 1 (~3h+)
run_ab ab-full-s1-naive 8 ab_full_seed1_naive.json --steps 150 --seed 1 --arms naive

echo "###### queue12 done $(date -u) ######"
