#!/bin/bash
# Round-3 queue 5: full-scale convergence A/B (VERDICT r2 Weak #6) on the
# real chip + refreshed eval composition after the H-pack change.
# Usage: bash tools/run_measurement_queue5.sh >> MEASUREMENTS_r3_auto.log 2>&1
set -u
cd "$(dirname "$0")/.."
log() { echo "=== [$1] $(date -u +%H:%M:%S) :: $2"; }

echo "###### queue5 start $(date -u) ######"

log ab-full-smoke "ab_convergence --scale full --steps 3 (compile + sanity)"
timeout 3600 python tools/ab_convergence.py --scale full --steps 3 \
  --arms naive,iid,lattice --out /tmp/ab_full_smoke.json
echo "--- [ab-full-smoke] rc=$? $(date -u +%H:%M:%S)"

log ab-full-s0 "ab_convergence --scale full --steps 300 --seed 0"
timeout 10800 python tools/ab_convergence.py --scale full --steps 300 \
  --seed 0 --out ab_full_seed0.json
echo "--- [ab-full-s0] rc=$? $(date -u +%H:%M:%S)"

log eval-ablate-hpack "eval composition after the H-pack"
timeout 2400 python tools/bench_eval_ablate.py
echo "--- [eval-ablate-hpack] rc=$? $(date -u +%H:%M:%S)"

log postprocess-hpack "postprocess stage attribution after the H-pack"
timeout 2400 python tools/bench_postprocess.py
echo "--- [postprocess-hpack] rc=$? $(date -u +%H:%M:%S)"

log wholevideo-t36 "whole-video eval refresh at T=36 (pallas_auto + composed postprocess + H-pack)"
timeout 2400 python tools/bench_eval_ablate.py --t 36 --iters 5
echo "--- [wholevideo-t36] rc=$? $(date -u +%H:%M:%S)"

echo "###### queue5 done $(date -u) ######"
