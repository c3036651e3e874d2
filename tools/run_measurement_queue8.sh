#!/bin/bash
# Round-3 queue 8: seed-1 replicas of the full-scale convergence A/B
# (iid/lattice at matcher-points 0 and 20000) so the matcher-points and
# lattice-default decisions rest on two seeds. The naive reference arm is
# seed-0 only (it costs ~3h alone); every run still scores against the
# frozen naive-criterion yardstick + held-out IoU.
# Usage: nohup bash tools/run_measurement_queue8.sh >> MEASUREMENTS_r3_auto.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
log() { echo "=== [$1] $(date -u +%H:%M:%S) :: $2"; }

PREV_PID="$(cat /tmp/queue7_r3.pid 2>/dev/null || echo 0)"
while [ "$PREV_PID" != 0 ] && kill -0 "$PREV_PID" 2>/dev/null; do sleep 120; done

echo "###### queue8 start $(date -u) ######"

log ab-full-s1 "ab_convergence seed 1, iid+lattice, matcher-points 0"
timeout 7200 python tools/ab_convergence.py --scale full --steps 150 \
  --seed 1 --arms iid,lattice --out ab_full_seed1.json
echo "--- [ab-full-s1] rc=$? $(date -u +%H:%M:%S)"

log ab-full-s1-mp20k "ab_convergence seed 1, iid+lattice, matcher-points 20000"
timeout 7200 python tools/ab_convergence.py --scale full --steps 150 \
  --seed 1 --arms iid,lattice --matcher-points 20000 \
  --out ab_full_seed1_mp20k.json
echo "--- [ab-full-s1-mp20k] rc=$? $(date -u +%H:%M:%S)"

echo "###### queue8 done $(date -u) ######"
