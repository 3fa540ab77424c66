#!/usr/bin/env bash
# Serialized round-4 evidence pipeline (this box has ONE cpu core, so the
# jobs are chained rather than parallel):
#   1. sim2sim gates for seed3 + the conditioned-clock command sweep
#   2. rough-terrain + flat bench on the (now idle) TPU  (VERDICT r3 #7)
#   3. full default test suite
#   4. sustained 2-process multihost training run         (VERDICT r3 #3)
set -u
cd "$(dirname "$0")/.."
mkdir -p RESULTS/r4
log() { echo "[chain $(date -u +%H:%M:%S)] $*" | tee -a RESULTS/r4/chain.log; }

log "gates_resume start"
bash scripts/r4_gates_resume.sh >> RESULTS/r4/gates_r4.log 2>&1
log "gates_resume done rc=$?"

log "bench rough start"
timeout 3600 python bench.py --task rough_terrain_backlash \
  > RESULTS/r4/bench_rough.json 2> RESULTS/r4/bench_rough.log
log "bench rough rc=$? $(cat RESULTS/r4/bench_rough.json 2>/dev/null)"

log "bench flat start"
timeout 3600 python bench.py > RESULTS/r4/bench_flat.json 2> RESULTS/r4/bench_flat.log
log "bench flat rc=$? $(cat RESULTS/r4/bench_flat.json 2>/dev/null)"

log "pytest start"
timeout 7200 python -m pytest tests/ -q > RESULTS/r4/pytest_r4.log 2>&1
log "pytest rc=$? $(tail -1 RESULTS/r4/pytest_r4.log)"

log "multihost sustained start"
timeout 14000 python scripts/multihost_sustained.py \
  > RESULTS/r4/multihost_sustained.log 2>&1
log "multihost sustained rc=$? $(grep -E '^\{' RESULTS/r4/multihost_sustained.log | tail -1)"

log "chain done"
