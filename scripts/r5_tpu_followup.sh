#!/usr/bin/env bash
# Round-5 TPU follow-up: once the training queue drains, capture the
# absolute-perf evidence on the real chip (VERDICT r4 #2/#6):
#   - mfu_roofline kernel mode, flat + rough (cost analysis + roofline)
#   - mfu_roofline --epoch (recipe-scale breakdown: rollout/sgd/eval +
#     full-state checkpoint save cost at 8192 envs)
#   - bench.py flat + rough (round-5 BENCH numbers for RESULTS.md)
set -u
cd "$(dirname "$0")/.."
mkdir -p RESULTS/r5
log() { echo "[r5tpu $(date -u +%H:%M:%S)] $*" | tee -a RESULTS/r5/tpu_followup.log; }

while ! grep -q "queue] drained" RESULTS/r5/queue_r5.log 2>/dev/null; do
  sleep 60
done
log "queue drained; starting perf captures"

JAX_PLATFORMS='' timeout 2400 python scripts/mfu_roofline.py \
  --out RESULTS/r5/mfu_kernel_flat.json > RESULTS/r5/mfu_kernel_flat.log 2>&1
log "mfu kernel flat rc=$?"

JAX_PLATFORMS='' timeout 2400 python scripts/mfu_roofline.py \
  --task rough_terrain_backlash \
  --out RESULTS/r5/mfu_kernel_rough.json > RESULTS/r5/mfu_kernel_rough.log 2>&1
log "mfu kernel rough rc=$?"

JAX_PLATFORMS='' ODP_DEBUG_AVALS=1 timeout 3600 python scripts/mfu_roofline.py --epoch \
  --out RESULTS/r5/mfu_epoch.json > RESULTS/r5/mfu_epoch.log 2>&1
log "mfu epoch rc=$? $(grep -c 'AVAL DRIFT' RESULTS/r5/mfu_epoch.log) drift leaves"

JAX_PLATFORMS='' timeout 2400 python bench.py \
  > RESULTS/r5/bench_flat.json 2> RESULTS/r5/bench_flat.log
log "bench flat rc=$? $(cat RESULTS/r5/bench_flat.json)"

JAX_PLATFORMS='' timeout 2400 python bench.py --task rough_terrain_backlash \
  > RESULTS/r5/bench_rough.json 2> RESULTS/r5/bench_rough.log
log "bench rough rc=$? $(cat RESULTS/r5/bench_rough.json)"

log "r5 tpu followup drained"
