#!/usr/bin/env bash
# Round-5b TPU chain (tunnel back after the 6h outage): serialized so the
# single tunnel chip never serves two clients at once.
#   1. wait for the already-running bench_flat3 (launched separately)
#   2. mfu_roofline --epoch  -> post-fix (atomic npz) full-state save cost
#      at recipe scale 8192 envs on the real chip (VERDICT r4 #6 re-measure)
#   3. bench.py rough        -> fresh round-5 rough number
set -u
cd "$(dirname "$0")/.."
log() { echo "[r5b $(date -u +%H:%M:%S)] $*" | tee -a RESULTS/r5/tpu_chain_b.log; }

BENCH_PID="${1:-}"
while [ -n "$BENCH_PID" ] && kill -0 "$BENCH_PID" 2>/dev/null; do
  sleep 20
done
log "bench flat3 done: $(cat RESULTS/r5/bench_flat3.json 2>/dev/null)"

JAX_PLATFORMS='' timeout 3000 python scripts/mfu_roofline.py --epoch \
  --out RESULTS/r5/mfu_epoch_npz.json > RESULTS/r5/mfu_epoch_npz.log 2>&1
log "mfu epoch npz rc=$? $(cat RESULTS/r5/mfu_epoch_npz.json 2>/dev/null)"

JAX_PLATFORMS='' timeout 2400 python bench.py --task rough_terrain_backlash \
  > RESULTS/r5/bench_rough3.json 2> RESULTS/r5/bench_rough3.log
log "bench rough3 rc=$? $(cat RESULTS/r5/bench_rough3.json 2>/dev/null)"

log "r5b chain drained"
