#!/usr/bin/env bash
# After gates3: the two cross-policy probes from the archived artifacts
# (the live checkpoints were lost to the container restart).
set -u
cd "$(dirname "$0")/.."
log() { echo "[gates4 $(date -u +%H:%M:%S)] $*" | tee -a RESULTS/r4/gates2.log; }
while ! grep -q "gates3 done" RESULTS/r4/gates2.log 2>/dev/null; do sleep 20; done
gate() {
  timeout 2400 python scripts/sim2sim_check.py -o "$2" \
    --task flat_terrain_backlash --vx "$3" \
    > "RESULTS/r4/sim2sim_$1_vx$3.log" 2>&1
  log "gate $1 vx=$3 rc=$? $(grep -h 'track_frac' RESULTS/r4/sim2sim_$1_vx$3.log | tail -2 | tr '\n' ' ')"
}
gate rough_clk_flat RESULTS/r4/artifacts/joystick_rough_300m_clk.onnx 0.10
gate seed3 RESULTS/r4/artifacts/joystick_backlash_300m_seed3.onnx 0.15
log "gates4 done"
