#!/usr/bin/env bash
# Waits for gates2 to drain, then: clk_seed2 at the bifurcation commands.
set -u
cd "$(dirname "$0")/.."
log() { echo "[gates3 $(date -u +%H:%M:%S)] $*" | tee -a RESULTS/r4/gates2.log; }
while ! grep -q "gates2 done" RESULTS/r4/gates2.log 2>/dev/null; do sleep 20; done
clk2=$(ls -t checkpoints/joystick_backlash_300m_clk_seed2/*.onnx | head -1)
cp "$clk2" RESULTS/r4/artifacts/joystick_backlash_300m_clk_seed2.onnx
for vx in 0.10 0.05; do
  timeout 2400 python scripts/sim2sim_check.py -o "$clk2" \
    --task flat_terrain_backlash --vx "$vx" \
    > "RESULTS/r4/sim2sim_clk_seed2_vx$vx.log" 2>&1
  log "gate clk_seed2 vx=$vx rc=$? $(grep -h 'track_frac' RESULTS/r4/sim2sim_clk_seed2_vx$vx.log | tail -2 | tr '\n' ' ')"
done
log "gates3 done"
