#!/usr/bin/env bash
# Rough conditioned-clock seed 1: own-engine rough gate + real-MuJoCo flat
# cross-check (same pair the headline rough result used).
set -u
cd "$(dirname "$0")/.."
log() { echo "[gates5 $(date -u +%H:%M:%S)] $*" | tee -a RESULTS/r4/gates2.log; }
while ! grep -q "gates4 done" RESULTS/r4/gates2.log 2>/dev/null; do sleep 20; done
onnx=$(ls -t checkpoints/joystick_rough_300m_clk_seed1/*.onnx | head -1)
cp "$onnx" RESULTS/r4/artifacts/joystick_rough_300m_clk_seed1.onnx
for task in rough_terrain_backlash flat_terrain_backlash; do
  timeout 2400 python scripts/sim2sim_check.py -o "$onnx" --task "$task" \
    > "RESULTS/r4/sim2sim_rough_clk_seed1_${task}.log" 2>&1
  log "gate rough_clk_seed1 $task rc=$? $(grep -h 'track_frac' RESULTS/r4/sim2sim_rough_clk_seed1_${task}.log | tail -2 | tr '\n' ' ')"
done
log "gates5 done"
