#!/usr/bin/env bash
# Post-pytest gate batch: conditioned-clock seed1 command sweep (the
# bifurcation diagnosis), standing seed-1 push battery, and two
# cross-policy probes (rough-clk at the bifurcation command, best plain
# seed at the ceiling command).
set -u
cd "$(dirname "$0")/.."
log() { echo "[gates2 $(date -u +%H:%M:%S)] $*" | tee -a RESULTS/r4/gates2.log; }

clk1=$(ls -t checkpoints/joystick_backlash_300m_clk_seed1/*.onnx | head -1)
stand1=$(ls -t checkpoints/standing_100m_seed1/*.onnx | head -1)
rough=$(ls -t checkpoints/joystick_rough_300m_clk/*.onnx 2>/dev/null | head -1)
seed3=$(ls -t checkpoints/joystick_backlash_300m_seed3/*.onnx 2>/dev/null | head -1)
mkdir -p RESULTS/r4/artifacts
cp "$clk1" RESULTS/r4/artifacts/joystick_backlash_300m_clk_seed1.onnx
cp "$stand1" RESULTS/r4/artifacts/standing_100m_seed1.onnx

gate() {  # gate <label> <onnx> <vx>
  timeout 2400 python scripts/sim2sim_check.py -o "$2" \
    --task flat_terrain_backlash --vx "$3" \
    > "RESULTS/r4/sim2sim_$1_vx$3.log" 2>&1
  log "gate $1 vx=$3 rc=$? $(grep -h 'track_frac' RESULTS/r4/sim2sim_$1_vx$3.log | tail -2 | tr '\n' ' ')"
}

for vx in 0.12 0.15 0.10 0.05; do gate clk_seed1 "$clk1" "$vx"; done

log "standing seed1 battery start"
timeout 3600 python scripts/sim2sim_check.py -o "$stand1" --standing \
  > RESULTS/r4/sim2sim_standing_seed1.log 2>&1
log "standing battery rc=$? $(tail -2 RESULTS/r4/sim2sim_standing_seed1.log | tr '\n' ' ')"

[ -n "$rough" ] && gate rough_clk_flat "$rough" 0.10
[ -n "$seed3" ] && gate seed3 "$seed3" 0.15
log "gates2 done"
