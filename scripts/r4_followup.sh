#!/usr/bin/env bash
# Round-4 follow-up: diagnose the flat-clk walk/stand bifurcation at low
# commands (sim2sim_flat_clk_vx0.05/0.10: stands; 0.12/0.15: passes).
#  - retrain the conditioned-clock flat recipe with seed 1 on the TPU as
#    soon as the evidence chain's bench phases release the tunnel
#  - sweep the OTHER conditioned-clock policy (rough) and the best plain
#    seed (seed3) across the command range, so the bifurcation can be
#    attributed to the recipe or to the seed
set -u
cd "$(dirname "$0")/.."
log() { echo "[followup $(date -u +%H:%M:%S)] $*" | tee -a RESULTS/r4/followup.log; }

# wait until the chain is past both bench phases (TPU idle again)
while ! grep -q "pytest start" RESULTS/r4/chain.log 2>/dev/null; do sleep 30; done
log "TPU free - starting flat clk seed1 retrain"

timeout 5400 python -m open_duck_playground_tpu.train.runner \
  --output_dir checkpoints/joystick_backlash_300m_clk_seed1 --auto_resume \
  --env joystick --task flat_terrain_backlash \
  --num_timesteps 300000000 --num_envs 8192 --num_evals 8 --seed 1 \
  --phase_freq_vx_ref 0.094 --phase_freq_max 1.4 \
  > RESULTS/r4/train_joystick_backlash_300m_clk_seed1.log 2>&1
log "retrain rc=$?"

# wait for the chain's pytest to release the CPU before the gate sweeps
while ! grep -q "multihost sustained start\|chain done" RESULTS/r4/chain.log 2>/dev/null; do sleep 30; done

latest_onnx() { ls -t "checkpoints/$1"/*.onnx 2>/dev/null | head -1; }
gate() {  # gate <label> <onnx> <vx>
  local label="$1" onnx="$2" vx="$3"
  [ -z "$onnx" ] && { log "$label: no onnx"; return; }
  timeout 2400 python scripts/sim2sim_check.py -o "$onnx" \
    --task flat_terrain_backlash --vx "$vx" \
    > "RESULTS/r4/sim2sim_${label}_vx${vx}.log" 2>&1
  log "gate ${label} vx=${vx} rc=$? $(grep -h '"pass"' RESULTS/r4/sim2sim_${label}_vx${vx}.log | tail -1)"
}

rough=$(latest_onnx joystick_rough_300m_clk)
seed3=$(latest_onnx joystick_backlash_300m_seed3)
clk1=$(latest_onnx joystick_backlash_300m_clk_seed1)
[ -n "$clk1" ] && cp "$clk1" RESULTS/r4/artifacts/joystick_backlash_300m_clk_seed1.onnx

for vx in 0.05 0.10 0.15; do gate rough_clk_flat "$rough" "$vx"; done
for vx in 0.05 0.10 0.15; do gate seed3 "$seed3" "$vx"; done
for vx in 0.05 0.10 0.12 0.15; do gate clk_seed1 "$clk1" "$vx"; done
log "followup done"
