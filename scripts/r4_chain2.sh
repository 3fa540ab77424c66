#!/usr/bin/env bash
# Round-4 chain restart (the previous session's container restart killed the
# chain after "bench rough start"). TPU jobs serialized; CPU jobs overlap the
# TPU-bound retrain, whose host side is idle between epoch dispatches.
set -u
cd "$(dirname "$0")/.."
mkdir -p RESULTS/r4
log() { echo "[chain2 $(date -u +%H:%M:%S)] $*" | tee -a RESULTS/r4/chain2.log; }

log "bench rough start"
timeout 3600 python bench.py --task rough_terrain_backlash \
  > RESULTS/r4/bench_rough.json 2> RESULTS/r4/bench_rough.log
log "bench rough rc=$? $(cat RESULTS/r4/bench_rough.json 2>/dev/null)"

log "bench flat start"
timeout 3600 python bench.py > RESULTS/r4/bench_flat.json 2> RESULTS/r4/bench_flat.log
log "bench flat rc=$? $(cat RESULTS/r4/bench_flat.json 2>/dev/null)"

# CPU leg in the background while the TPU retrain runs
(
  log "pytest start"
  timeout 7200 python -m pytest tests/ -q > RESULTS/r4/pytest_r4.log 2>&1
  log "pytest rc=$? $(tail -1 RESULTS/r4/pytest_r4.log)"
  log "multihost sustained start"
  timeout 10000 python scripts/multihost_sustained.py \
    > RESULTS/r4/multihost_sustained.log 2>&1
  log "multihost sustained rc=$? $(grep -E '^\{' RESULTS/r4/multihost_sustained.log | tail -1)"
) &
CPU_PID=$!

log "flat clk seed1 retrain start"
timeout 5400 python -m open_duck_playground_tpu.train.runner \
  --output_dir checkpoints/joystick_backlash_300m_clk_seed1 --auto_resume \
  --env joystick --task flat_terrain_backlash \
  --num_timesteps 300000000 --num_envs 8192 --num_evals 8 --seed 1 \
  --phase_freq_vx_ref 0.094 --phase_freq_max 1.4 \
  > RESULTS/r4/train_joystick_backlash_300m_clk_seed1.log 2>&1
log "retrain rc=$?"

wait "$CPU_PID"
log "cpu leg joined"

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
log "chain2 done"
