#!/usr/bin/env bash
# Rough conditioned-clock seed 1: seed evidence on the headline rough result.
set -u
cd "$(dirname "$0")/.."
log() { echo "[tpux2 $(date -u +%H:%M:%S)] $*" | tee -a RESULTS/r4/tpu_extra.log; }
log "joystick_rough_300m_clk_seed1 start"
timeout 5400 python -m open_duck_playground_tpu.train.runner \
  --output_dir checkpoints/joystick_rough_300m_clk_seed1 --auto_resume \
  --env joystick --task rough_terrain_backlash \
  --num_timesteps 300000000 --num_envs 8192 --num_evals 8 --seed 1 \
  --phase_freq_vx_ref 0.094 --phase_freq_max 1.4 \
  > RESULTS/r4/train_joystick_rough_300m_clk_seed1.log 2>&1
log "joystick_rough_300m_clk_seed1 rc=$?"
