#!/usr/bin/env bash
# Round-4 extra TPU jobs while the evidence chain's CPU leg runs:
#  - standing seed 1 (is the 7/8 push survival seed luck or recipe?)
#  - conditioned-clock flat seed 2 (third row of the bifurcation table)
set -u
cd "$(dirname "$0")/.."
log() { echo "[tpux $(date -u +%H:%M:%S)] $*" | tee -a RESULTS/r4/tpu_extra.log; }

log "standing_100m_seed1 start"
timeout 4000 python -m open_duck_playground_tpu.train.runner \
  --output_dir checkpoints/standing_100m_seed1 --auto_resume \
  --env standing --task flat_terrain \
  --num_timesteps 100000000 --num_envs 8192 --num_evals 5 --seed 1 \
  > RESULTS/r4/train_standing_100m_seed1.log 2>&1
log "standing_100m_seed1 rc=$?"

log "joystick_backlash_300m_clk_seed2 start"
timeout 5400 python -m open_duck_playground_tpu.train.runner \
  --output_dir checkpoints/joystick_backlash_300m_clk_seed2 --auto_resume \
  --env joystick --task flat_terrain_backlash \
  --num_timesteps 300000000 --num_envs 8192 --num_evals 8 --seed 2 \
  --phase_freq_vx_ref 0.094 --phase_freq_max 1.4 \
  > RESULTS/r4/train_joystick_backlash_300m_clk_seed2.log 2>&1
log "joystick_backlash_300m_clk_seed2 rc=$?"
log "tpu extra drained"
