#!/usr/bin/env bash
# Round-4 TPU queue (one real chip, runs sequential):
#   1. rough+backlash 300M with the command-conditioned gait clock
#      (VERDICT r3 #1: make the rough recipe pass the 70% gate at deploy
#      clock x1.0 — the law clip(|vx|/0.094, 1, 1.4) is trained in and
#      carried to deploy via ONNX metadata, so the gate needs no knob)
#   2-3. flat backlash 300M seeds 2, 3 (VERDICT r3 #5: finish the >=3-seed
#      table of the winning recipe; seeds 0, 1 completed in round 3)
#   4. flat backlash 300M with the same conditioned clock (VERDICT r3
#      weak #2: track >=70% across the commanded range at clock x1.0)
# All runs use --auto_resume: full train state is checkpointed per epoch,
# so a wiped/killed session continues curve-exactly (VERDICT r3 #4).
set -u
cd "$(dirname "$0")/.."
mkdir -p RESULTS/r4

run() {
  local name="$1"; shift
  if [ -e "checkpoints/${name}/DONE" ]; then
    echo "[queue] ${name}: already done, skipping"
    return 0
  fi
  echo "[queue] ${name}: starting $(date -u +%H:%M:%S)"
  JAX_PLATFORMS='' timeout 4200 python -m open_duck_playground_tpu.train.runner \
    --output_dir "checkpoints/${name}" --auto_resume "$@" \
    > "RESULTS/r4/train_${name}.log" 2>&1
  local rc=$?
  [ "${rc}" -eq 0 ] && touch "checkpoints/${name}/DONE"
  echo "[queue] ${name}: rc=${rc} $(date -u +%H:%M:%S)"
}

run joystick_rough_300m_clk \
  --env joystick --task rough_terrain_backlash \
  --num_timesteps 300000000 --num_envs 8192 --num_evals 15 --seed 0 \
  --phase_freq_vx_ref 0.094 --phase_freq_max 1.4

run joystick_backlash_300m_seed2 \
  --env joystick --task flat_terrain_backlash \
  --num_timesteps 300000000 --num_envs 8192 --num_evals 8 --seed 2

run joystick_backlash_300m_seed3 \
  --env joystick --task flat_terrain_backlash \
  --num_timesteps 300000000 --num_envs 8192 --num_evals 8 --seed 3

run joystick_backlash_300m_clk \
  --env joystick --task flat_terrain_backlash \
  --num_timesteps 300000000 --num_envs 8192 --num_evals 8 --seed 0 \
  --phase_freq_vx_ref 0.094 --phase_freq_max 1.4

echo "[queue] drained $(date -u +%H:%M:%S)"
