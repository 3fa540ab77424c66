#!/usr/bin/env bash
# Second-session round-3 TPU queue. The container was wiped between
# sessions (checkpoints/ gone; git-tracked ONNX in RESULTS/r3/artifacts
# survive), so everything here trains from scratch.
#   1. rough_terrain_backlash 300M (the 150M run failed sim2sim; flat
#      results show walking emerges between reward ~250 and ~290, i.e.
#      past 150M on this recipe — train to the winning-recipe length)
#   2-3. seed-variance at the winning recipe scale: 300M seeds 1,2
#      (seed 0 = joystick_backlash_300m_r3, reward 288, mujoco 80.4%)
set -u
cd "$(dirname "$0")/.."
mkdir -p RESULTS/r3

run() {
  local name="$1"; shift
  if [ -e "checkpoints/${name}/DONE" ]; then
    echo "[queue] ${name}: already done, skipping"
    return 0
  fi
  echo "[queue] ${name}: starting $(date -u +%H:%M:%S)"
  JAX_PLATFORMS='' timeout 2400 python -m open_duck_playground_tpu.train.runner \
    --output_dir "checkpoints/${name}" "$@" \
    > "RESULTS/r3/train_${name}.log" 2>&1
  local rc=$?
  [ "${rc}" -eq 0 ] && touch "checkpoints/${name}/DONE"
  echo "[queue] ${name}: rc=${rc} $(date -u +%H:%M:%S)"
}

run joystick_rough_300m \
  --env joystick --task rough_terrain_backlash \
  --num_timesteps 300000000 --num_envs 8192 --num_evals 15 --seed 0

run joystick_backlash_300m_seed1 \
  --env joystick --task flat_terrain_backlash \
  --num_timesteps 300000000 --num_envs 8192 --num_evals 8 --seed 1

run joystick_backlash_300m_seed2 \
  --env joystick --task flat_terrain_backlash \
  --num_timesteps 300000000 --num_envs 8192 --num_evals 8 --seed 2

echo "[queue] drained $(date -u +%H:%M:%S)"
