#!/usr/bin/env bash
# TPU training queue: every recipe that needs live hardware, in priority
# order, so a revived tunnel can burn straight through the backlog.
# Each run writes its log under RESULTS/r3/ and its checkpoints + ONNX
# under checkpoints/<name>/. Safe to re-run: finished runs are skipped by
# the presence of their final ONNX.
#
# Recipes (BASELINE.md configs):
#   1. joystick flat_terrain_backlash 300M x 8192 envs  (winning recipe, #5)
#   2. standing flat_terrain 20M x 2048 envs            (second task)
#   3. joystick rough_terrain_backlash 150M x 8192 envs (config #4)
#   4. seed-variance: joystick backlash 60M x 3 seeds   (VERDICT r2 #8)
set -u
cd "$(dirname "$0")/.."
mkdir -p RESULTS/r3

run() {
  local name="$1"; shift
  if [ -e "checkpoints/${name}/DONE" ]; then
    echo "[standby] ${name}: already done, skipping"
    return 0
  fi
  echo "[standby] ${name}: starting $(date -u +%H:%M:%S)"
  JAX_PLATFORMS='' python -m open_duck_playground_tpu.train.runner \
    --output_dir "checkpoints/${name}" "$@" \
    > "RESULTS/r3/train_${name}.log" 2>&1
  local rc=$?
  [ "${rc}" -eq 0 ] && touch "checkpoints/${name}/DONE"
  echo "[standby] ${name}: rc=${rc} $(date -u +%H:%M:%S)"
}

run joystick_backlash_300m_r3 \
  --env joystick --task flat_terrain_backlash \
  --num_timesteps 300000000 --num_envs 8192 --num_evals 15 --seed 0

run standing_tpu_20m \
  --env standing --task flat_terrain \
  --num_timesteps 20000000 --num_envs 2048 --num_evals 10 --seed 0

run joystick_rough_150m \
  --env joystick --task rough_terrain_backlash \
  --num_timesteps 150000000 --num_envs 8192 --num_evals 10 --seed 0

for seed in 1 2 3; do
  run "joystick_backlash_60m_seed${seed}" \
    --env joystick --task flat_terrain_backlash \
    --num_timesteps 60000000 --num_envs 8192 --num_evals 5 --seed "${seed}"
done

echo "[standby] queue drained"
