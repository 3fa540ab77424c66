#!/usr/bin/env bash
# Round-5 TPU queue (one real chip, sequential):
#   1. conditioned-clock flat 300M seed 0 WITH per-episode gait-clock
#      randomization (--phase_freq_range 0.8 1.3): VERDICT r4 #3 — the
#      recipe change meant to remove seed 0's walk/stand bifurcation at
#      cmd 0.10 by decoupling stride frequency from command (the policy
#      can no longer key speed off a fixed clock rate; it must track the
#      commanded velocity).
#   2. standing 100M seed 2 (VERDICT r4 #5: third row of the push-battery
#      seed table).
#   3-4. conditioned-clock+pfr seeds 1, 2 (complete the 3-seed table of
#      the NEW recipe).
# All runs --auto_resume (full train state per epoch): a wiped/killed
# session continues curve-exactly. Exported ONNX is archived to
# RESULTS/r5/artifacts immediately (container restarts wipe checkpoints/).
set -u
cd "$(dirname "$0")/.."
mkdir -p RESULTS/r5/artifacts

run() {
  local name="$1"; shift
  if [ -e "checkpoints/${name}/DONE" ]; then
    echo "[queue] ${name}: already done, skipping"
    return 0
  fi
  echo "[queue] ${name}: starting $(date -u +%H:%M:%S)"
  JAX_PLATFORMS='' timeout 5400 python -m open_duck_playground_tpu.train.runner \
    --output_dir "checkpoints/${name}" --auto_resume "$@" \
    > "RESULTS/r5/train_${name}.log" 2>&1
  local rc=$?
  if [ "${rc}" -ne 0 ]; then
    echo "[queue] ${name}: rc=${rc}, one auto-resume retry"
    JAX_PLATFORMS='' timeout 5400 python -m open_duck_playground_tpu.train.runner \
      --output_dir "checkpoints/${name}" --auto_resume "$@" \
      >> "RESULTS/r5/train_${name}.log" 2>&1
    rc=$?
  fi
  if [ "${rc}" -eq 0 ]; then
    touch "checkpoints/${name}/DONE"
    local last
    last=$(ls -t "checkpoints/${name}"/*.onnx 2>/dev/null | head -1)
    [ -n "${last}" ] && cp "${last}" "RESULTS/r5/artifacts/${name}.onnx"
  fi
  echo "[queue] ${name}: rc=${rc} $(date -u +%H:%M:%S)"
}

run joystick_backlash_300m_clk_pfr_seed0 \
  --env joystick --task flat_terrain_backlash \
  --num_timesteps 300000000 --num_envs 8192 --num_evals 8 --seed 0 \
  --phase_freq_vx_ref 0.094 --phase_freq_max 1.4 \
  --phase_freq_range 0.8 1.3

run standing_100m_seed2 \
  --env standing --task flat_terrain \
  --num_timesteps 100000000 --num_envs 8192 --num_evals 5 --seed 2

run joystick_backlash_300m_clk_pfr_seed1 \
  --env joystick --task flat_terrain_backlash \
  --num_timesteps 300000000 --num_envs 8192 --num_evals 8 --seed 1 \
  --phase_freq_vx_ref 0.094 --phase_freq_max 1.4 \
  --phase_freq_range 0.8 1.3

run joystick_backlash_300m_clk_pfr_seed2 \
  --env joystick --task flat_terrain_backlash \
  --num_timesteps 300000000 --num_envs 8192 --num_evals 8 --seed 2 \
  --phase_freq_vx_ref 0.094 --phase_freq_max 1.4 \
  --phase_freq_range 0.8 1.3

echo "[queue] drained $(date -u +%H:%M:%S)"
