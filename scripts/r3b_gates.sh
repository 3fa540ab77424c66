#!/usr/bin/env bash
# Waits for each tpu_queue_r3b.sh recipe to finish, then runs its
# sim2sim acceptance gate on CPU and archives the final ONNX under
# RESULTS/r3/artifacts/ (checkpoints/ is wiped with the container).
set -u
cd "$(dirname "$0")/.."
mkdir -p RESULTS/r3/artifacts

wait_done() {
  local name="$1" budget="${2:-2700}" t=0
  while [ ! -e "checkpoints/${name}/DONE" ]; do
    sleep 30; t=$((t + 30))
    if [ "$t" -ge "$budget" ]; then echo "[gates] ${name}: timeout waiting"; return 1; fi
  done
  return 0
}

latest_onnx() { ls -t "checkpoints/$1"/*.onnx 2>/dev/null | head -1; }

if wait_done joystick_rough_300m; then
  onnx=$(latest_onnx joystick_rough_300m)
  if [ -z "$onnx" ]; then
    echo "[gates] rough 300m: no ONNX found, skipping gate"
  else
  cp "$onnx" RESULTS/r3/artifacts/joystick_rough_300m.onnx
  echo "[gates] rough 300m: $onnx"
  timeout 2400 python scripts/sim2sim_check.py -o "$onnx" \
    --task rough_terrain_backlash \
    > RESULTS/r3/sim2sim_rough_300m.log 2>&1
  echo "[gates] rough 300m (rough scene) rc=$?"
  timeout 2400 python scripts/sim2sim_check.py -o "$onnx" \
    --task flat_terrain_backlash \
    > RESULTS/r3/sim2sim_rough_300m_flat_scene.log 2>&1
  echo "[gates] rough 300m (flat scene) rc=$?"
  fi
fi

for seed in 1 2; do
  name="joystick_backlash_300m_seed${seed}"
  if wait_done "$name" 3600; then
    onnx=$(latest_onnx "$name")
    if [ -z "$onnx" ]; then
      echo "[gates] ${name}: no ONNX found, skipping gate"
      continue
    fi
    cp "$onnx" "RESULTS/r3/artifacts/${name}.onnx"
    timeout 2400 python scripts/sim2sim_check.py -o "$onnx" \
      --task flat_terrain_backlash \
      > "RESULTS/r3/sim2sim_300m_seed${seed}.log" 2>&1
    echo "[gates] ${name} rc=$?"
  fi
done
echo "[gates] all done $(date -u +%H:%M:%S)"
