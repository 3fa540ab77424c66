#!/usr/bin/env bash
# Continuation of r4_gates.sh after a session restart: the rough_clk and
# seed2 gates already ran (RESULTS/r4/sim2sim_rough_clk*.log,
# sim2sim_300m_seed2.log); this picks up seed3 and the conditioned-clock
# flat command sweep. Same contract: default deploy clock, no --phase_freq.
set -u
cd "$(dirname "$0")/.."
mkdir -p RESULTS/r4/artifacts

wait_done() {
  local name="$1" budget="${2:-4500}" t=0
  while [ ! -e "checkpoints/${name}/DONE" ]; do
    sleep 30; t=$((t + 30))
    if [ "$t" -ge "$budget" ]; then echo "[gates] ${name}: timeout waiting"; return 1; fi
  done
  return 0
}

latest_onnx() { ls -t "checkpoints/$1"/*.onnx 2>/dev/null | head -1; }

gate() {  # gate <name> <onnx> <task> <log> [extra args...]
  local name="$1" onnx="$2" task="$3" log="$4"; shift 4
  if [ -z "$onnx" ]; then
    echo "[gates] ${name}: no ONNX found, skipping gate"
    return 1
  fi
  timeout 2400 python scripts/sim2sim_check.py -o "$onnx" --task "$task" "$@" \
    > "$log" 2>&1
  echo "[gates] ${name} (${task} $*) rc=$?"
}

name=joystick_backlash_300m_seed3
if wait_done "$name" 600; then
  onnx=$(latest_onnx "$name")
  [ -n "$onnx" ] && cp "$onnx" "RESULTS/r4/artifacts/${name}.onnx"
  gate "$name" "$onnx" flat_terrain_backlash RESULTS/r4/sim2sim_300m_seed3.log
fi

if wait_done joystick_backlash_300m_clk 14000; then
  onnx=$(latest_onnx joystick_backlash_300m_clk)
  [ -n "$onnx" ] && cp "$onnx" RESULTS/r4/artifacts/joystick_backlash_300m_clk.onnx
  # command-range sweep (VERDICT r3 weak #2): >=70% tracking at every
  # commanded speed, default clock
  for vx in 0.05 0.10 0.12 0.15; do
    gate flat_clk "$onnx" flat_terrain_backlash \
      "RESULTS/r4/sim2sim_flat_clk_vx${vx}.log" --vx "$vx"
  done
fi
echo "[gates] resume done $(date -u +%H:%M:%S)"
