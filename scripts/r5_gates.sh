#!/usr/bin/env bash
# Round-5 sim2sim gate chain (VERDICT r4 #3/#5). Runs at nice 19 so the
# concurrently-running multihost_sustained keeps the single CPU core;
# waits for each training artifact before gating it.
#   - clk+pfr seeds 0/1/2: full command range 0.05-0.15, both engines
#   - clk seed 2 (round-4 artifact): the missing 0.12/0.15 rows of the
#     round-4 conditioned-clock table
#   - standing seed 2: 8-direction 0.6 m/s push battery
set -u
cd "$(dirname "$0")/.."
mkdir -p RESULTS/r5
log() { echo "[r5gates $(date -u +%H:%M:%S)] $*" | tee -a RESULTS/r5/gates.log; }

wait_art() { # wait_art <path> <timeout_s>
  local t=0
  while [ ! -e "$1" ]; do
    sleep 60; t=$((t+60))
    [ "$t" -ge "$2" ] && { log "TIMEOUT waiting for $1"; return 1; }
  done
  return 0
}

sweep() { # sweep <name> <onnx> <vx...>
  local name="$1" onnx="$2"; shift 2
  for vx in "$@"; do
    local out="RESULTS/r5/sim2sim_${name}_vx${vx}.log"
    if grep -q '"pass"' "$out" 2>/dev/null; then
      log "skip ${name} vx=${vx}: already gated"; continue
    fi
    nice -n 19 timeout 3600 python scripts/sim2sim_check.py -o "$onnx" \
      --task flat_terrain_backlash --vx "$vx" > "$out" 2>&1
    log "gate ${name} vx=${vx} rc=$? $(grep -h 'track_frac' "$out" | tail -2 | tr '\n' ' ')"
  done
}

# 1. round-4 clk seed2: finish its table rows first (artifact exists)
sweep clk_seed2 RESULTS/r4/artifacts/joystick_backlash_300m_clk_seed2.onnx 0.12 0.15

# 2. clk+pfr seed 0 (the bifurcation-fix check: does seed 0 now walk at 0.10?)
if wait_art RESULTS/r5/artifacts/joystick_backlash_300m_clk_pfr_seed0.onnx 600; then
  sweep clk_pfr_seed0 RESULTS/r5/artifacts/joystick_backlash_300m_clk_pfr_seed0.onnx \
    0.10 0.12 0.15 0.05
fi

# 3. standing seed 2 push battery
if wait_art RESULTS/r5/artifacts/standing_100m_seed2.onnx 7200; then
  out=RESULTS/r5/sim2sim_standing_seed2.log
  nice -n 19 timeout 3600 python scripts/sim2sim_check.py \
    -o RESULTS/r5/artifacts/standing_100m_seed2.onnx \
    --task flat_terrain --standing > "$out" 2>&1
  log "gate standing_seed2 rc=$? $(grep -h 'survival_frac' "$out" | tail -2 | tr '\n' ' ')"
fi

# 4-5. clk+pfr seeds 1, 2
for s in 1 2; do
  if wait_art "RESULTS/r5/artifacts/joystick_backlash_300m_clk_pfr_seed${s}.onnx" 14400; then
    sweep "clk_pfr_seed${s}" \
      "RESULTS/r5/artifacts/joystick_backlash_300m_clk_pfr_seed${s}.onnx" \
      0.10 0.12 0.15 0.05
  fi
done
log "r5 gates drained"
