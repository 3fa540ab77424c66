#!/usr/bin/env bash
# Walking gates on the JUDGE scene (both engines well-posed on rough
# ground): the strongest second-engine rough evidence — a policy that
# walks on an hfield in real MuJoCo C.
set -u
cd "$(dirname "$0")/.."
log() { echo "[gates6 $(date -u +%H:%M:%S)] $*" | tee -a RESULTS/r4/gates2.log; }
while ! grep -q "gates5 done" RESULTS/r4/gates2.log 2>/dev/null; do sleep 20; done
for name in joystick_rough_300m_clk joystick_rough_300m_clk_seed1; do
  onnx="RESULTS/r4/artifacts/${name}.onnx"
  [ -e "$onnx" ] || { log "skip $name: no artifact"; continue; }
  timeout 2400 python scripts/sim2sim_check.py -o "$onnx" \
    --task rough_judge_backlash \
    > "RESULTS/r4/sim2sim_${name}_judge.log" 2>&1
  log "gate $name judge rc=$? $(grep -h 'track_frac' RESULTS/r4/sim2sim_${name}_judge.log | tail -2 | tr '\n' ' ')"
done
log "gates6 done"
