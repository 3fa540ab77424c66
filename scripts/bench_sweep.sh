#!/usr/bin/env bash
# Throughput sweep over the BASELINE.json config ladder (#1-#4), one JSON
# line per config, using bench.py's scanned-rollout methodology:
#   #1 flat,  64 envs, no DR     #2 flat, 1024 envs, no DR
#   #3 flat, 4096 envs, full DR  #4 rough+backlash, 8192 envs, full DR
# Usage: bench_sweep.sh [--wait-for <checkpoints/NAME/DONE>]
set -u
cd "$(dirname "$0")/.."
mkdir -p RESULTS/r3

if [ "${1:-}" = "--wait-for" ]; then
  if [ "$#" -lt 2 ]; then
    echo "[sweep] --wait-for requires a path argument" >&2; exit 2
  fi
  t=0
  while [ ! -e "$2" ]; do
    sleep 30; t=$((t + 30))
    [ "$t" -ge 3600 ] && { echo "[sweep] timeout waiting for $2"; break; }
  done
fi

out=RESULTS/r3/bench_sweep.jsonl
: > "$out"
run() { timeout 1200 python bench.py "$@" >> "$out" 2>RESULTS/r3/bench_sweep_last.err; }

run --num_envs 64   --no_dr
run --num_envs 1024 --no_dr
run --num_envs 4096
run --num_envs 8192 --task rough_terrain_backlash
echo "[sweep] done $(date -u +%H:%M:%S)"
cat "$out"
