#!/usr/bin/env bash
# Fires after multihost_sustained completes (or dies): runs the RUN_SLOW
# multi-process kill/resume test (ADVICE r4 medium: the code path needs a
# committed passing log) and then the RUN_SLOW 2-process equality demo,
# with the CPU core mostly free.
set -u
cd "$(dirname "$0")/.."
log() { echo "[r5after $(date -u +%H:%M:%S)] $*" | tee -a RESULTS/r5/after_multihost.log; }

# wait until the sustained runner exits (json written OR process gone)
MH_PID=$(cat RESULTS/r5/multihost_sustained.pid 2>/dev/null | awk '{print $2}')
while kill -0 "${MH_PID}" 2>/dev/null; do
  [ -e RESULTS/r5/multihost_sustained.json ] && break
  sleep 120
done
log "multihost runner finished (json: $(ls RESULTS/r5/multihost_sustained.json 2>/dev/null || echo absent))"

RUN_SLOW=1 timeout 5400 python -m pytest \
  "tests/test_multihost.py::test_multiprocess_kill_and_resume_bit_reproduces_curve" \
  -x -q > RESULTS/r5/pytest_multihost_killresume.log 2>&1
log "kill_and_resume rc=$? $(tail -1 RESULTS/r5/pytest_multihost_killresume.log)"

RUN_SLOW=1 timeout 5400 python -m pytest \
  "tests/test_multihost.py::test_multihost_two_process_equality" \
  -x -q > RESULTS/r5/pytest_multihost_equality.log 2>&1
log "two_process_equality rc=$? $(tail -1 RESULTS/r5/pytest_multihost_equality.log)"
log "after-multihost chain drained"
