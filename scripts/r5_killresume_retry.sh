#!/usr/bin/env bash
# Re-run the RUN_SLOW kill/resume test (now 2x1-device workers) after the
# equality demo finishes, so it gets the core share it needs.
set -u
cd "$(dirname "$0")/.."
log() { echo "[krretry $(date -u +%H:%M:%S)] $*" | tee -a RESULTS/r5/after_multihost.log; }
while pgrep -f multihost_cpu_demo > /dev/null 2>&1; do sleep 60; done
log "equality demo done; retrying kill_and_resume with 2x1 workers"
RUN_SLOW=1 timeout 5400 nice -n 5 python -m pytest \
  "tests/test_multihost.py::test_multiprocess_kill_and_resume_bit_reproduces_curve" \
  -x -q > RESULTS/r5/pytest_multihost_killresume2.log 2>&1
log "kill_and_resume retry rc=$? $(tail -1 RESULTS/r5/pytest_multihost_killresume2.log)"
