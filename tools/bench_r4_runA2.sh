#!/bin/bash
# Sequel to bench_r4_runA.sh: waits for the in-flight `fri 8 1 prod`
# (pid $1) to finish, then runs the remaining Run-A modes from the
# .bench_snap worktree. Output appends straight to the log (no tee — the
# original script reported tee's exit status and hid a timeout kill).
set -u
cd /root/repo/.bench_snap
LOG=/root/repo/tools/bench_r4_runA.log
WAIT_PID=${1:-0}
if [ "$WAIT_PID" -gt 0 ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
run() {
  echo "=== bench.py ${*:2} [$(date -u +%H:%M:%S)] ===" >> "$LOG"
  PYTHONPATH=/root/repo/.bench_snap:/root/.axon_site timeout "$1" \
    python bench.py "${@:2}" >> "$LOG" 2>&1
  echo "--- exit $? [$(date -u +%H:%M:%S)]" >> "$LOG"
}

run 2400 perm
run 4500 fri 8 1
run 5000 aggregate 8 prod
# circuit-size scaling (fast preset): chains of 2/4/8/16 perms
run 4500 fri 4 2
run 5000 fri 4 4
run 5500 fri 2 8
run 6500 fri 2 16
run 4000 aggregate 8
echo "ALL DONE [$(date -u +%H:%M:%S)]" >> "$LOG"
