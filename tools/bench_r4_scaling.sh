#!/bin/bash
# Round-4 circuit-size scaling rows (VERDICT r3 item 3): chained perms
# give n = 2^11 (chain 2), 2^14 (chain 16), 2^13 (chain 8). The 2^14 row
# runs second so the table's endpoint lands even if the day runs short.
# Runs from /root/repo (code frozen during the run — doc edits only).
set -u
cd /root/repo
LOG=/root/repo/tools/bench_r4_scaling.log
: > "$LOG"
run() {
  echo "=== bench.py ${*:2} [$(date -u +%H:%M:%S)] ===" >> "$LOG"
  PYTHONPATH=/root/repo:/root/.axon_site timeout "$1" \
    python bench.py "${@:2}" >> "$LOG" 2>&1
  echo "--- exit $? [$(date -u +%H:%M:%S)]" >> "$LOG"
}

run 4500 fri 4 2
run 7000 fri 2 16
run 5500 fri 2 8
echo "ALL DONE [$(date -u +%H:%M:%S)]" >> "$LOG"
