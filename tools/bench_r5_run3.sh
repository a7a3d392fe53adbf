#!/bin/bash
# Round-5 TPU measurement run 3 (snapshot @ c56b76a — bench/library code
# unchanged since): clean best-of-3 verify rows for the PROVEN preset
# (the round-5 table's remaining starred row), then a default-mode
# sanity pass so the end-of-round driver bench is known-good.
set -u
SNAP=/root/repo/.bench_snap
LOG=/root/repo/tools/bench_r5_run3.log
: > "$LOG"
cd "$SNAP" || exit 1
run() {
  echo "=== bench.py ${*:2} [$(date -u +%H:%M:%S)] ===" >> "$LOG"
  PYTHONPATH=$SNAP:/root/.axon_site timeout "$1" \
    python bench.py "${@:2}" >> "$LOG" 2>&1
  echo "--- exit $? [$(date -u +%H:%M:%S)]" >> "$LOG"
}

run 3600 verify 16 proven
run 1800
echo "ALL DONE [$(date -u +%H:%M:%S)]" >> "$LOG"
