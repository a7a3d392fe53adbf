#!/bin/bash
# Round-5 TPU measurement run 5 (snapshot @ a683c20): verify rows with
# the IFMA engine + cached root-power tables + admission-point
# validation in place; all three presets, best-of-3, idle host.
set -u
SNAP=/root/repo/.bench_snap
LOG=/root/repo/tools/bench_r5_run5.log
: > "$LOG"
cd "$SNAP" || exit 1
run() {
  echo "=== bench.py ${*:2} [$(date -u +%H:%M:%S)] ===" >> "$LOG"
  PYTHONPATH=$SNAP:/root/.axon_site timeout "$1" \
    python bench.py "${@:2}" >> "$LOG" 2>&1
  echo "--- exit $? [$(date -u +%H:%M:%S)]" >> "$LOG"
}
run 2400 verify 16
run 2400 verify 16 prod
run 2400 verify 16 proven
echo "ALL DONE [$(date -u +%H:%M:%S)]" >> "$LOG"
