#!/bin/bash
# Round-5 TPU measurement run 4 (snapshot @ 5572d4c): verify rows with
# the AVX-512 IFMA batch-8 host engine in place (the host merkle phase
# runs ~3.4x faster hashing), all three presets, best-of-3, idle host.
set -u
SNAP=/root/repo/.bench_snap
LOG=/root/repo/tools/bench_r5_run4.log
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
