#!/bin/bash
# Round-5 TPU measurement run 2 (snapshot @ c56b76a, best-of-3 single
# verify in place): clean verify rows on an otherwise-idle host, and a
# clean re-run of the n=2^14 scaling mode (run 1's device figure was
# contended by an operator CPU job — PERF.md footnote).
set -u
SNAP=/root/repo/.bench_snap
LOG=/root/repo/tools/bench_r5_run2.log
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
run 6000 fri 2 16
echo "ALL DONE [$(date -u +%H:%M:%S)]" >> "$LOG"
