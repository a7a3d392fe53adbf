#!/bin/bash
# Round-4 Run B: modes exercising the NEW round-4 code (fused pooled
# verifier, batched-transcript prover) — run from /root/repo AFTER the
# CPU suite validates the changes. One mode per process; no tee (exit
# status must be the bench's own).
set -u
cd /root/repo
LOG=/root/repo/tools/bench_r4_runB.log
: > "$LOG"
run() {
  echo "=== bench.py ${*:2} [$(date -u +%H:%M:%S)] ===" >> "$LOG"
  PYTHONPATH=/root/repo:/root/.axon_site timeout "$1" \
    python bench.py "${@:2}" >> "$LOG" 2>&1
  echo "--- exit $? [$(date -u +%H:%M:%S)]" >> "$LOG"
}

run 4000 verify 16
run 4500 verify 16 prod
run 2400 plonk 16
run 2400 plonk 64
echo "ALL DONE [$(date -u +%H:%M:%S)]" >> "$LOG"
