#!/bin/bash
# Round-4 TPU measurement Run A: modes whose code is frozen at HEAD
# (07e71b9), run from the .bench_snap worktree so concurrent edits to
# /root/repo cannot leak into later modes. verify/plonk run later (Run B)
# after the prover_tpu transcript backport + single-verify work.
# One mode per process (each pays its own relay compiles); headline and
# item-3 production numbers first, scaling table last.
set -u
cd /root/repo/.bench_snap
LOG=/root/repo/tools/bench_r4_runA.log
: > "$LOG"
run() {
  echo "=== bench.py ${*:2} [$(date -u +%H:%M:%S)] ===" | tee -a "$LOG"
  PYTHONPATH=/root/repo/.bench_snap:/root/.axon_site timeout "$1" \
    python bench.py "${@:2}" 2>>"$LOG" | tee -a "$LOG"
  echo "--- exit $? [$(date -u +%H:%M:%S)]" | tee -a "$LOG"
}

run 1200 perm
run 5000 fri 8 1 prod
run 4000 fri 8 1
run 4500 aggregate 8 prod
run 4000 aggregate 8
# circuit-size scaling (fast preset): chains of 2/4/8/16 perms
run 4000 fri 4 2
run 4500 fri 4 4
run 5000 fri 2 8
run 6000 fri 2 16
echo "ALL DONE [$(date -u +%H:%M:%S)]" | tee -a "$LOG"
