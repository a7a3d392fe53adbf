#!/bin/bash
# Round-5 TPU measurement run. Launched against a DETACHED WORKTREE
# snapshot (.bench_snap) so edits to /root/repo cannot leak into later
# modes (CLAUDE.md benchmark runner discipline). One mode per process;
# exit codes echoed directly (never `timeout ... | tee`).
#
# Order: the VERDICT r4 items first —
#   1. verify fast/prod/proven: clean post-fix host rows + phase split +
#      device fused rows (tasks #4, #2, #1 verification).
#   2. fri proven: the ~120-proven-bit hardware row (task #2).
#   3. scaling fill: n=2^12 (chain 4), n=2^13 (chain 8), B=2 at n=2^14
#      (task #5).
#   4. aggregate at n=2^12 (chain 4, B=4) (task #5).
#   5. fri b16: the blowup-16 frontier point's device row (task #3).
set -u
SNAP=/root/repo/.bench_snap
LOG=/root/repo/tools/bench_r5_run.log
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
run 3000 verify 16 proven
run 5000 fri 8 1 proven
run 4500 fri 4 4
run 5000 fri 2 8
run 6000 fri 2 16
run 5000 aggregate 4 fast 4
run 4500 fri 8 1 b16
echo "ALL DONE [$(date -u +%H:%M:%S)]" >> "$LOG"
