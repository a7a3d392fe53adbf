#!/bin/bash
# Round-4 TPU measurement sequence. Each mode prints one JSON line;
# everything logs to tools/bench_r4.log. Run ONLY with no concurrent
# CPU pytest (1-core host, CLAUDE.md). Each process pays its own relay
# compiles (~75-135s per distinct executable), so modes run in one
# process each and the order puts the headline numbers first.
set -u
cd /root/repo
LOG=tools/bench_r4.log
: > "$LOG"
run() {
  echo "=== $* [$(date -u +%H:%M:%S)] ===" | tee -a "$LOG"
  PYTHONPATH=/root/repo:/root/.axon_site timeout "$1" python bench.py "${@:2}" 2>>"$LOG" | tee -a "$LOG"
  echo "--- exit $? [$(date -u +%H:%M:%S)]" | tee -a "$LOG"
}

run 1200 perm
run 4000 fri 8 1
run 2400 verify 16
run 4000 aggregate 8
run 5000 fri 8 1 prod
run 3000 verify 16 prod
run 2400 plonk 16
run 2400 plonk 64
# circuit-size scaling (fast preset): 2, 4, 8, 16 chained perms
run 4000 fri 4 2
run 4500 fri 4 4
run 5000 fri 2 8
run 6000 fri 2 16
run 4000 aggregate 8 prod
echo "ALL DONE [$(date -u +%H:%M:%S)]" | tee -a "$LOG"
