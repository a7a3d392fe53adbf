#!/bin/bash
# Waits for the in-flight `fri 8 1` (pid $1), then runs aggregate 8 prod
# from the snapshot. Nothing follows — the CPU suite runs next.
set -u
cd /root/repo/.bench_snap
LOG=/root/repo/tools/bench_r4_runA.log
while kill -0 "$1" 2>/dev/null; do sleep 15; done
echo "=== bench.py aggregate 8 prod [$(date -u +%H:%M:%S)] ===" >> "$LOG"
PYTHONPATH=/root/repo/.bench_snap:/root/.axon_site timeout 5000 \
  python bench.py aggregate 8 prod >> "$LOG" 2>&1
echo "--- exit $? [$(date -u +%H:%M:%S)] (aggprod done)" >> "$LOG"
