#!/bin/bash
# Retry the n=2^14 scaling row with the chunked-DEEP fix (the unchunked
# composition OOM'd 18.6G > 15.75G HBM at B=2). Waits for the in-flight
# fri 2 8 (pid $1).
set -u
cd /root/repo
LOG=/root/repo/tools/bench_r4_scaling.log
while kill -0 "$1" 2>/dev/null; do sleep 15; done
echo "=== bench.py fri 2 16 (chunked-DEEP retry) [$(date -u +%H:%M:%S)] ===" >> "$LOG"
PYTHONPATH=/root/repo:/root/.axon_site timeout 7500 \
  python bench.py fri 2 16 >> "$LOG" 2>&1
echo "--- exit $? [$(date -u +%H:%M:%S)] (chain16 retry done)" >> "$LOG"
