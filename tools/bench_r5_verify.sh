#!/bin/bash
# Round-5 verify measurement: u16-upload fused phase, fast + prod presets.
LOG=/root/repo/tools/bench_r5_verify.log
SNAP=/root/repo/.bench_snap
export PYTHONPATH=$SNAP:/root/.axon_site
echo "=== bench.py verify 16 [$(date +%H:%M:%S)] ===" >> $LOG
cd $SNAP && timeout 2400 python bench.py verify 16 >> $LOG 2>&1
echo "exit=$? [$(date +%H:%M:%S)]" >> $LOG
echo "=== bench.py verify 16 prod [$(date +%H:%M:%S)] ===" >> $LOG
timeout 2400 python bench.py verify 16 prod >> $LOG 2>&1
echo "exit=$? [$(date +%H:%M:%S)]" >> $LOG
echo "DONE" >> $LOG
