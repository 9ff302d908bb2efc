#!/bin/bash
# Queue #12: paired-interleave compaction chains (pair mode) A/B vs
# the serial worklist sweep, on the real dumped pool workload.  The
# round-4 latency-wall lever: two independent slab->rank->one-hot->
# gather->MT->scatter dataflows emitted in ONE straight-line block
# body so the VLIW scheduler can overlap their ~2-4 us dependent
# latencies (the failed `batch` unroll kept one region per cluster).
cd /root/repo
LOG=/tmp/tpu_q12.log
echo "=== queue start $(date -u +%H:%M:%S) ===" >> $LOG

echo "=== 1 pair A/B $(date -u +%H:%M:%S) ===" >> $LOG
timeout 2700 python scripts/compact_probe.py bench --tile 4096 --cap 128 \
  --variants wl,wlp --pool-npz /tmp/pool_r3.npz --skip-sweep \
  >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG
echo "=== QUEUE DONE $(date -u +%H:%M:%S) ===" >> $LOG
