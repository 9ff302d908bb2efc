#!/bin/bash
# Queue #13: pair_tiles (wlt) A/B vs the serial worklist sweep on the
# real dumped pool workload.  Lever: two ray tiles per grid step with
# fully independent interleaved chains (own worklists, own best
# buffers) — the latency-overlap shape that avoids pair mode's
# stale-gate/shared-merge waste (queue #12 loss).
cd /root/repo
LOG=/tmp/tpu_q13.log
echo "=== queue start $(date -u +%H:%M:%S) ===" >> $LOG

echo "=== 1 pair_tiles A/B $(date -u +%H:%M:%S) ===" >> $LOG
timeout 2700 python scripts/compact_probe.py bench --tile 4096 --cap 128 \
  --variants wl,wlt --pool-npz /tmp/pool_r3.npz --skip-sweep \
  >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG
echo "=== QUEUE DONE $(date -u +%H:%M:%S) ===" >> $LOG
