#!/bin/bash
# Queue #7: batched worklist loop A/B (kernel-level on real pools,
# then production e2e), after queue #6.
cd /root/repo
LOG=/tmp/tpu_q7.log
echo "=== queue start $(date -u +%H:%M:%S) ===" >> $LOG
for i in $(seq 1 240); do
  grep -q 'QUEUE DONE' /tmp/tpu_q6.log 2>/dev/null && break
  sleep 30
done

echo "=== 1 wl batch A/B (kernel) $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/compact_probe.py bench --tile 4096 --cap 128 \
  --variants wl,wlb2,wlb4,wlb8 --pool-npz /tmp/pool_r3.npz --skip-sweep \
  >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 2 production e2e batch A/B $(date -u +%H:%M:%S) ===" >> $LOG
timeout 5400 python scripts/cm_ab.py --res 1024 --samples 16 --reps 3 \
  --rounds 2 --ab compact_batch=4 >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG
echo "=== QUEUE DONE $(date -u +%H:%M:%S) ===" >> $LOG
