#!/bin/bash
# Queue #5: real-program module stability (x2), skeleton-vs-tile floor
# tests, sort_every A/B, outside e2e with auto cluster 512, outside
# cluster 1024 probe.  Waits for queue #4.
cd /root/repo
LOG=/tmp/tpu_q5.log
echo "=== queue start $(date -u +%H:%M:%S) ===" >> $LOG
for i in $(seq 1 240); do
  grep -q 'QUEUE DONE' /tmp/tpu_q4.log 2>/dev/null && break
  sleep 30
done

echo "=== 1 wf module hash A/B $(date -u +%H:%M:%S) ===" >> $LOG
timeout 1800 python scripts/cachekey_probe2.py /tmp/wfmod_a.bin >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG
timeout 1800 python scripts/cachekey_probe2.py /tmp/wfmod_b.bin >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG
cmp -s /tmp/wfmod_a.bin /tmp/wfmod_b.bin && echo "WF MODULE IDENTICAL" >> $LOG \
  || echo "WF MODULE DIFFERS" >> $LOG

echo "=== 2 skeleton vs tile $(date -u +%H:%M:%S) ===" >> $LOG
timeout 4500 python scripts/compact_probe.py bench --tile 8192 --cap 128 \
  --variants wl,wl:floor0 --pool-npz /tmp/pool_r3.npz --skip-sweep \
  >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 3 sort_every=2 A/B $(date -u +%H:%M:%S) ===" >> $LOG
timeout 4500 python scripts/cm_ab.py --res 1024 --samples 16 --reps 3 \
  --rounds 2 --ab sort_every=2 >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 4 outside e2e auto-512 vs 256 $(date -u +%H:%M:%S) ===" >> $LOG
timeout 5400 python scripts/cm_ab.py --res 512 --samples 16 --reps 3 \
  --rounds 2 --scene outside --ab cluster_size=256 >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 5 outside cluster 1024 probe $(date -u +%H:%M:%S) ===" >> $LOG
timeout 4500 python scripts/worklist_probe.py --cluster 1024 --cap 32 \
  --wl-only >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG
echo "=== QUEUE DONE $(date -u +%H:%M:%S) ===" >> $LOG
