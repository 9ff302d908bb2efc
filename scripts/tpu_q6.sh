#!/bin/bash
# Queue #6 (resumed round-3 session): outside e2e A/B for the
# cluster-size auto change, update-cost split on the worklist kernel,
# outside cluster-1024 probe, then a full bench (also warms the
# driver's cache).
cd /root/repo
LOG=/tmp/tpu_q6.log
echo "=== queue start $(date -u +%H:%M:%S) ===" >> $LOG

echo "=== 1 outside e2e auto-512 vs 256 $(date -u +%H:%M:%S) ===" >> $LOG
timeout 5400 python scripts/cm_ab.py --res 512 --samples 16 --reps 3 \
  --rounds 2 --scene outside --ab cluster_size=256 >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 2 wl update split (norank/nohot) $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/compact_probe.py bench --tile 4096 --cap 128 \
  --variants wl,wl:norank,wl:nohot,wl:noupd --pool-npz /tmp/pool_r3.npz \
  --skip-sweep >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 3 outside cluster 1024 probe $(date -u +%H:%M:%S) ===" >> $LOG
timeout 4500 python scripts/worklist_probe.py --cluster 1024 --cap 32 \
  --wl-only >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 4 full bench $(date -u +%H:%M:%S) ===" >> $LOG
timeout 5400 python bench.py >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG
echo "=== QUEUE DONE $(date -u +%H:%M:%S) ===" >> $LOG
