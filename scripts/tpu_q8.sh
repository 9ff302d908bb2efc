#!/bin/bash
# Queue #8: resident cluster-size sweep on the worklist kernel (real
# pools; 384/512 never measured on the RESIDENT worklist form), then a
# stage profile validating the maintenance trims (pixid+flags packed
# sort column, p/16 + p/2 regen rungs).
cd /root/repo
LOG=/tmp/tpu_q8.log
echo "=== queue start $(date -u +%H:%M:%S) ===" >> $LOG

echo "=== 1 resident wl cluster 512 $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/compact_probe.py bench --tile 4096 --cap 128 \
  --cluster 512 --variants wl --pool-npz /tmp/pool_r3.npz --skip-sweep \
  >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 2 resident wl cluster 384 $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/compact_probe.py bench --tile 4096 --cap 128 \
  --cluster 384 --variants wl --pool-npz /tmp/pool_r3.npz --skip-sweep \
  >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 3 stage profile (maintenance trims) $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/stage_profile.py --iters 6 >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG
echo "=== QUEUE DONE $(date -u +%H:%M:%S) ===" >> $LOG
