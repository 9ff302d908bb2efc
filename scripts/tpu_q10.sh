#!/bin/bash
# Queue #10: per-cluster sub-compaction (block_sub) for the worklist
# stream kernel — hardware hit-exactness, then A/B vs the per-cluster
# worklist form on the outside-class scene at cluster 512.
cd /root/repo
LOG=/tmp/tpu_q10.log
echo "=== queue start $(date -u +%H:%M:%S) ===" >> $LOG

echo "=== 1 block kernel hardware tests $(date -u +%H:%M:%S) ===" >> $LOG
LPT_TPU_TESTS=1 timeout 3600 python -m pytest tests/test_tpu.py -q \
  -m tpu -k worklist >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 2 block 256 sub 32 A/B $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/worklist_probe.py --cluster 512 --cap 32 \
  --block 256 --block-sub 32 >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 3 block 128 sub 32 A/B $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/worklist_probe.py --cluster 512 --cap 32 \
  --block 128 --block-sub 32 >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG
echo "=== QUEUE DONE $(date -u +%H:%M:%S) ===" >> $LOG
