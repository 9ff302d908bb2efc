#!/bin/bash
# Queue #11: full TPU-marked test suite (worklist tests now at
# tile=1024 — Mosaic rejects 1-D<->2-D reshapes below one (8,128)
# tile), then a fresh full bench to re-warm the driver cache on the
# current tree.
cd /root/repo
LOG=/tmp/tpu_q11.log
echo "=== queue start $(date -u +%H:%M:%S) ===" >> $LOG

echo "=== 1 full tpu-marked tests $(date -u +%H:%M:%S) ===" >> $LOG
LPT_TPU_TESTS=1 timeout 5400 python -m pytest tests/test_tpu.py -q \
  -m tpu >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 2 full bench $(date -u +%H:%M:%S) ===" >> $LOG
timeout 5400 python bench.py >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG
echo "=== QUEUE DONE $(date -u +%H:%M:%S) ===" >> $LOG
