#!/bin/bash
# Round-4 queue #15:
#  1. hot16/presplit kernel-variant A/B on the real cornell pools
#     (CORRECT results, bit-compare-able; the confounded nohot/ksmall
#     ablations can't answer this).
#  2. Prepass (build_chunk_worklists) isolated cost — floor split.
#  3. box nee+textured stage re-profile after the round-4 shade levers
#     (static tex-slot specialization + any-hit shadow sweep).
#  4. cornell sort/shade split (q14's run collided with q14b; redo).
cd /root/repo
LOG=/tmp/tpu_q15.log
echo "=== queue 15 start $(date -u +%H:%M:%S) ===" >> $LOG

echo "=== 1 variant A/B $(date -u +%H:%M:%S) ===" >> $LOG
timeout 5400 python scripts/compact_probe.py bench --tile 4096 --cap 128 \
  --variants wl,wl+hot16,wl+presplit,wl+hot16+presplit \
  --pool-npz /tmp/pool_r3.npz --skip-sweep >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 2 prepass probe $(date -u +%H:%M:%S) ===" >> $LOG
timeout 1800 python scripts/prepass_probe.py >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 3 box nee+textured re-profile $(date -u +%H:%M:%S) ===" >> $LOG
timeout 2400 python scripts/stage_profile.py --scene box --res 512 \
  --iters 8 --nee --textured >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 4 cornell sort+shade split $(date -u +%H:%M:%S) ===" >> $LOG
timeout 2400 python scripts/stage_profile.py --res 1024 --iters 8 \
  --sort-split --shade-split >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== QUEUE 15 DONE $(date -u +%H:%M:%S) ===" >> $LOG
