#!/bin/bash
# Round-4 queue #26: the shade row-feed form (cfg.shade_rows) —
# queue-25's shade split priced the gather-side transposes/slice
# materialization at ~3-4 ms/iter on cornell (gathers 9-10 standalone
# vs the ~5.5 ms per-row floor, rows ~3); ts_rows moves the [R, 64]
# rows into the kernel row-major and transposes per tile in VMEM.
#  1. Hardware bit-identity pytest (cornell, pallas shade both forms).
#  2. Cornell stage A/B: baseline vs --shade-rows, fresh process each.
#  3. Outside stage A/B: same.
# Decision: flip cfg.shade_rows default on a >=1.5 ms shade-stage win
# on cornell with non-regressing outside (expected: shade 14.5 ->
# ~11-12 cornell, 9 -> ~7.5 outside).
cd /root/repo
unset XLA_FLAGS AXON_LIBTPU_OVERRIDES
export JAX_COMPILATION_CACHE_DIR=/root/repo/tests/.jax_cache
LOG=/tmp/tpu_q26.log
echo "=== queue 26 start $(date -u +%H:%M:%S) ===" >> $LOG

echo "=== 1 shade_rows TPU bit-identity $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 env LPT_TPU_TESTS=1 python -m pytest tests/test_tpu.py \
  -m tpu -k shade_rows -q >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 2a cornell baseline $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/stage_profile.py --scene cornell --res 1024 \
  --iters 6 >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 2b cornell shade-rows $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/stage_profile.py --scene cornell --res 1024 \
  --iters 6 --shade-rows >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 3a outside baseline $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/stage_profile.py --scene outside --res 512 \
  --pool 262144 --iters 6 >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 3b outside shade-rows $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/stage_profile.py --scene outside --res 512 \
  --pool 262144 --iters 6 --shade-rows >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== QUEUE 26 DONE $(date -u +%H:%M:%S) ===" >> $LOG
