#!/bin/bash
# Round-4 queue #23:
#  1. Full official bench on the current tree — verifies the queue-22
#     fix (scene SoA device-committed once per renderer session,
#     ac46ee7) end to end: expect the outside extra ~2.9 -> ~5 Mrays/s
#     (VERDICT r3 item-3 threshold) now that the ~150 MB per-step SoA
#     re-upload is gone.
#  2. loop_group A/B on the real progressive outside path (one process
#     per variant; queue-21 in-process contamination): the while cond
#     machinery is ~11 ms/iter (queue 22); G groups amortize it to
#     1/G at <= G-1 overshoot iterations.
#  3. cornell loop_group=4 regression guard (cond overhead there is
#     ~2-3 ms/iter; expect neutral-to-small-win).
cd /root/repo
unset XLA_FLAGS AXON_LIBTPU_OVERRIDES
export JAX_COMPILATION_CACHE_DIR=/root/repo/tests/.jax_cache
LOG=/tmp/tpu_q23.log
echo "=== queue 23 start $(date -u +%H:%M:%S) ===" >> $LOG

echo "=== 1 full bench $(date -u +%H:%M:%S) ===" >> $LOG
timeout 5400 python bench.py >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

for v in carryover loop_group2 loop_group4 loop_group8; do
  echo "=== 2 outside A $v $(date -u +%H:%M:%S) ===" >> $LOG
  timeout 3600 python scripts/prog_probe.py --parts A --scene outside \
    --variants $v >> $LOG 2>&1
  echo "exit $? $(date -u +%H:%M:%S)" >> $LOG
done

for v in carryover loop_group4; do
  echo "=== 3 cornell A $v $(date -u +%H:%M:%S) ===" >> $LOG
  timeout 3600 python scripts/prog_probe.py --parts A --scene cornell \
    --res 1024 --variants $v >> $LOG 2>&1
  echo "exit $? $(date -u +%H:%M:%S)" >> $LOG
done

echo "=== QUEUE 23 DONE $(date -u +%H:%M:%S) ===" >> $LOG
