#!/bin/bash
# Round-4 queue #16:
#  1. presplit A/B on the real cornell pools (q15's run died on the
#     hot16 compile error before measuring it).
#  2. cap sweep on the resident worklist kernel at tile 4096 — cap 64
#     and 32 shrink the [cap, tile] one-hot build and the MT block
#     padding (median fired cluster has ~20 passing lanes); never
#     measured on the worklist form.  Risk: cap-64 shapes compiled
#     pathologically at tile=1024 round 3 — each variant is separately
#     time-bounded so a >25-min compile kills only its own item.
cd /root/repo
LOG=/tmp/tpu_q16.log
echo "=== queue 16 start $(date -u +%H:%M:%S) ===" >> $LOG

echo "=== 1 presplit A/B $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/compact_probe.py bench --tile 4096 --cap 128 \
  --variants wl,wl+presplit \
  --pool-npz /tmp/pool_r3.npz --skip-sweep >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 2 cap 64 $(date -u +%H:%M:%S) ===" >> $LOG
timeout 2100 python scripts/compact_probe.py bench --tile 4096 --cap 128 \
  --variants wl,wl@64 \
  --pool-npz /tmp/pool_r3.npz --skip-sweep >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 3 cap 32 $(date -u +%H:%M:%S) ===" >> $LOG
timeout 2100 python scripts/compact_probe.py bench --tile 4096 --cap 128 \
  --variants wl,wl@32 \
  --pool-npz /tmp/pool_r3.npz --skip-sweep >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== QUEUE 16 DONE $(date -u +%H:%M:%S) ===" >> $LOG
