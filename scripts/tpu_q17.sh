#!/bin/bash
# Round-4 queue #17 (after the occupancy ladder + packed u32 atlas
# landed, commit 57eb095):
#  1. box nee+textured stage profile — the packed atlas should cut the
#     base_color tap's gather share of the shade stage ~4x.
#  2. outside e2e — the trace+shade occupancy ladder fires at the
#     75-86% occupancies this workload runs at.
#  3. full official bench — e2e cornell with the ladder + all extras
#     (also warms the driver's compile cache for the new jit graphs).
# Run on an idle host (no concurrent pytest) — CLAUDE.md host-load note.
cd /root/repo
LOG=/tmp/tpu_q17.log
echo "=== queue 17 start $(date -u +%H:%M:%S) ===" >> $LOG

echo "=== 1 box nee+textured profile $(date -u +%H:%M:%S) ===" >> $LOG
timeout 2400 python scripts/stage_profile.py --scene box --res 512 \
  --iters 8 --nee --textured >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 2 outside e2e $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/outside_e2e.py --samples 16 --res 512 \
  --pools 262144 >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 3 full bench $(date -u +%H:%M:%S) ===" >> $LOG
timeout 5400 python bench.py >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== QUEUE 17 DONE $(date -u +%H:%M:%S) ===" >> $LOG
