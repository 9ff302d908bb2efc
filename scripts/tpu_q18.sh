#!/bin/bash
# Round-4 queue #18 — re-run of lost queue #17 (the /tmp wipe ate its
# log before it ever ran) plus pool dumps to a persistent location:
#  1. box nee+textured stage profile — measures the packed RGBA8 atlas
#     + static tex-slot specialization (commits db82c60, 57eb095).
#  2. outside stage profile + POOL DUMP (.pools/outside_pool.npz) —
#     fresh real bounce pools for the frustum/cluster-worklist probes.
#  3. cornell stage profile + POOL DUMP (.pools/cornell_pool.npz).
#  4. outside e2e — the trace+shade occupancy ladder at 75-86% occupancy.
#  5. full official bench — e2e + extras; warms the driver compile cache.
# Run on an idle host (no concurrent pytest) — CLAUDE.md host-load note.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/tests/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1.0
unset XLA_FLAGS AXON_LIBTPU_OVERRIDES LIBTPU_INIT_ARGS
LOG=/tmp/tpu_q18.log
echo "=== queue 18 start $(date -u +%H:%M:%S) ===" >> $LOG

echo "=== 1 box nee+textured profile $(date -u +%H:%M:%S) ===" >> $LOG
timeout 2400 python scripts/stage_profile.py --scene box --res 512 \
  --iters 8 --nee --textured >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 2 outside profile + dump $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3000 python scripts/stage_profile.py --scene outside --res 512 \
  --pool 262144 --iters 8 --dump /root/repo/.pools/outside_pool.npz \
  >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 3 cornell profile + dump $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3000 python scripts/stage_profile.py --iters 8 \
  --dump /root/repo/.pools/cornell_pool.npz >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 4 outside e2e $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/outside_e2e.py --samples 16 --res 512 \
  --pools 262144 >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 5 full bench $(date -u +%H:%M:%S) ===" >> $LOG
timeout 5400 python bench.py >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== QUEUE 18 DONE $(date -u +%H:%M:%S) ===" >> $LOG
