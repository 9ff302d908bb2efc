#!/bin/bash
# Round-4 queue #19 — fresh container (pools + TPU compile cache wiped):
#  1. cornell stage profile + POOL DUMP — baseline re-establish + dump
#     for item 3 (fresh .pools/cornell_pool.npz).
#  2. outside stage profile + POOL DUMP (.pools/outside_pool.npz).
#  3. fruspre A/B on the real cornell pools: wl (per-ray prepass,
#     ~10-11 ms of the isect wall) vs wl+fruspre (per-tile frustum
#     mask, O(tiles x C)); bit-identity pinned on CPU interpret
#     (tests/test_compact.py::test_compact_variants_bit_identical).
#  4. production cornell profile WITH --fruspre (end-to-end stage
#     split delta vs item 1).
#  5. box nee+textured shade SUB-split (tex prologue vs fused kernel vs
#     shadow sweep) — the config-5 attack map (shade 79.7 of 125.2 ms).
#  6. cluster-granular stream worklist A/B on the fresh outside dump.
#  7. full official bench — numbers + warms the driver compile cache.
# Run on an idle host (no concurrent pytest) — CLAUDE.md host-load note.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/tests/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1.0
unset XLA_FLAGS AXON_LIBTPU_OVERRIDES LIBTPU_INIT_ARGS
LOG=/tmp/tpu_q19.log
echo "=== queue 19 start $(date -u +%H:%M:%S) ===" >> $LOG

echo "=== 1 cornell profile + dump $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3000 python scripts/stage_profile.py --iters 8 \
  --dump /root/repo/.pools/cornell_pool.npz >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 2 outside profile + dump $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3000 python scripts/stage_profile.py --scene outside --res 512 \
  --pool 262144 --iters 8 --dump /root/repo/.pools/outside_pool.npz \
  >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 3 fruspre A/B on cornell pools $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3000 python scripts/compact_probe.py bench --tile 4096 --cap 128 \
  --variants wl,wl+fruspre --pool-npz /root/repo/.pools/cornell_pool.npz \
  >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 4 cornell profile --fruspre $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3000 python scripts/stage_profile.py --iters 8 --fruspre \
  >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 5 box nee+textured shade split $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/stage_profile.py --scene box --res 512 \
  --iters 8 --nee --textured --shade-split >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 6 cluster-granular stream A/B $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/cluster_wl_probe.py \
  --pool /root/repo/.pools/outside_pool.npz >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 7 full bench $(date -u +%H:%M:%S) ===" >> $LOG
timeout 5400 python bench.py >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== QUEUE 19 DONE $(date -u +%H:%M:%S) ===" >> $LOG
