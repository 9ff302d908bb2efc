#!/bin/bash
# Round-4 queue #20 — quad-atlas + cluster-granular-default measurements:
#  1. box nee+textured shade split: quad atlas effect (q19 baseline:
#     shade 79.5 of 123.4 ms/iter -> 8.49 Mrays/s-iter; textures were
#     +46 ms, ~3/4 of it the four 1-col corner gathers the quad path
#     collapses into one 4-col row gather).
#  2. outside stage profile with the NEW cluster-granular stream
#     default (q19 baseline: 47.5 ms/iter, isect 36.4 = 77%).
#  3. outside e2e anatomy (real-loop occupancy + per-iter cost — the
#     2.26 e2e vs 5.52 iter gap decomposition) with the new default.
#  4. cornell stage profile — regression guard (resident path should
#     be untouched by both changes).
#  5. full official bench — new extras + keeps the driver cache warm.
# Run on an idle host (no concurrent pytest) — CLAUDE.md host-load note.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/tests/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1.0
unset XLA_FLAGS AXON_LIBTPU_OVERRIDES LIBTPU_INIT_ARGS
LOG=/tmp/tpu_q20.log
echo "=== queue 20 start $(date -u +%H:%M:%S) ===" >> $LOG

echo "=== 1 box nee+textured shade split (quad atlas) $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/stage_profile.py --scene box --res 512 \
  --iters 8 --nee --textured --shade-split >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 2 outside profile (cluster-granular default) $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3000 python scripts/stage_profile.py --scene outside --res 512 \
  --pool 262144 --iters 8 >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 3 outside e2e anatomy $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/outside_e2e.py --samples 16 --res 512 \
  --pools 262144 >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 4 cornell profile (regression guard) $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3000 python scripts/stage_profile.py --iters 8 >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 5 full bench $(date -u +%H:%M:%S) ===" >> $LOG
timeout 5400 python bench.py >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== QUEUE 20 DONE $(date -u +%H:%M:%S) ===" >> $LOG
