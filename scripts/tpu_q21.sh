#!/bin/bash
# Round-4 queue #21 — outside progressive-path regression attribution:
#  1. prog_probe part A: ProgressiveRenderer.step(16) on outside in a
#     FRESH process, three variants (production default / no carryover
#     / chunk-granularity).  The q20 bench extra measured 0.789 Mrays/s
#     in-process while the direct path ran 2.75; bench.py's round-3
#     note says the in-process depression was 0.78 vs 1.9-2.1 fresh —
#     variant 1 decides regression vs in-process contamination.
#  2. prog_probe part B: the production wavefront body jitted as a
#     step function, amortized groups of 8 — the true per-iteration
#     cost of the exact production computation (72 ms/iter real loop
#     vs 48.2 isolated stage sum).
# Run on an idle host (no concurrent pytest) — CLAUDE.md host-load note.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/tests/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1.0
unset XLA_FLAGS AXON_LIBTPU_OVERRIDES LIBTPU_INIT_ARGS
LOG=/tmp/tpu_q21.log
echo "=== queue 21 start $(date -u +%H:%M:%S) ===" > $LOG

echo "=== 1 prog_probe A (progressive variants, fresh process) $(date -u +%H:%M:%S) ===" >> $LOG
timeout 4200 python scripts/prog_probe.py --parts A --res 512 \
  --samples 16 --reps 3 >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 2 prog_probe B (production body step timing) $(date -u +%H:%M:%S) ===" >> $LOG
timeout 4200 python scripts/prog_probe.py --parts B --res 512 \
  --samples 16 >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== QUEUE 21 DONE $(date -u +%H:%M:%S) ===" >> $LOG
