#!/bin/bash
# Round-4 queue #22 — pin the while-loop overhead mechanism (prog_probe
# part C).  Queue 21 part B: the exact production body host-stepped
# runs outside's chunk at 39.4 ms/iter vs 72 inside the real
# lax.while_loop — ~30 ms/iter of loop machinery.  Part C wraps the
# SAME body three ways in fresh processes each:
#   host  — host-stepped groups of 8 + one next_work fetch per group
#           (the production-replacement candidate),
#   while — the exact production wavefront_chunk lax.while_loop,
#   fori  — static-trip lax.fori_loop (single program, no dynamic cond).
# Cornell while/host at 1024^2 decides whether the overhead is
# outside-specific (stage profile says cornell real == stage sum).
# Run on an idle host (no concurrent pytest) — CLAUDE.md host-load note.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/tests/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1.0
unset XLA_FLAGS AXON_LIBTPU_OVERRIDES LIBTPU_INIT_ARGS
LOG=/tmp/tpu_q22.log
echo "=== queue 22 start $(date -u +%H:%M:%S) ===" > $LOG

for L in while host fori; do
  echo "=== C outside loop=$L $(date -u +%H:%M:%S) ===" >> $LOG
  timeout 4200 python scripts/prog_probe.py --parts C --loop $L \
    --res 512 --samples 16 --reps 3 --fori-iters 40 >> $LOG 2>&1
  echo "exit $? $(date -u +%H:%M:%S)" >> $LOG
done

for L in while host; do
  echo "=== C cornell loop=$L $(date -u +%H:%M:%S) ===" >> $LOG
  timeout 4200 python scripts/prog_probe.py --parts C --loop $L \
    --scene cornell --res 1024 --samples 16 --reps 2 >> $LOG 2>&1
  echo "exit $? $(date -u +%H:%M:%S)" >> $LOG
done

echo "=== QUEUE 22 DONE $(date -u +%H:%M:%S) ===" >> $LOG
