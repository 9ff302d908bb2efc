#!/bin/bash
# Round-4 queue #24 (fresh container; /tmp + caches wiped, queue-23
# loop_group results lost before recording):
#  1. Re-dump the real production pools (.pools was wiped) — every
#     kernel A/B probe replays these.
#  2. Sub-AABB submask A/B on the cluster-granular stream kernel
#     (cl vs cl+sm, hit-identity checked): the staged round-4 lever —
#     prepass-side per-(tile, cluster) 4-bit submask gating each
#     128-lane MT sub-group (ROADMAP session 3: ~21-23% of outside MT
#     skippable at tile granularity).
#  3. loop_group A/B on the real progressive outside path (queue-23
#     items 2-3, lost to the container reset): the while cond machinery
#     is ~11 ms/iter on outside (queue 22); G grouped body trips
#     amortize it to 1/G at <= G-1 overshoot iterations.
#  4. cornell loop_group=4 regression guard.
cd /root/repo
unset XLA_FLAGS AXON_LIBTPU_OVERRIDES
export JAX_COMPILATION_CACHE_DIR=/root/repo/tests/.jax_cache
LOG=/tmp/tpu_q24.log
mkdir -p .pools
echo "=== queue 24 start $(date -u +%H:%M:%S) ===" >> $LOG

echo "=== 1a dump outside pool $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/stage_profile.py --scene outside --res 512 \
  --pool 262144 --iters 8 --dump .pools/outside_pool.npz >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 1b dump cornell pool $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/stage_profile.py --scene cornell --res 1024 \
  --iters 8 --dump .pools/cornell_pool.npz >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 2 submask A/B $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/cluster_wl_probe.py --submask >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 2b submask TPU bit-identity $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 env LPT_TPU_TESTS=1 python -m pytest tests/test_tpu.py \
  -m tpu -k submask -q >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

for v in carryover loop_group2 loop_group4 loop_group8; do
  echo "=== 3 outside A $v $(date -u +%H:%M:%S) ===" >> $LOG
  timeout 3600 python scripts/prog_probe.py --parts A --scene outside \
    --variants $v >> $LOG 2>&1
  echo "exit $? $(date -u +%H:%M:%S)" >> $LOG
done

for v in carryover loop_group4; do
  echo "=== 4 cornell A $v $(date -u +%H:%M:%S) ===" >> $LOG
  timeout 3600 python scripts/prog_probe.py --parts A --scene cornell \
    --res 1024 --variants $v >> $LOG 2>&1
  echo "exit $? $(date -u +%H:%M:%S)" >> $LOG
done

echo "=== QUEUE 24 DONE $(date -u +%H:%M:%S) ===" >> $LOG
