#!/bin/bash
# Round-4 queue #25 (follows queue 24: submask LOST everywhere ->
# default stays off; loop_group decision recorded from q24 items 3-4):
#  1. Cornell shade-stage decomposition (--shade-split): the 14.5
#     ms/iter shade stage is the largest non-isect stage; the
#     shade-table row gather was measured at ~5.5 ms (shade_gather_
#     probe) — split the rest between the row-pack transposes and the
#     Pallas kernel before attacking either.
#  2. Stream tile sweep on the cluster-granular worklist (the NEW
#     production outside kernel): tile 4096 was inherited from the
#     chunk-era sweeps; smaller tiles shrink the per-visit O(tile)
#     rank/one-hot machinery AND tighten the per-tile fired-cluster
#     union toward per-ray truth (frustum_stats: exact 148-236/tile
#     vs 217-323 visited at 4096).  Mosaic floor is tile=1024.
#  3. Outside shade-split for the same decomposition at stream scale.
cd /root/repo
unset XLA_FLAGS AXON_LIBTPU_OVERRIDES
export JAX_COMPILATION_CACHE_DIR=/root/repo/tests/.jax_cache
LOG=/tmp/tpu_q25.log
echo "=== queue 25 start $(date -u +%H:%M:%S) ===" >> $LOG

echo "=== 1 cornell shade-split $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/stage_profile.py --scene cornell --res 1024 \
  --iters 6 --shade-split >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

for t in 2048 1024; do
  echo "=== 2 stream tile $t $(date -u +%H:%M:%S) ===" >> $LOG
  timeout 2400 python scripts/cluster_wl_probe.py --tile $t >> $LOG 2>&1
  echo "exit $? $(date -u +%H:%M:%S)" >> $LOG
done

echo "=== 3 outside shade-split $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/stage_profile.py --scene outside --res 512 \
  --pool 262144 --iters 6 --shade-split >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== QUEUE 25 DONE $(date -u +%H:%M:%S) ===" >> $LOG
