#!/bin/bash
# Round-4 queue #14: measurement session driving the round's design.
#  1. Ablation split of the PRODUCTION worklist resident kernel on the
#     real dumped cornell pools — where the per-fired-cluster update
#     cost really goes at the current design point (one-hot build?
#     big-K matmuls? MT? rank chain?).
#  2. NEE+textured decomposition (VERDICT r3 weak 3 / do-this 4): the
#     box-scene stage profile at 512^2 in the 4 nee x textured configs.
cd /root/repo
LOG=/tmp/tpu_q14.log
echo "=== queue start $(date -u +%H:%M:%S) ===" >> $LOG

echo "=== 1 worklist ablation split $(date -u +%H:%M:%S) ===" >> $LOG
timeout 5400 python scripts/compact_probe.py bench --tile 4096 --cap 128 \
  --variants wl,wl:floor0,wl:noupd,wl:nohot,wl:ksmall,wl:nomt,wl:norank \
  --pool-npz /tmp/pool_r3.npz --skip-sweep >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 2a box plain $(date -u +%H:%M:%S) ===" >> $LOG
timeout 2400 python scripts/stage_profile.py --scene box --res 512 \
  --iters 8 >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 2b box nee $(date -u +%H:%M:%S) ===" >> $LOG
timeout 2400 python scripts/stage_profile.py --scene box --res 512 \
  --iters 8 --nee >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 2c box textured $(date -u +%H:%M:%S) ===" >> $LOG
timeout 2400 python scripts/stage_profile.py --scene box --res 512 \
  --iters 8 --textured >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 2d box nee+textured $(date -u +%H:%M:%S) ===" >> $LOG
timeout 2400 python scripts/stage_profile.py --scene box --res 512 \
  --iters 8 --nee --textured >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== QUEUE DONE $(date -u +%H:%M:%S) ===" >> $LOG
