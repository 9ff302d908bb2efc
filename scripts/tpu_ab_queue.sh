#!/bin/bash
# Round-3 closing TPU queue: wait for the axon tunnel, then
#   1. pre-warm the driver bench (exact `python bench.py` invocation)
#   2. pool_cm A/B on the production renderer
#   3. MXU MT v2 A/B variants on dumped real pools
# Each step bounded; logs to /tmp/tpu_queue_r3.log.
cd /root/repo
LOG=/tmp/tpu_queue_r3.log
echo "=== queue start $(date -u +%H:%M:%S) ===" >> $LOG

# 1. Wait for the tunnel (tiny op, 150 s bound, retry every 5 min).
UP=0
for i in $(seq 1 72); do
  echo "--- probe $i $(date -u +%H:%M:%S)" >> $LOG
  timeout 150 python -c "import jax, jax.numpy as jnp; print(jnp.ones(8).sum())" >> $LOG 2>&1
  if [ $? -eq 0 ]; then echo "TUNNEL_UP $(date -u +%H:%M:%S)" >> $LOG; UP=1; break; fi
  sleep 300
done
[ $UP -eq 1 ] || { echo "TUNNEL_NEVER_UP" >> $LOG; exit 1; }

# 2. Pre-warm the driver bench: the exact invocation the driver runs.
echo "=== bench prewarm $(date -u +%H:%M:%S) ===" >> $LOG
timeout 5400 python bench.py >> $LOG 2>&1
echo "bench exit $? $(date -u +%H:%M:%S)" >> $LOG

# 3. pool_cm A/B on the production renderer (bench scale).
echo "=== cm_ab $(date -u +%H:%M:%S) ===" >> $LOG
timeout 4500 python scripts/cm_ab.py --res 1024 --samples 16 --reps 3 \
  --rounds 2 >> $LOG 2>&1
echo "cm_ab exit $? $(date -u +%H:%M:%S)" >> $LOG

# 4. MXU MT v2 A/B on dumped real pools (worklist variants).
echo "=== compact_probe wl variants $(date -u +%H:%M:%S) ===" >> $LOG
if [ -f /tmp/pool_r3.npz ]; then
  timeout 5400 python scripts/compact_probe.py bench --tile 4096 --cap 128 \
    --variants wl,wl:mxu,wl:upd2d --pool-npz /tmp/pool_r3.npz \
    --skip-sweep >> $LOG 2>&1
  echo "compact_probe exit $? $(date -u +%H:%M:%S)" >> $LOG
else
  echo "no dumped pool; skipping compact_probe" >> $LOG
fi
echo "=== queue done $(date -u +%H:%M:%S) ===" >> $LOG
