#!/bin/bash
# Round-3 resumed-session TPU queue #3: decomposition probes for the
# two remaining walls (cornell resident isect 35.4 ms/Mray, outside
# stream isect 51.3 ms/262k) + the sort-stage split.
# Waits for the in-flight bench.py warm check to finish first.
cd /root/repo
LOG=/tmp/tpu_q3.log
echo "=== queue start $(date -u +%H:%M:%S) ===" >> $LOG

# 0. Wait for the bench warm-check to write its JSON line (one
#    exclusive TPU chip: never overlap processes).
for i in $(seq 1 90); do
  grep -q '"metric"' /tmp/bench_warm_check.log 2>/dev/null && break
  sleep 30
done
grep -q '"metric"' /tmp/bench_warm_check.log 2>/dev/null \
  || echo "WARN: bench never finished; proceeding" >> $LOG

# 1. Resident-kernel cost split on the CURRENT production kernel
#    (worklist + roll + fast recip), dumped real cornell pools.
echo "=== 1 compact ablations $(date -u +%H:%M:%S) ===" >> $LOG
timeout 5400 python scripts/compact_probe.py bench --tile 4096 --cap 128 \
  --variants wl,wl:floor0,wl:noupd,wl:noskip,wl:nofill,wl:ksmall,wl:nomt \
  --pool-npz /tmp/pool_r3.npz --skip-sweep >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

# 2. Sort-stage split (key vs sortkv vs gather) + shade split on the
#    evolving cornell pool.
echo "=== 2 sort/shade split $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/stage_profile.py --iters 6 --sort-split \
  --shade-split --no-sort-variadic >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

# 3. Outside stream: cluster_size 512 vs 256 (launch-bound updates
#    amortize over bigger clusters), per-cluster worklist kernel,
#    production stream_cap=32.
echo "=== 3 outside cluster 512 $(date -u +%H:%M:%S) ===" >> $LOG
timeout 5400 python scripts/worklist_probe.py --cluster 512 --cap 32 \
  --wl-only >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG
echo "=== 3b outside cluster 256 baseline $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/worklist_probe.py --cluster 256 --cap 32 \
  --wl-only >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG
echo "=== QUEUE DONE $(date -u +%H:%M:%S) ===" >> $LOG
