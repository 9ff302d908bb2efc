#!/bin/bash
# Queue #4: floor split, cache-key diagnosis (x2 processes), flush
# kernel A/B + hardware test.  Waits for queue #3 to finish.
cd /root/repo
LOG=/tmp/tpu_q4.log
echo "=== queue start $(date -u +%H:%M:%S) ===" >> $LOG
for i in $(seq 1 240); do
  grep -q 'QUEUE DONE' /tmp/tpu_q3.log 2>/dev/null && break
  sleep 30
done

echo "=== 1 floor probe $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/floor_probe.py >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 2 cachekey run A $(date -u +%H:%M:%S) ===" >> $LOG
timeout 1800 python scripts/cachekey_probe.py > /tmp/cachekey_a.log 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG
echo "=== 2 cachekey run B $(date -u +%H:%M:%S) ===" >> $LOG
timeout 1800 python scripts/cachekey_probe.py > /tmp/cachekey_b.log 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG
diff /tmp/cachekey_a.log /tmp/cachekey_b.log > /tmp/cachekey_diff.log 2>&1
echo "cachekey diff lines: $(wc -l < /tmp/cachekey_diff.log)" >> $LOG

echo "=== 3 flush hardware test $(date -u +%H:%M:%S) ===" >> $LOG
LPT_TPU_TESTS=1 timeout 3600 python -m pytest tests/test_tpu.py -q \
  -m tpu -k flush >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG

echo "=== 4 stage profile (new flush) $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/stage_profile.py --iters 6 >> $LOG 2>&1
echo "exit $? $(date -u +%H:%M:%S)" >> $LOG
echo "=== QUEUE DONE $(date -u +%H:%M:%S) ===" >> $LOG
