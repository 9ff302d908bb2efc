#!/bin/bash
# Queue #9: outside-class stream (chunk, cap) sweep at the new
# cluster-512 auto default (worklist stream kernel).  Waits for #8.
cd /root/repo
LOG=/tmp/tpu_q9.log
echo "=== queue start $(date -u +%H:%M:%S) ===" >> $LOG
for i in $(seq 1 240); do
  grep -q 'QUEUE DONE' /tmp/tpu_q8.log 2>/dev/null && break
  sleep 30
done

for spec in "8 32" "32 32" "16 64" "16 16"; do
  set -- $spec
  echo "=== chunk $1 cap $2 $(date -u +%H:%M:%S) ===" >> $LOG
  timeout 2700 python scripts/worklist_probe.py --cluster 512 \
    --chunk $1 --cap $2 --wl-only >> $LOG 2>&1
  echo "exit $? $(date -u +%H:%M:%S)" >> $LOG
done
echo "=== QUEUE DONE $(date -u +%H:%M:%S) ===" >> $LOG
