#!/bin/bash
# Chip-recovery watcher: tiny jit probe every 5 min, log result.
cd /root/repo
while true; do
  ts=$(date +%H:%M:%S)
  out=$(timeout 120 python scripts/logs_r4/chip_probe.py 2>&1 | tail -1)
  rc=$?
  echo "$ts rc=$rc $out" >> scripts/logs_r4b/chip_watch.log
  if [ $rc -eq 0 ]; then echo "$ts RECOVERED" >> scripts/logs_r4b/chip_watch.log; touch /tmp/chip_up; fi
  sleep 300
done
