#!/bin/bash
# Full CPU suite at HEAD, one pytest process per file (keeps each run inside
# any tool timeout and isolates contention), sequential.
LOG=/root/repo/scripts/logs_r4e/pytest_full.log
: > "$LOG"
cd /root/repo
PASS=0; FAIL=0
for f in tests/test_*.py; do
  echo "=== $f $(date +%H:%M:%S)" >> "$LOG"
  PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 python -m pytest "$f" -q >> "$LOG" 2>&1
  rc=$?
  echo "rc=$rc" >> "$LOG"
  if [ $rc -eq 0 ]; then PASS=$((PASS+1)); else FAIL=$((FAIL+1)); fi
done
echo "SUITE_DONE pass=$PASS fail=$FAIL" >> "$LOG"
