#!/bin/bash
# In-situ REAL beam_search cost per candidate mode at b256 (and optional b128).
# Usage: bash scripts/run_realbs_probe.sh /tmp/r3snapN
# ONE TPU process at a time; full logs; ALL_DONE marker.
SNAP=${1:?snapshot dir}
LOG=/root/repo/scripts/logs_r3/realbs_probe_b256.log
cd "$SNAP"
export PYTHONPATH=$SNAP:/root/.axon_site
for mode in full opt shortlist; do
  echo "=== realbs $mode b256 start $(date +%H:%M:%S) ===" >> "$LOG"
  BENCH_BATCH=256 BENCH_PART=loop_realbs VACNIC_BEAM_LOGIC=$mode timeout 570 \
    python scripts/profile_decode_b128.py >> "$LOG" 2>&1
  echo "=== realbs $mode rc=$? end $(date +%H:%M:%S) ===" >> "$LOG"
done
echo ALL_DONE_REALBS_PROBE >> "$LOG"
