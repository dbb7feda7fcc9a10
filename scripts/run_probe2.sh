#!/bin/bash
# Queue 2: realbs lse/blockmax attribution + model-probe retries (longer
# timeouts for the slow remote-compile phase).
SNAP=${1:?snapshot dir}
LOG=/root/repo/scripts/logs_r3/probe2_b256.log
cd "$SNAP"
export PYTHONPATH=$SNAP:/root/.axon_site
run() {
  name=$1; to=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  echo "=== rc=$? end $(date +%H:%M:%S) ===" >> "$LOG"
}
BENCH_BATCH=256 BENCH_PART=loop_realbs VACNIC_BEAM_LOGIC=shortlist \
  run realbs_sl_base 570 python scripts/profile_decode_b128.py
BENCH_BATCH=256 BENCH_PART=loop_realbs VACNIC_BEAM_LOGIC=shortlist PROBE_NOLSE=1 \
  run realbs_sl_nolse 570 python scripts/profile_decode_b128.py
BENCH_BATCH=256 BENCH_PART=loop_realbs VACNIC_BEAM_LOGIC=shortlist VACNIC_BEAM_TOPK=blockmax \
  run realbs_sl_blockmax 570 python scripts/profile_decode_b128.py
PROF_INT8=1 BENCH_BATCH=256 BENCH_PART=model \
  run model_b256_retry 1140 python scripts/profile_decode_b128.py
PROF_INT8=1 BENCH_BATCH=256 BENCH_PART=model_nolm \
  run model_nolm_retry 1140 python scripts/profile_decode_b128.py
echo ALL_DONE_PROBE2 >> "$LOG"
