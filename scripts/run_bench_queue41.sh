#!/bin/bash
# Round-5 queue 41: re-baseline the b256 model-step attribution at the NEW
# default (ffn_shadow=1 n_ffn=1): skeleton (fetch floor), nogather, nolm.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r5/bench_queue41.log}
mkdir -p "$(dirname "$LOG")"
cd "$SNAP"
export PYTHONPATH=$SNAP:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
run() {
  name=$1; to=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  echo "=== $name rc=$? end $(date +%H:%M:%S) ===" >> "$LOG"
}
run model_default 2400 env BENCH_BATCH=256 BENCH_PART=model PROF_INT8=1 \
  python scripts/profile_decode_b128.py
run skeleton_shadow 2400 env BENCH_BATCH=256 BENCH_PART=model PROF_INT8=1 \
  VACNIC_KERNEL_SKELETON=1 python scripts/profile_decode_b128.py
run nogather_shadow 2400 env BENCH_BATCH=256 BENCH_PART=model PROF_INT8=1 \
  VACNIC_KERNEL_NOGATHER=1 python scripts/profile_decode_b128.py
echo ALL_DONE_QUEUE41 >> "$LOG"
