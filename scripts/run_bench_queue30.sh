#!/bin/bash
# Round-5 queue 30: serve fill-to-stable A/B at 40 rps (queue28 baseline:
# open_loop_p50 2181 ms, bucket 32 unused) + int8 model-step pair for the
# ffn_shadow lever (queue29 ran the bf16 pair; production default is int8
# cross-KV). Chains on queue29's ALL_DONE.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r5/bench_queue30.log}
PREV=${3:-/root/repo/scripts/logs_r5/bench_queue29.log}
mkdir -p "$(dirname "$LOG")"
for i in $(seq 1 240); do
  grep -q ALL_DONE_QUEUE29 "$PREV" 2>/dev/null && break
  sleep 30
done
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
# 1. serve fill-to-stable ON at 40 rps (programs cached from queue28)
run serve_fill_on 3000 env SERVE_BUCKETS=1,8,32 SERVE_WAIT=20 SERVE_RATE=40 \
  SERVE_N=192 SERVE_FILL=1 python scripts/bench_serve.py
# 2. control: fill OFF, same window (the queue28 defer-only policy)
run serve_fill_off 3000 env SERVE_BUCKETS=1,8,32 SERVE_WAIT=20 SERVE_RATE=40 \
  SERVE_N=192 SERVE_FILL=0 python scripts/bench_serve.py
# 3. higher load: fill ON at 80 rps (capacity test; 32-bucket must engage)
run serve_fill_80 3000 env SERVE_BUCKETS=1,8,32 SERVE_WAIT=20 SERVE_RATE=80 \
  SERVE_N=256 SERVE_FILL=1 python scripts/bench_serve.py
# 4. int8 model-step pair (production cross-KV dtype) for ffn_shadow
run model_shadow_i8 2400 env BENCH_BATCH=256 BENCH_PART=model PROF_INT8=1 \
  VACNIC_PLAN_FFNSHADOW=1 python scripts/profile_decode_b128.py
run model_base_i8 2400 env BENCH_BATCH=256 BENCH_PART=model PROF_INT8=1 \
  python scripts/profile_decode_b128.py
echo ALL_DONE_QUEUE30 >> "$LOG"
