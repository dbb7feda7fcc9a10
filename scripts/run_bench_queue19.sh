#!/bin/bash
# Round-4 queue 19: fused block-lse A/B at b256 (+ b64). One full-vocab
# block pass serves both the blockmax shortlist and the lse; equivalence
# pinned on CPU. If it wins, flip the default.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4/bench_queue19.log}
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
run bench_b256_blocklse 1500 env VACNIC_BLOCK_LSE=1 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b256_default 1500 env BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b64_blocklse 1500 env BENCH_BATCH=64 VACNIC_BLOCK_LSE=1 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
echo ALL_DONE_QUEUE19 >> "$LOG"
