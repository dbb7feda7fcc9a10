#!/bin/bash
# Round-4b queue 21: per-row int8 self-KV scales. (1) trained quality gate
# (the per-(L,t,H) predecessor FAILED it 0.9115 < 0.9583 — this is the
# decision point); (2) on-chip kernel smoke/parity for the new 4D scale
# blocks + ancestry scale-gather matmul; (3) paired b256 A/B vs default,
# interleaved to share the chip phase.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4b/bench_queue21.log}
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
run gate_selfkv_int8 1200 python scripts/gate_selfkv_int8.py
run parity_selfkv_int8 1200 env VACNIC_SELFKV_INT8=1 VACNIC_INT8_SUB8=1 \
  python scripts/parity_selfkv_int8.py
run bench_b256_int8self_1 1500 env VACNIC_SELFKV_INT8=1 VACNIC_INT8_SUB8=1 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b256_default_1 1500 env BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b256_int8self_2 1500 env VACNIC_SELFKV_INT8=1 VACNIC_INT8_SUB8=1 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b256_default_2 1500 env BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
echo ALL_DONE_QUEUE21 >> "$LOG"
