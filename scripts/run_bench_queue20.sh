#!/bin/bash
# Round-4 queue 20: int8 self-KV cache. (1) Mosaic window/gather legality
# probes; (2) paired b256 A/B vs default in the same window (interleaved);
# (3) quality gate on the trained gate params.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4b/bench_queue20.log}
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
run int8win_probe 1200 python scripts/mosaic_probe_int8win.py all
# paired A/B, interleaved to share the chip phase
run bench_b256_int8self_1 1500 env VACNIC_SELFKV_INT8=1 VACNIC_INT8_SUB8=1 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b256_default_1 1500 env BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b256_int8self_2 1500 env VACNIC_SELFKV_INT8=1 VACNIC_INT8_SUB8=1 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b256_default_2 1500 env BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run gate_selfkv_int8 1200 python scripts/gate_selfkv_int8.py
echo ALL_DONE_QUEUE20 >> "$LOG"
