#!/bin/bash
# Round-4 queue 1 (chip healthy at 12:15): lm_stats smoke, stats-vs-default
# A/B at b256, b512 probe, b64 stats A/B, compile-cache experiment.
#
# NOTE: env assignments go through `env` on the command, never `VAR=1 run`:
# bash keeps assignments that precede a FUNCTION call in the shell env,
# which contaminated later queue entries in run_bench_queue3.sh.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4/bench_queue4.log}
cd "$SNAP"
export PYTHONPATH=$SNAP:/root/.axon_site
# experiment: persistent compilation cache (if the axon PJRT plugin supports
# executable serialization this makes re-runs compile-free; harmless if not)
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
mkdir -p /root/repo/.jax_cache
run() {
  name=$1; to=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  echo "=== $name rc=$? end $(date +%H:%M:%S) ===" >> "$LOG"
}
run smoke_lm_stats 570 python scripts/smoke_lm_stats.py
run bench_b256_stats 1140 env VACNIC_LM_STATS=1 BENCH_LATENCY=0 python bench.py
run bench_b256_default 1140 env BENCH_LATENCY=0 python bench.py
echo "cache entries after default: $(ls /root/repo/.jax_cache 2>/dev/null | wc -l)" >> "$LOG"
# compile-cache A/B: identical program immediately re-run; if the plugin
# honors the cache, warmup wall time collapses vs the first run
run bench_b256_default_cached 1140 env BENCH_LATENCY=0 python bench.py
run bench_b512 1140 env BENCH_BATCH=512 BENCH_LATENCY=0 python bench.py
run bench_b64_stats 1140 env VACNIC_LM_STATS=1 VACNIC_PLAN_NLM=0 BENCH_BATCH=64 BENCH_LATENCY=0 python bench.py
echo ALL_DONE_QUEUE4 >> "$LOG"
