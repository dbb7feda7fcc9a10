#!/bin/bash
# Round-4 queue 6 (VERDICT r3 next #5/#6 + lm_stats A/B completion):
#   1-5. model-step attribution at b256 (base / nogather / nocrosssm /
#        noselfsm / nolm) — the 16.4 ms vs ~11.6 floor question.
#   6.   b64 DEFAULT bench (A/B against queue5's b64+lm_stats 154.6).
#   7.   b512 retry with finer FFN/cross chunks (queue5 OOM'd by 9.66M of
#        double-buffered weight windows; NFFN=4 + NCROSS=128 save ~16M).
#   8.   b256 default confirm at this HEAD.
# Run from a git-archive snapshot; one TPU process at a time.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4/bench_queue6.log}
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
run probe_model_base 1140 env PROF_INT8=1 BENCH_BATCH=256 BENCH_PART=model python scripts/profile_decode_b128.py
run probe_model_nogather 1140 env PROF_INT8=1 BENCH_BATCH=256 BENCH_PART=model VACNIC_KERNEL_NOGATHER=1 python scripts/profile_decode_b128.py
run probe_model_nocrosssm 1140 env PROF_INT8=1 BENCH_BATCH=256 BENCH_PART=model VACNIC_KERNEL_NOCROSSSM=1 python scripts/profile_decode_b128.py
run probe_model_noselfsm 1140 env PROF_INT8=1 BENCH_BATCH=256 BENCH_PART=model VACNIC_KERNEL_NOSELFSM=1 python scripts/profile_decode_b128.py
run probe_model_nolm 1140 env PROF_INT8=1 BENCH_BATCH=256 BENCH_PART=model_nolm python scripts/profile_decode_b128.py
run bench_b64_default 1500 env BENCH_BATCH=64 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b512_nffn4 1500 env BENCH_BATCH=512 VACNIC_PLAN_NFFN=4 VACNIC_PLAN_NCROSS=128 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b256_confirm 1500 env BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
echo ALL_DONE_QUEUE6 >> "$LOG"
