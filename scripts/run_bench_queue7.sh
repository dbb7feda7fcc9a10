#!/bin/bash
# Round-4 queue 7 (model-step floor attribution continued + retries):
#   1. SKELETON probe at b256 — all kernel compute off, fetches+grid intact
#      (VACNIC_KERNEL_SKELETON). Separates the fetch-pipeline floor from
#      compute: queue6 killed the softmax hypothesis (nocrosssm −0.2 ms,
#      noselfsm −0.0), so the 16.3 vs ~11.6 gap is bubbles or fetch-bound.
#   2. nolm retry (queue6 hit a transient RESOURCE_EXHAUSTED on the 5th
#      consecutive tunnel job; the b64 bench right after was fine).
#   3. b512 retry with NFFN=4 only (queue6's NCROSS=128 made 4-row enc_bias
#      blocks — Mosaic-illegal; choose_plan now clamps, default NCROSS=64
#      is already the minimum window).
#   4. b64 lm_stats-vs-default SAME-WINDOW A/B (queue5 b64+stats 154.6 vs
#      queue6 b64 default 136.2 were different windows; settle it).
#   5. b256 default confirm at this HEAD.
# Run from a git-archive snapshot; one TPU process at a time.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4/bench_queue7.log}
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
run probe_model_skeleton 1140 env PROF_INT8=1 BENCH_BATCH=256 BENCH_PART=model VACNIC_KERNEL_SKELETON=1 python scripts/profile_decode_b128.py
run probe_model_nolm 1140 env PROF_INT8=1 BENCH_BATCH=256 BENCH_PART=model_nolm python scripts/profile_decode_b128.py
run bench_b512_nffn4 1500 env BENCH_BATCH=512 VACNIC_PLAN_NFFN=4 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b64_default 1500 env BENCH_BATCH=64 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b64_stats 1500 env BENCH_BATCH=64 VACNIC_LM_STATS=1 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b256_confirm 1500 env BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
echo ALL_DONE_QUEUE7 >> "$LOG"
