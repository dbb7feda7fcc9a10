#!/bin/bash
# Round-4 queue 11: fp8 (e4m3) self-cache feasibility + A/B at b256.
# fp8 forces bkc % 32 (plan n_self 16→8 at b256), so the matched control is
# bf16 + NSELF=8 — queue10's ns8 probe plus the explicit e2e control here
# disentangle the dtype win from the plan change. Blockmax beam top-k is
# default at this HEAD (175.2 vs 158.6, queue9).
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4/bench_queue11.log}
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
# bkc=80 legality decides whether fp8 keeps the measured-optimal ns16 plan
# (queue10: ns8 at b256 = 31.3 ms/step — 2x worse; the coarse plan would
# swamp the fp8 fetch saving)
run probe_fp8_window160 600 python scripts/mosaic_probe_fp8.py window
run probe_fp8_window80 600 python scripts/mosaic_probe_fp8.py window80
run probe_model_fp8 1140 env PROF_INT8=1 BENCH_BATCH=256 BENCH_PART=model VACNIC_SELFKV_FP8=1 VACNIC_FP8_SUB8=1 python scripts/profile_decode_b128.py
run bench_b256_fp8 1500 env VACNIC_SELFKV_FP8=1 VACNIC_FP8_SUB8=1 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b512_fp8 1500 env BENCH_BATCH=512 VACNIC_SELFKV_FP8=1 VACNIC_FP8_SUB8=1 VACNIC_PLAN_NFFN=4 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b256_default 1500 env BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
echo ALL_DONE_QUEUE11 >> "$LOG"
