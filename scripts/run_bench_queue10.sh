#!/bin/bash
# Round-4 queue 10: act on the skeleton result. Queue8 measured the b256
# fetch-only floor at 11.66 ms/step vs 16.28 full — fetch and compute look
# near-SERIAL (compute ~4.8 ms MXU adds almost fully on top), pointing at
# curtailed double-buffering under VMEM pressure and/or phase-count
# overheads (50 phases x 13 layers = 650 grid steps at the b256 plan).
# Sweep plan granularity with the model probe (same harness as the 16.28
# baseline), and retry b512 with a LEGAL n_self (bkc 40: beams- and
# 8-aligned; queue8's NSELF=40 asserted and choose_plan now clamps).
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4/bench_queue10.log}
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
run probe_fp8 600 python scripts/mosaic_probe_fp8.py all
run probe_model_ns8 1140 env PROF_INT8=1 BENCH_BATCH=256 BENCH_PART=model VACNIC_PLAN_NSELF=8 python scripts/profile_decode_b128.py
run probe_model_nc16 1140 env PROF_INT8=1 BENCH_BATCH=256 BENCH_PART=model VACNIC_PLAN_NCROSS=16 python scripts/profile_decode_b128.py
run probe_model_ns8_nc16 1140 env PROF_INT8=1 BENCH_BATCH=256 BENCH_PART=model VACNIC_PLAN_NSELF=8 VACNIC_PLAN_NCROSS=16 python scripts/profile_decode_b128.py
run probe_skel_ns8_nc16 1140 env PROF_INT8=1 BENCH_BATCH=256 BENCH_PART=model VACNIC_KERNEL_SKELETON=1 VACNIC_PLAN_NSELF=8 VACNIC_PLAN_NCROSS=16 python scripts/profile_decode_b128.py
run probe_model_vmem127 1140 env PROF_INT8=1 BENCH_BATCH=256 BENCH_PART=model VACNIC_PLAN_VMEM=127 python scripts/profile_decode_b128.py
run bench_b512_nffn4_nself64 1500 env BENCH_BATCH=512 VACNIC_PLAN_NFFN=4 VACNIC_PLAN_NSELF=64 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b256_confirm 1500 env BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
echo ALL_DONE_QUEUE10 >> "$LOG"
