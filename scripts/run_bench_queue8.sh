#!/bin/bash
# Round-4 queue 8 (retries with queue7's failures fixed):
#   1. SKELETON probe at b256 — queue7's [1,1]→[BK,d] broadcast crash fixed
#      (rank-0 splat). Separates fetch floor from compute/bubbles.
#   2. nolm retry — queue6+7 RESOURCE_EXHAUSTED was the probe passing the
#      cache as a jit argument (second ~4 GB self-cache copy) AND building
#      bf16 cross-KV under PROF_INT8; both fixed (in-jit build, int8 match).
#   3/4. b512 with NFFN=4 and kernel-side plan shrinks: queue7 was over the
#      128 MB program VMEM by 1.55M (25.46M Mosaic register spills).
#      NSELF=40 → bkc 64 shrinks per-chunk scratch; second try adds NT=8.
#   5. b256 default confirm at this HEAD.
# Run from a git-archive snapshot; one TPU process at a time.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4/bench_queue8.log}
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
run bench_b512_nffn4_nself40 1500 env BENCH_BATCH=512 VACNIC_PLAN_NFFN=4 VACNIC_PLAN_NSELF=40 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b512_nffn4_nself40_nt8 1500 env BENCH_BATCH=512 VACNIC_PLAN_NFFN=4 VACNIC_PLAN_NSELF=40 VACNIC_PLAN_NT=8 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b256_confirm 1500 env BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
echo ALL_DONE_QUEUE8 >> "$LOG"
