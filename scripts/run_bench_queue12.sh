#!/bin/bash
# Round-4 queue 12: int4 feasibility + dtype fetch-bandwidth ladder.
# fp8 self-cache was a measured NEGATIVE (45.0 vs 16.28 ms/step at b256 —
# v5e emulates fp8 conversion); int8 converts natively. The timed ladder
# (int4/int8/fp8/bf16 streaming sum at same logical volume) decides whether
# int4 cross-KV (the largest fetch-floor term, −1.6 GB/step) is viable
# before any kernel work. Plus the remaining b512-with-fp8 HBM-fit check
# if queue11 didn't reach it, and a default confirm.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4/bench_queue12.log}
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
run probe_int4_full 600 python scripts/mosaic_probe_int4.py full
run probe_int4_window 600 python scripts/mosaic_probe_int4.py window
run timed_bf16 600 python scripts/mosaic_probe_int4.py timed_bf16
run timed_int8 600 python scripts/mosaic_probe_int4.py timed_int8
run timed_int4 600 python scripts/mosaic_probe_int4.py timed_int4
run timed_fp8 600 python scripts/mosaic_probe_int4.py timed_fp8
# n_t sweep at b256: time chunks multiply the self-phase grid steps
# (ns16 x nt4 = 64 of ~98 phases/layer); nt trades pos-elision fetch savings
# against per-step overheads — b128 tuned nt4, b256 never swept
run probe_model_nt2 1140 env PROF_INT8=1 BENCH_BATCH=256 BENCH_PART=model VACNIC_PLAN_NT=2 python scripts/profile_decode_b128.py
run probe_model_nt8 1140 env PROF_INT8=1 BENCH_BATCH=256 BENCH_PART=model VACNIC_PLAN_NT=8 python scripts/profile_decode_b128.py
run probe_skel_nt2 1140 env PROF_INT8=1 BENCH_BATCH=256 BENCH_PART=model VACNIC_PLAN_NT=2 VACNIC_KERNEL_SKELETON=1 python scripts/profile_decode_b128.py
# b512 retry after the chunked cross-KV projection (the 12.9 GB f32
# einsum intermediate was the 18.12G OOM, not the caches); bf16 self caches
# still put the tally at ~16.5 GB — expect borderline, record the boundary
run bench_b512_retry 1500 env BENCH_BATCH=512 VACNIC_PLAN_NFFN=4 BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b256_confirm 1500 env BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
echo ALL_DONE_QUEUE12 >> "$LOG"
