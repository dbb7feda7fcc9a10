#!/bin/bash
# Round-4b queue 23: int8 cross-KV gate REPLICATES (seeds 1, 2). The
# default-on posture rests on one seed-0 PASS (0.9714 >= 0.9583); two
# independent replicates (fresh init + fresh data stream, same protocol)
# make it a 3-point gate. Pre-registered decision rule: default stays ON
# iff int8-vs-bf16 token agreement >= the bf16-vs-f32 control in the
# POOLED (mean) sense across the three seeds.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4b/bench_queue23.log}
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
run gate_crosskv_s1 1200 env GATE_SEED=1 \
  GATE_PARAMS=/root/repo/scripts/logs_r4b/gate_params_s1.npz \
  python scripts/gate_crosskv_int8_cpu.py --phase decode
run gate_crosskv_s2 1200 env GATE_SEED=2 \
  GATE_PARAMS=/root/repo/scripts/logs_r4b/gate_params_s2.npz \
  python scripts/gate_crosskv_int8_cpu.py --phase decode
echo ALL_DONE_QUEUE23 >> "$LOG"
