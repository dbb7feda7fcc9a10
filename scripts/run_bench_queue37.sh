#!/bin/bash
# Round-5 queue 37 (rewritten): ffn_shadow + NFFN=1 A/B. The queue35 NOPS
# probes killed t_fuse's premise (no parallel-stream BW aggregation) but
# showed compute hides fully under per-step copies; the original shadow
# loss is attributed to the n_ffn=2 fc-column PING-PONG refetch (jobs
# alternate f=0,1 per phase -> ~3 GB/step of fc window refetches). With
# n_ffn=1 the fc blocks are layer-constant (fetched once) and the FFN's
# ~2.2 ms of exposed compute lands under the cross fetch stream.
# Chains on queue36.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r5/bench_queue37.log}
PREV=${3:-/root/repo/scripts/logs_r5/bench_queue36.log}
mkdir -p "$(dirname "$LOG")"
for i in $(seq 1 360); do
  grep -q ALL_DONE_QUEUE36 "$PREV" 2>/dev/null && break
  sleep 30
done
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
run model_shadow1_i8 2400 env BENCH_BATCH=256 BENCH_PART=model PROF_INT8=1 \
  VACNIC_PLAN_FFNSHADOW=1 VACNIC_PLAN_NFFN=1 VACNIC_PLAN_VMEM=127 python scripts/profile_decode_b128.py
run model_base_i8b 2400 env BENCH_BATCH=256 BENCH_PART=model PROF_INT8=1 \
  python scripts/profile_decode_b128.py
run model_tfuse_i8 2400 env BENCH_BATCH=256 BENCH_PART=model PROF_INT8=1 \
  VACNIC_PLAN_TFUSE=2 python scripts/profile_decode_b128.py
run bench_shadow1 3600 env VACNIC_PLAN_FFNSHADOW=1 VACNIC_PLAN_NFFN=1 VACNIC_PLAN_VMEM=127 \
  BENCH_LATENCY=0 python bench.py
run bench_base_pair 3600 env BENCH_LATENCY=0 python bench.py
echo ALL_DONE_QUEUE37 >> "$LOG"
