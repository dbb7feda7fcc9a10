#!/bin/bash
# Round-4 queue 9: blockmax row-top-k A/B. The r3 in-situ blockmax probe
# (realbs_sl_blockmax) died in the compile outage (rc=124); the only number
# is from the discredited stub harness. Theory: plain per-row top-16 over
# [1280, 50432] costs ~2 ms in-loop; blockmax (max-reduce + top-C blocks +
# gather + re-rank) is near BW-bound. Decisive test = paired e2e benches in
# ONE window; realbs probes attribute the delta; PROBE_NOLSE quantifies the
# full-width logsumexp pass (also unmeasured since r3's outage).
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4/bench_queue9.log}
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
run bench_b256_blockmax 1500 env VACNIC_BEAM_TOPK=blockmax BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run bench_b256_default 1500 env BENCH_LATENCY=0 BENCH_INNER=1 python bench.py
run realbs_sl_plain 1140 env BENCH_BATCH=256 BENCH_PART=loop_realbs VACNIC_BEAM_LOGIC=shortlist python scripts/profile_decode_b128.py
run realbs_sl_blockmax 1140 env BENCH_BATCH=256 BENCH_PART=loop_realbs VACNIC_BEAM_LOGIC=shortlist VACNIC_BEAM_TOPK=blockmax python scripts/profile_decode_b128.py
run realbs_sl_nolse 1140 env BENCH_BATCH=256 BENCH_PART=loop_realbs VACNIC_BEAM_LOGIC=shortlist PROBE_NOLSE=1 python scripts/profile_decode_b128.py
echo ALL_DONE_QUEUE9 >> "$LOG"
