#!/bin/bash
# Round-5 queue 35: step-fusion premise (PROBE_NOPS: N full 8 MB windows per
# grid step over N-fewer steps, same total bytes). If per-step overhead is
# fixed (~8 us, queue34), NOPS=2/4 should cut us/window toward bytes/BW.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r5/bench_queue35.log}
PREV=${3:-/root/repo/scripts/logs_r5/bench_queue33.log}
mkdir -p "$(dirname "$LOG")"
for i in $(seq 1 360); do
  grep -q ALL_DONE_QUEUE33 "$PREV" 2>/dev/null && break
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
run nops2 900 env PROBE_K=0 PROBE_NOPS=2 python scripts/mosaic_probe_overlap.py
run nops4 900 env PROBE_K=0 PROBE_NOPS=4 python scripts/mosaic_probe_overlap.py
run nops2_k2 900 env PROBE_K=2 PROBE_NOPS=2 python scripts/mosaic_probe_overlap.py
echo ALL_DONE_QUEUE35 >> "$LOG"
