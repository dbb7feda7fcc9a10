#!/bin/bash
# Round-5 queue 34: grid-step overhead decomposition — window-size sweep
# (affine fit: slope = 1/DMA-BW, intercept = fixed per-step overhead),
# operand-count cost, scalar-prefetch dynamic-index cost. Chains on queue32.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r5/bench_queue34.log}
PREV=${3:-/root/repo/scripts/logs_r5/bench_queue32.log}
mkdir -p "$(dirname "$LOG")"
for i in $(seq 1 360); do
  grep -q ALL_DONE_QUEUE32 "$PREV" 2>/dev/null && break
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
run rows1024 900 env PROBE_K=0 PROBE_ROWS=1024 PROBE_WINDOWS=256 python scripts/mosaic_probe_overlap.py
run rows2048 900 env PROBE_K=0 PROBE_ROWS=2048 PROBE_WINDOWS=256 python scripts/mosaic_probe_overlap.py
run rows8192 900 env PROBE_K=0 PROBE_ROWS=8192 PROBE_WINDOWS=64 python scripts/mosaic_probe_overlap.py
run extra8  900 env PROBE_K=0 PROBE_EXTRA_OPS=8 python scripts/mosaic_probe_overlap.py
run extra26 900 env PROBE_K=0 PROBE_EXTRA_OPS=26 python scripts/mosaic_probe_overlap.py
run dynidx  900 env PROBE_K=0 PROBE_DYNIDX=1 python scripts/mosaic_probe_overlap.py
echo ALL_DONE_QUEUE34 >> "$LOG"
