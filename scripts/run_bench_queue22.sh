#!/bin/bash
# Round-4b queue 22: size the b256 encoder glue (embed + stream evolution +
# projections) to decide whether a fusion-streams kernel is worth building.
# Single-call timings include the ~28 ms RT — read DELTAS at equal batch:
#   glue_share(b) = glue(b) - RT;  kernel_share(b) = fused(b) - glue(b)
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4b/bench_queue22.log}
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
run glue_b32 900 env ENC_MODE=glue ENC_BATCH=32 python scripts/bench_encoder_parts.py
run glue_b256 900 env ENC_MODE=glue ENC_BATCH=256 python scripts/bench_encoder_parts.py
run fused_b256 1200 env ENC_MODE=fused ENC_BATCH=256 python scripts/bench_encoder_parts.py
run fused_b32 900 env ENC_MODE=fused ENC_BATCH=32 python scripts/bench_encoder_parts.py
echo ALL_DONE_QUEUE22 >> "$LOG"
