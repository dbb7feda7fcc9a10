#!/bin/bash
# Round-4 queue 27: compile-service recovery watcher -> bench.py -> serve A/B.
# CLAUDE.md outage pattern: probe a tiny jit (timeout 120 s) every 5 min,
# do nothing else on the chip until one succeeds, then run the real jobs.
SNAP=${1:?snapshot dir}
LOG=${2:-/root/repo/scripts/logs_r4g/bench_queue27.log}
mkdir -p "$(dirname "$LOG")"
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
probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256, 256), jnp.bfloat16)
print(float(np.asarray(jax.jit(lambda a: a @ a + 1.0)(x)).sum()))
" >> "$LOG" 2>&1
}
# watcher: up to ~75 min of 5-min probes
for i in $(seq 1 15); do
  echo "--- probe $i $(date +%H:%M:%S) ---" >> "$LOG"
  if probe; then
    echo "--- probe $i OK $(date +%H:%M:%S) ---" >> "$LOG"
    break
  fi
  sleep 300
done
run bench_after_recovery 3600 python bench.py
run serve_defer 3000 env SERVE_BUCKETS=1,8,32 SERVE_WAIT=20 SERVE_RATE=40 \
  SERVE_N=192 python scripts/bench_serve.py
echo ALL_DONE_QUEUE27 >> "$LOG"
