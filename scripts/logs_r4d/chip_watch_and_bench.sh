#!/bin/bash
# Watch the compile service (tiny jit, timeout 120, sleep 300); when it
# recovers, run bench.py from the snapshot and exit. CLAUDE.md watcher pattern.
SNAP=/tmp/snap_r4d
LOG=/root/repo/scripts/logs_r4d/chip_watch.log
BLOG=/root/repo/scripts/logs_r4d/bench_head_2.log
for i in $(seq 1 120); do
  echo "probe $i $(date +%H:%M:%S)" >> "$LOG"
  timeout 120 env PYTHONPATH=$SNAP:/root/.axon_site \
    JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
    python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256, 256), jnp.bfloat16)
y = jax.jit(lambda a: a @ a)(x)
print('probe ok', float(np.asarray(y)[0, 0]))
" >> "$LOG" 2>&1
  rc=$?
  echo "probe rc=$rc" >> "$LOG"
  if [ "$rc" -eq 0 ]; then
    echo "recovered $(date +%H:%M:%S); running bench" >> "$LOG"
    cd "$SNAP"
    PYTHONPATH=$SNAP:/root/.axon_site \
      JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
      JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10 \
      timeout 1800 python bench.py > "$BLOG" 2>&1
    echo "bench rc=$?" >> "$BLOG"
    echo "BENCH_DONE" >> "$LOG"
    exit 0
  fi
  sleep 300
done
echo "WATCH_EXPIRED" >> "$LOG"
