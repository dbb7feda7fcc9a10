#!/bin/bash
# r5 chip recovery watcher: tiny jit probe, timeout 120, every 300 s.
LOG=/root/repo/scripts/logs_r5/chip_watch.log
for i in $(seq 1 60); do
  echo "--- probe $i $(date +%H:%M:%S) ---" >> "$LOG"
  if timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256, 256), jnp.bfloat16)
print(float(np.asarray(jax.jit(lambda a: a @ a + 1.0)(x)).sum()))
" >> "$LOG" 2>&1; then
    echo "--- probe $i OK $(date +%H:%M:%S) ---" >> "$LOG"
    echo CHIP_RECOVERED >> "$LOG"
    exit 0
  fi
  sleep 300
done
echo CHIP_NEVER_RECOVERED >> "$LOG"
