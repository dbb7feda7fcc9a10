"""Profiling / tracing hooks (SURVEY §5: the reference has none — tqdm and
wandb only; this framework makes tracing first-class).

* `trace(dir)` — context manager around `jax.profiler` for device traces
  (view in XProf/TensorBoard).
* `StepTimer` — wall-clock per-step timing with device sync via a forced
  host transfer (on tunneled TPU backends `block_until_ready` may return
  before execution completes; see bench.py).
* `annotate` — TraceAnnotation passthrough for labeling jit regions.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def sync(x: Any) -> None:
    """Force completion of the computation producing x (host transfer of one
    leaf — reliable on backends where block_until_ready is asynchronous)."""
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        np.asarray(jax.device_get(jax.tree_util.tree_map(lambda l: l.ravel()[0], leaves[0])))


class StepTimer:
    """Rolling step timer: `with timer.step(): ...` then `timer.summary()`."""

    def __init__(self, warmup: int = 1):
        self.times: list[float] = []
        self.warmup = warmup
        self._n = 0

    @contextlib.contextmanager
    def step(self, result: Any = None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            sync(result)
        self._n += 1
        if self._n > self.warmup:
            self.times.append(time.perf_counter() - t0)

    def summary(self) -> dict[str, float]:
        if not self.times:
            return {"steps": 0}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "steps_per_sec": float(1.0 / arr.mean()),
        }
