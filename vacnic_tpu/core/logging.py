"""Structured run logging.

The reference logs per-step losses to wandb (train...match.py:380-384,
722-728). Here: a JSON-lines `MetricsLogger` that is wandb-compatible in
shape (`log({"loss": ...})`) but writes locally, plus an optional wandb
passthrough if the package is importable and configured.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Any, Mapping


def get_logger(name: str = "vacnic_tpu", level: int = logging.INFO) -> logging.Logger:
    """Rebuilds the absent `src.utils.misc.get_logger` (SURVEY §0.1)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(h)
    logger.setLevel(level)
    return logger


class MetricsLogger:
    """JSON-lines metric stream: one `{"_step": n, "_time": t, ...}` per log call."""

    def __init__(self, out_dir: str | None = None, run_name: str = "run", use_wandb: bool = False):
        self._step = 0
        self._fh = None
        self._wandb = None
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self._fh = open(os.path.join(out_dir, f"{run_name}.metrics.jsonl"), "a")
        if use_wandb:
            try:  # pragma: no cover - wandb not installed in this image
                import wandb

                self._wandb = wandb
            except ImportError:
                pass

    def log(self, metrics: Mapping[str, Any], step: int | None = None) -> None:
        step = self._step if step is None else step
        rec = {"_step": step, "_time": time.time()}
        for k, v in metrics.items():
            rec[k] = float(v) if hasattr(v, "__float__") else v
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self._wandb:  # pragma: no cover
            self._wandb.log(dict(metrics), step=step)
        self._step = step + 1

    def close(self) -> None:
        if self._fh:
            self._fh.close()
