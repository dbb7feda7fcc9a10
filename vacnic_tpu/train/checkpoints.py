"""Checkpoint / resume via Orbax.

The reference `torch.save(model)`s the whole pickled module on best-val and
every epoch, never saves optimizer state, and has no resume path (SURVEY §5
checkpoint/resume). Here: full TrainState (params + teacher + optimizer +
step + rng) checkpoints with retention policy and the config stored beside as
JSON — replacing the hyperparameters-in-filename codec
(train...match.py:669-717) that the reference's inference script parses by
substring.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from vacnic_tpu.core.config import VacnicConfig

CONFIG_FILE = "config.json"


class CheckpointManager:
    def __init__(self, directory: str, cfg: VacnicConfig | None = None, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
        )
        if cfg is not None:
            with open(os.path.join(self.directory, CONFIG_FILE), "w") as f:
                f.write(cfg.to_json())

    def save(self, step: int, state: Any, metrics: dict | None = None) -> None:
        """Async save (preemption-safe: returns once staged, commits in the
        background)."""
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )

    def restore(self, state_template: Any, step: int | None = None) -> tuple[Any, int]:
        step = self.latest_step() if step is None else step
        if step is None:
            return state_template, 0
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(state_template))
        except Exception as e:
            # PRNG-impl migration: checkpoints written before the rbg default
            # (TrainConfig.prng_impl) hold a threefry (2,)-shaped rng where
            # the template now has an rbg (4,) key — or vice versa. Retry
            # with the alternate raw-key shape, then keep the TEMPLATE's key:
            # a stored key from a different impl cannot seed the current one
            # (the RNG stream restarts; dropout masks have no continuity
            # guarantee across an impl switch anyway). Only a shape/structure
            # mismatch takes this path — an unrelated failure (corrupt
            # checkpoint, IO error) must surface as-is (ADVICE r3 #5).
            msg = str(e).lower()
            looks_like_mismatch = any(
                s in msg for s in ("shape", "structure", "mismatch",
                                   "does not match", "incompatible"))
            rng = getattr(state_template, "rng", None)
            if (not looks_like_mismatch or rng is None
                    or getattr(rng, "shape", None) not in ((2,), (4,))):
                raise
            import jax.numpy as jnp

            alt_shape = (2,) if rng.shape == (4,) else (4,)
            alt = state_template._replace(
                rng=jnp.zeros(alt_shape, jnp.uint32))
            try:
                restored = self._mgr.restore(
                    step, args=ocp.args.StandardRestore(alt))
            except Exception as e2:
                raise e2 from e  # keep the original failure in the chain
            import logging

            logging.getLogger(__name__).warning(
                "restored step %s across a prng_impl switch (stored rng shape "
                "%s, template %s): the dropout RNG stream restarts from the "
                "template's fresh key", step, alt_shape, tuple(rng.shape))
            restored = restored._replace(rng=state_template.rng)
        return restored, step

    def restore_raw(self, step: int | None = None) -> tuple[Any, int]:
        """Template-free restore: the saved pytree exactly as written (dicts/
        lists of arrays, no TrainState container). Inference-side loading
        (cli generate) uses this so checkpoints whose param tree carries
        optional subtrees the template can't predict — e.g. params['clip_text']
        from a train.no_clip_loss=false run with tower dims taken from the
        CLIP checkpoint file — restore without a structure mismatch."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None, 0
        return self._mgr.restore(step, args=ocp.args.StandardRestore()), step

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()

    @staticmethod
    def load_config(directory: str) -> VacnicConfig:
        with open(os.path.join(directory, CONFIG_FILE)) as f:
            return VacnicConfig.from_json(f.read())
