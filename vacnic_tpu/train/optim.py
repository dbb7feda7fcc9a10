"""Optimizers: two AdamW groups + linear warmup schedules.

Mirrors `prep_for_training` (train...match.py:85-109): AdamW betas (0.9,
0.999), eps 1e-8, wd 0.01; group 1 = BART body + lm_head at lr_bart (3e-5),
group 2 = CLIP at lr_clip (1e-7); `get_linear_schedule_with_warmup` over
num_epochs·steps with warmup_rate (5%). The released trainer never steps the
CLIP optimizer (its `.step()` is commented out, train...match.py:376-378) and
freezes CLIP anyway, so the CLIP group defaults to frozen here; pass
`train_clip=True` for the unfrozen variant.
"""

from __future__ import annotations

from typing import Any

import jax
import optax

from vacnic_tpu.core.config import TrainConfig


def linear_warmup_schedule(base_lr: float, num_training_steps: int, warmup_rate: float):
    """HF get_linear_schedule_with_warmup: 0→lr over warmup, lr→0 over the rest."""
    warmup = max(1, int(warmup_rate * num_training_steps))

    def sched(step):
        step = jax.numpy.minimum(step, num_training_steps)
        warm = step / warmup
        decay = jax.numpy.maximum(
            0.0, (num_training_steps - step) / jax.numpy.maximum(1, num_training_steps - warmup)
        )
        return base_lr * jax.numpy.where(step < warmup, warm, decay)

    return sched


def _is_clip(path: tuple) -> bool:
    return any(getattr(p, "key", None) == "clip" for p in path)


def make_optimizer(cfg: TrainConfig, num_training_steps: int, train_clip: bool = False,
                   mu_dtype=None):
    """Build the two-group optax transform over a param tree that may contain a
    top-level "clip" subtree. `mu_dtype=jnp.bfloat16` halves the first-moment
    memory (useful for single-chip BART-large, where fp32 params+grads+Adam
    state exceed 16 GB HBM; the second moment stays fp32)."""
    bart_tx = optax.chain(
        optax.clip_by_global_norm(cfg.clip_norm) if not cfg.no_clip_norm else optax.identity(),
        optax.scale_by_adam(b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps, mu_dtype=mu_dtype),
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_learning_rate(
            linear_warmup_schedule(cfg.lr_bart, num_training_steps, cfg.warmup_rate)
        ),
    )
    if not train_clip:
        clip_tx = optax.set_to_zero()
    else:
        clip_tx = optax.chain(
            optax.scale_by_adam(b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps),
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_learning_rate(
                linear_warmup_schedule(cfg.lr_clip, num_training_steps, cfg.warmup_rate)
            ),
        )

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "clip" if _is_clip(path) else "bart", params
        )

    return optax.multi_transform({"bart": bart_tx, "clip": clip_tx}, label_fn)
