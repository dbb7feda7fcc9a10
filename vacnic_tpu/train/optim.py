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

from typing import Any, NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax

from vacnic_tpu.core.config import TrainConfig


class ScaleByAdamState(NamedTuple):
    count: chex.Array
    mu: Any
    nu: Any


def scale_by_adam_low_precision(
    b1: float, b2: float, eps: float,
    mu_dtype=jnp.bfloat16, nu_dtype=jnp.bfloat16,
) -> optax.GradientTransformation:
    """Adam moment tracking with BOTH moments storable in bf16.

    optax.scale_by_adam only casts mu; on a 16 GB v5e the fp32 second moment
    is another 2.2 GB of BART-large state. Update math runs in fp32 (moments
    cast up, bias correction exact); only the carried state is low-precision.
    bf16 nu (~0.4% relative) enters the update under a sqrt → ~0.2% step
    perturbation, the same order as the bf16-state deltas already validated
    in ab_numerics.json."""

    def init(params):
        mu = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, dtype=mu_dtype), params)
        nu = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, dtype=nu_dtype), params)
        return ScaleByAdamState(count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)

        def upd_mu(g, m):
            return (b1 * m.astype(jnp.float32) + (1 - b1) * g.astype(jnp.float32))

        def upd_nu(g, n):
            g = g.astype(jnp.float32)
            return b2 * n.astype(jnp.float32) + (1 - b2) * g * g

        mu32 = jax.tree_util.tree_map(upd_mu, grads, state.mu)
        nu32 = jax.tree_util.tree_map(upd_nu, grads, state.nu)
        updates = jax.tree_util.tree_map(
            lambda m, n: (m / c1) / (jnp.sqrt(n / c2) + eps), mu32, nu32)
        mu = jax.tree_util.tree_map(lambda m: m.astype(mu_dtype), mu32)
        nu = jax.tree_util.tree_map(lambda n: n.astype(nu_dtype), nu32)
        return updates, ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


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
    # "clip" = vision tower, "clip_text" = text tower (present when the
    # optional CLIP contrastive loss is on) — both belong to the frozen/1e-7
    # CLIP group, never the BART group (train...match.py:85-109, 376-378).
    return any(getattr(p, "key", None) in ("clip", "clip_text") for p in path)


def make_optimizer(cfg: TrainConfig, num_training_steps: int, train_clip: bool = False,
                   mu_dtype=None, nu_dtype=None):
    """Build the two-group optax transform over a param tree that may contain a
    top-level "clip" subtree. `mu_dtype=jnp.bfloat16` halves the first-moment
    memory (useful for single-chip BART-large, where fp32 params+grads+Adam
    state exceed 16 GB HBM); `nu_dtype=jnp.bfloat16` additionally halves the
    second moment (scale_by_adam_low_precision — another ~2.2 GB on
    BART-large)."""
    if nu_dtype is not None:
        adam = scale_by_adam_low_precision(
            cfg.adam_b1, cfg.adam_b2, cfg.adam_eps,
            mu_dtype=mu_dtype or jnp.float32, nu_dtype=nu_dtype)
    else:
        adam = optax.scale_by_adam(b1=cfg.adam_b1, b2=cfg.adam_b2,
                                   eps=cfg.adam_eps, mu_dtype=mu_dtype)
    bart_tx = optax.chain(
        optax.clip_by_global_norm(cfg.clip_norm) if not cfg.no_clip_norm else optax.identity(),
        adam,
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
