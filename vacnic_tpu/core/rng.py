"""Seeding utilities (rebuilds the absent `src.utils.misc.set_random_seed`;
SURVEY §0.1 — the reference seeds all RNGs from --seed, default 684331,
inference seed 42 per README.md:8)."""

from __future__ import annotations

import random

import jax
import numpy as np


def set_random_seed(seed: int, impl: str | None = None) -> jax.Array:
    """Seed python/numpy and return the root JAX PRNG key.

    impl selects the JAX PRNG implementation ("threefry2x32" default;
    "rbg" maps dropout-mask generation onto the TPU hardware RNG path —
    see TrainConfig.prng_impl)."""
    random.seed(seed)
    np.random.seed(seed % (2**32))
    if impl:
        # process-wide default so raw (untyped) keys re-wrap with the same
        # impl across split/fold_in (typed keys would complicate orbax
        # checkpointing of TrainState.rng). Set unconditionally so an
        # explicit threefry request undoes a prior rbg switch.
        jax.config.update("jax_default_prng_impl", impl)
    return jax.random.PRNGKey(seed)


def split_like(key: jax.Array, names: tuple[str, ...]) -> dict[str, jax.Array]:
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))
