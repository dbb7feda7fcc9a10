"""Seeding utilities (rebuilds the absent `src.utils.misc.set_random_seed`;
SURVEY §0.1 — the reference seeds all RNGs from --seed, default 684331,
inference seed 42 per README.md:8)."""

from __future__ import annotations

import random

import jax
import numpy as np


def set_random_seed(seed: int) -> jax.Array:
    """Seed python/numpy and return the root JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.PRNGKey(seed)


def split_like(key: jax.Array, names: tuple[str, ...]) -> dict[str, jax.Array]:
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))
