"""Mosaic-safe math shared by the fused kernels.

Mosaic lowers neither `erf` nor `erfc`, so the kernels' exact-gelu activation
uses the Abramowitz-Stegun 7.1.26 rational erf approximation
(|err| <= 1.5e-7 — below bf16 resolution, i.e. numerically identical to
exact gelu in kernel math). One definition here keeps the decode and encoder
kernels in lockstep.
"""

from __future__ import annotations

import jax.numpy as jnp

from vacnic_tpu.models.layers import ACT2FN


def erf_rational(x):
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def mosaic_act(act_name: str):
    """Activation function usable inside a Mosaic kernel body."""
    if act_name == "gelu":
        return lambda x: 0.5 * x * (1.0 + erf_rational(x * 0.7071067811865476))
    return ACT2FN[act_name]
