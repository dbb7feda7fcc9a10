"""Minimal Mosaic repro for the encoder-kernel crash ("limits 64 vs 1"):
a single-phase pallas kernel doing just the suspect ops at the real shapes.
PROBE selects the variant:

  a  — per-head slices + batched dot with TRANSPOSED rhs ((2,),(2,))
  b  — swapaxes'd keys + untransposed contraction ((2,),(1,))
  c  — b + the [BC, 1, S] bias broadcast-add
  d  — c + softmax over lanes
  e  — b, but keys built via jnp.transpose instead of swapaxes
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

BC, S, HD, D = 4, 512, 64, 1024
ROWS = BC * S


def _kernel(x_ref, b_ref, o_ref, *, probe: str):
    x = x_ref[...]
    q = x[:, :HD].reshape(BC, S, HD)
    if probe == "a":
        k = x[:, HD:2 * HD].reshape(BC, S, HD)
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
    else:
        k3 = x[:, HD:2 * HD].reshape(BC, S, HD)
        if probe == "e":
            k = jnp.transpose(k3, (0, 2, 1))
        else:
            k = jnp.swapaxes(k3, 1, 2)
        s = jax.lax.dot_general(q, k, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
    if probe in ("c", "d"):
        s = s + b_ref[0][:, None, :]
    if probe == "d":
        s = jax.nn.softmax(s, axis=-1)
    o_ref[...] = jnp.sum(s, axis=-1).reshape(ROWS, 1)[:, :1] * jnp.ones(
        (ROWS, 128), jnp.float32)


def main():
    probe = os.environ.get("PROBE", "a")
    x = jax.random.normal(jax.random.PRNGKey(0), (ROWS, D), jnp.bfloat16)
    b = jnp.zeros((1, BC, S), jnp.float32)
    fn = jax.jit(lambda x, b: pl.pallas_call(
        functools.partial(_kernel, probe=probe),
        grid=(1,),
        in_specs=[pl.BlockSpec((ROWS, D), lambda i: (0, 0)),
                  pl.BlockSpec((1, BC, S), lambda i: (0, 0, 0))],
        out_specs=pl.BlockSpec((ROWS, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(x, b))
    print(f"probe {probe}: compiling...", file=sys.stderr, flush=True)
    out = np.asarray(fn(x, b))
    print(f"probe {probe}: OK mean={out.mean():.4f}")


if __name__ == "__main__":
    main()
