"""Pallas kernel tests (interpret mode on CPU): flash attention vs the XLA
reference attention_core, with padding masks."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vacnic_tpu.kernels.flash_attn import flash_attention
from vacnic_tpu.models.layers import attention_core, expand_mask


@pytest.mark.parametrize("t,s", [(128, 128), (256, 128), (128, 256)])
def test_flash_matches_reference(t, s, rng):
    b, h, d = 2, 4, 32
    q = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32)) * d**-0.5
    k = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
    mask2d = np.ones((b, s), np.int32)
    mask2d[0, -17:] = 0
    bias = expand_mask(jnp.asarray(mask2d), t)

    ref = attention_core(q, k, v, bias)
    out = flash_attention(q, k, v, bias, block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_fully_masked_rows_match(rng):
    """Rows with every key masked: reference softmax gives uniform attention
    (finfo.min bias); flash must not NaN. Values won't match the uniform
    convention, so only check finiteness here."""
    b, h, t, s, d = 1, 2, 128, 128, 32
    q = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
    bias = jnp.full((b, 1, t, s), float(jnp.finfo(jnp.float32).min))
    out = flash_attention(q, k, v, bias, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
