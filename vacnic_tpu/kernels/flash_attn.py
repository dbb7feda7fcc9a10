"""Pallas flash attention for the fusion encoder (TPU).

The encoder's hot loop is 12 fusion layers × (text self-attention over 512
tokens + cross-attention to the 40-token multimodal KV) (SURVEY §3.1 HOTTEST).
XLA materializes the [B, H, 512, 512] score tensor in HBM for the self-attn;
this kernel computes attention blockwise in VMEM with an online softmax so
scores never leave the chip — the classic flash-attention memory saving, which
on v5e (16 MB VMEM) means the 512-length encoder runs entirely out of VMEM
per block.

Interface mirrors models/layers.attention_core: additive mask bias, q pre-
scaled by the caller. Gated by `use_pallas(x)` — falls back to the XLA path on
CPU (tests run the kernel in interpret mode instead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, block_k: int, kv_len: int):
    """One (batch*head, q-block) program: stream KV blocks with online softmax.

    Matmuls run in the INPUT dtype (bf16 on TPU) with f32 accumulation —
    upcasting q/k/v to f32 first halves MXU throughput and was why the
    kernel only matched the XLA path; probs are cast back to the input
    dtype before the value matmul, exactly like models/layers.attention_core.
    Softmax statistics stay f32."""
    q = q_ref[0]  # [block_q, d], input dtype
    block_q, d = q.shape
    mm = q.dtype

    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)  # running max
    l = jnp.zeros((block_q, 1), jnp.float32)  # running denom
    acc = jnp.zeros((block_q, d), jnp.float32)

    num_kv = kv_len // block_k

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        b = bias_ref[0, :, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) + b  # [bq, bk]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p.astype(mm), v,
                                        preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m, l, acc))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(
    q: jax.Array,  # [B, H, T, D] — already scaled
    k: jax.Array,  # [B, H, S, D]
    v: jax.Array,  # [B, H, S, D]
    bias: jax.Array,  # additive [B, 1 or H, T, S]
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jax.Array:
    b, h, t, d = q.shape
    s = k.shape[2]
    block_q = min(block_q, t)
    block_k = min(block_k, s)
    assert t % block_q == 0 and s % block_k == 0, (t, s, block_q, block_k)

    bias = jnp.broadcast_to(bias, (b, h, t, s))
    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, s, d)
    vf = v.reshape(b * h, s, d)
    biasf = bias.reshape(b * h, t, s)

    grid = (b * h, t // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, kv_len=s),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_q, s), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, biasf)
    return out.reshape(b, h, t, d)


def use_pallas() -> bool:
    """Pallas TPU kernels only on real TPU backends."""
    return jax.default_backend() not in ("cpu",)
