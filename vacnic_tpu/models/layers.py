"""Functional NN primitives shared by all models.

Pure functions over plain-dict param pytrees. Kernels are stored (in, out) —
JAX convention — so converted torch weights (out, in) are transposed once at
load time (see models/weights_io.py). Matmuls carry
``preferred_element_type=float32`` so the MXU accumulates in fp32 even under
bfloat16 compute.
"""

from __future__ import annotations

import math
import os
from typing import Any, Callable

import jax
import jax.numpy as jnp

Params = dict[str, Any]


def ckpt_name(x: jax.Array, name: str) -> jax.Array:
    """`jax.ad_checkpoint.checkpoint_name` tag: marks a tensor as saveable
    under a `save_only_these_names` remat policy (models/bart.remat_policy,
    VACNIC_REMAT_POLICY=names:...). A no-op otherwise."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x, name)

ACT2FN: dict[str, Callable] = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    # OpenAI CLIP uses x*sigmoid(1.702x) ("quick gelu")
    "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
}


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def linear_init(key, d_in: int, d_out: int, std: float = 0.02, bias: bool = True) -> Params:
    p = {"kernel": jax.random.normal(key, (d_in, d_out), jnp.float32) * std}
    if bias:
        p["bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


def layernorm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def embedding_init(key, vocab: int, dim: int, std: float = 0.02) -> Params:
    return {"weight": jax.random.normal(key, (vocab, dim), jnp.float32) * std}


# ---------------------------------------------------------------------------
# Forward ops
# ---------------------------------------------------------------------------

def linear(p: Params, x: jax.Array) -> jax.Array:
    y = jnp.dot(x, p["kernel"].astype(x.dtype), preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def layernorm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def embed(p: Params, ids: jax.Array, dtype=None) -> jax.Array:
    w = p["weight"]
    out = jnp.take(w, ids, axis=0)
    return out.astype(dtype) if dtype is not None else out


def dropout(x: jax.Array, rate: float, rng: jax.Array | None) -> jax.Array:
    """Inverted dropout; rng=None → deterministic identity (eval path).

    Default mask path (VACNIC_DROPOUT_BITS=0 opts out): a uint16-threshold
    compare. bernoulli lowers to bits→f32-uniform→compare (pure VPU work,
    recomputed under remat — measured ~77 ms/step at train b64 even with the
    rbg PRNG); comparing the raw uint16 bits against round(keep·65536) skips
    the float conversion. Same-window chip A/B at b64 teacher-cached:
    70.53 samples/s (907.4 ms) vs bernoulli 67.36 (950.1) — +4.7%.
    Keep-probability quantization is ≤1/65536 (0.9 → 0.899994), far below
    the mask-stream change the rbg default already made.

    NOTE the knob is read at TRACE time and is not part of any jit cache
    key (unlike the decode-side knobs, which generate.py fingerprints):
    flipping it after a train step has compiled silently reuses the old
    executable — A/B it with one process per arm (docs/KNOBS.md)."""
    if rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    if os.environ.get("VACNIC_DROPOUT_BITS", "1") == "1":
        thresh = min(int(round(keep * 65536.0)), 65535)
        mask = jax.random.bits(rng, x.shape, jnp.uint16) < jnp.uint16(thresh)
    else:
        mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class RngStream:
    """Deterministic per-call-site key derivation for dropout inside a traced fn.

    None-initialized stream yields None keys → all dropout becomes identity,
    which is the eval/inference path.
    """

    def __init__(self, key: jax.Array | None):
        self._key = key
        self._n = 0

    def next(self) -> jax.Array | None:
        if self._key is None:
            return None
        self._n += 1
        return jax.random.fold_in(self._key, self._n)


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------

def expand_mask(mask: jax.Array, tgt_len: int | None = None, dtype=jnp.float32) -> jax.Array:
    """[B, S] {0,1} keep-mask → additive [B, 1, T, S] with min-float at masked.

    Mirrors HF `_expand_mask` semantics (reference model file :387-398), which
    the modified encoder uses for all three mask families (padding,
    face+name cross, img+ner cross; model file :1262-1296).
    """
    bsz, src_len = mask.shape
    tgt_len = tgt_len if tgt_len is not None else src_len
    m = mask[:, None, None, :].astype(dtype)
    m = jnp.broadcast_to(m, (bsz, 1, tgt_len, src_len))
    return (1.0 - m) * jnp.finfo(dtype).min


def causal_mask(tgt_len: int, dtype=jnp.float32, offset: int = 0) -> jax.Array:
    """[1, 1, T, T+offset] additive causal mask (HF `_make_causal_mask`)."""
    full = tgt_len + offset
    i = jax.lax.broadcasted_iota(jnp.int32, (tgt_len, full), 0) + offset
    j = jax.lax.broadcasted_iota(jnp.int32, (tgt_len, full), 1)
    m = jnp.where(j <= i, 0.0, jnp.finfo(dtype).min).astype(dtype)
    return m[None, None, :, :]


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    b, t, d = x.shape
    return x.reshape(b, t, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, h, t, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


def attention_core(
    q: jax.Array,  # [B, H, T, hd] — already scaled
    k: jax.Array,  # [B, H, S, hd]
    v: jax.Array,  # [B, H, S, hd]
    mask: jax.Array | None,  # additive [B or 1, 1, T, S]
) -> jax.Array:
    if _flash_eligible(q, k, mask):
        from vacnic_tpu.kernels.flash_attn import flash_attention

        return flash_attention(q, k, v, jnp.broadcast_to(mask, q.shape[:2] + (q.shape[2], k.shape[2])))
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def _flash_eligible(q, k, mask) -> bool:
    """Use the Pallas flash kernel for long-sequence attention on TPU (the
    512-token encoder self-attention; SURVEY §7.9). Opt-in via
    VACNIC_PALLAS=1 while the kernel is validated per-backend; short or
    unaligned shapes and non-TPU backends always take the XLA path."""
    import os

    if not os.environ.get("VACNIC_PALLAS") or mask is None:
        return False
    if jax.default_backend() in ("cpu",):
        return False
    t, s, hd = q.shape[2], k.shape[2], q.shape[3]
    return t % 128 == 0 and s % 128 == 0 and hd % 64 == 0 and t >= 256


def mha(
    p: Params,
    hidden: jax.Array,
    key_value: jax.Array | None = None,
    mask: jax.Array | None = None,
    *,
    num_heads: int,
    cache: Params | None = None,
    cache_index: jax.Array | None = None,
) -> tuple[jax.Array, Params | None]:
    """Multi-head attention matching HF BartAttention (reference model :421-565).

    - q scaled by head_dim**-0.5 before the score matmul.
    - `key_value`=None → self-attention; else cross-attention.
    - `cache` (decode): dict with "k"/"v" of shape [B, H, L_max, hd]. For
      self-attention the new k/v rows are written at `cache_index`; for
      cross-attention the cache is computed once and reused (HF reuses cross
      KV across steps, reference model :474-477).
    """
    d = hidden.shape[-1]
    head_dim = d // num_heads
    scaling = head_dim**-0.5

    q = _split_heads(ckpt_name(linear(p["q_proj"], hidden), "attn_qkv") * scaling, num_heads)

    is_cross = key_value is not None
    if cache is not None and is_cross:
        k, v = cache["k"], cache["v"]  # precomputed once per sequence
        new_cache = cache
    else:
        # cross-attention K/V get their own tag: at S=512 they are the largest
        # attn tensors (~770 MB at batch 32) yet the cheapest to recompute, so
        # the default names policy excludes them (measured: including them
        # OOMs a 16 GB v5e at batch 32 by ~29 MB)
        kv_tag = "cross_kv" if is_cross else "attn_qkv"
        src = key_value if is_cross else hidden
        k = _split_heads(ckpt_name(linear(p["k_proj"], src), kv_tag), num_heads)
        v = _split_heads(ckpt_name(linear(p["v_proj"], src), kv_tag), num_heads)
        if cache is not None:  # cached self-attention (decode step)
            idx = cache_index
            k = jax.lax.dynamic_update_slice(cache["k"], k, (0, 0, idx, 0))
            v = jax.lax.dynamic_update_slice(cache["v"], v, (0, 0, idx, 0))
            new_cache = {"k": k, "v": v}
        else:
            new_cache = None

    out = attention_core(q, k, v, mask)
    return linear(p["out_proj"], _merge_heads(out)), new_cache


def mha_init(key, d_model: int, bias: bool = True) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "q_proj": linear_init(ks[0], d_model, d_model, bias=bias),
        "k_proj": linear_init(ks[1], d_model, d_model, bias=bias),
        "v_proj": linear_init(ks[2], d_model, d_model, bias=bias),
        "out_proj": linear_init(ks[3], d_model, d_model, bias=bias),
    }
