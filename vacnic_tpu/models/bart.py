"""Vanilla BART encoder-decoder, functional JAX.

This is the text-only backbone: it implements exactly the computation of HF
BART (the reference forks transformers 4.18's modeling_bart; unmodified
pieces cited below) and serves two roles:

  1. the frozen CoLaM teacher (`BartForConditionalGeneration`,
     train...match.py:745-751), and
  2. the base layers of the multimodal model (models/fusion.py builds the
     modified encoder on top of these primitives).

Parity is tested against the installed torch/transformers BART on tiny random
configs (tests/test_bart_parity.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from vacnic_tpu.core.config import BartConfig
from vacnic_tpu.models.layers import (
    ACT2FN,
    Params,
    RngStream,
    causal_mask,
    ckpt_name,
    dropout,
    embed,
    embedding_init,
    expand_mask,
    layernorm,
    layernorm_init,
    linear,
    linear_init,
    mha,
    mha_init,
)

POS_OFFSET = 2  # BartLearnedPositionalEmbedding offset (reference model :401-418)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


# Remat policy for all jax.checkpoint sites (encoder/decoder/fusion layers).
# Default saves nothing (max memory savings). Knobs (scripts/bench_train.py):
#   VACNIC_REMAT_POLICY=dots              save every matmul output — measured
#                                         OOM on 16 GB v5e at batch>=16 (the
#                                         [B,H,S,S] attention scores dominate);
#   VACNIC_REMAT_POLICY=names:ffn_pre,attn_qkv
#                                         save only the named tensors: fc1
#                                         pre-activation ("ffn_pre") skips the
#                                         largest recompute matmul, q/k/v
#                                         projections ("attn_qkv") skip three
#                                         more while still recomputing the
#                                         quadratic score/softmax tensors —
#                                         the memory/recompute sweet spot.
import os as _os


def remat_policy():
    v = _os.environ.get("VACNIC_REMAT_POLICY", "")
    if v == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if v.startswith("names:"):
        return jax.checkpoint_policies.save_only_these_names(
            *[n for n in v[len("names:"):].split(",") if n])
    return None




def checkpoint(fn, static_argnums=()):
    return jax.checkpoint(fn, static_argnums=static_argnums, policy=remat_policy())


def encoder_layer_init(key, cfg: BartConfig) -> Params:
    ks = jax.random.split(key, 3)
    return {
        "self_attn": mha_init(ks[0], cfg.d_model),
        "self_attn_layer_norm": layernorm_init(cfg.d_model),
        "fc1": linear_init(ks[1], cfg.d_model, cfg.encoder_ffn_dim),
        "fc2": linear_init(ks[2], cfg.encoder_ffn_dim, cfg.d_model),
        "final_layer_norm": layernorm_init(cfg.d_model),
    }


def decoder_layer_init(key, cfg: BartConfig) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "self_attn": mha_init(ks[0], cfg.d_model),
        "self_attn_layer_norm": layernorm_init(cfg.d_model),
        "encoder_attn": mha_init(ks[1], cfg.d_model),
        "encoder_attn_layer_norm": layernorm_init(cfg.d_model),
        "fc1": linear_init(ks[2], cfg.d_model, cfg.decoder_ffn_dim),
        "fc2": linear_init(ks[3], cfg.decoder_ffn_dim, cfg.d_model),
        "final_layer_norm": layernorm_init(cfg.d_model),
    }


def bart_init(key, cfg: BartConfig) -> Params:
    """Full seq2seq params. `shared` embedding is used by encoder, decoder and
    (tied) lm_head; `final_logits_bias` is the zero bias buffer the reference
    resizes with the vocab (reference model :1884-1885, 1906-1918)."""
    n = cfg.encoder_layers + cfg.decoder_layers + 3
    ks = jax.random.split(key, n)
    i = iter(range(n))
    params: Params = {
        "shared": embedding_init(ks[next(i)], cfg.vocab_size, cfg.d_model),
        "encoder": {
            "embed_positions": embedding_init(
                ks[next(i)], cfg.max_position_embeddings + POS_OFFSET, cfg.d_model
            ),
            "layernorm_embedding": layernorm_init(cfg.d_model),
            "layers": tuple(encoder_layer_init(ks[next(i)], cfg) for _ in range(cfg.encoder_layers)),
        },
        "decoder": {
            "embed_positions": embedding_init(
                ks[next(i)], cfg.max_position_embeddings + POS_OFFSET, cfg.d_model
            ),
            "layernorm_embedding": layernorm_init(cfg.d_model),
            "layers": tuple(decoder_layer_init(ks[next(i)], cfg) for _ in range(cfg.decoder_layers)),
        },
        "final_logits_bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
    }
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _embed_scale(cfg: BartConfig) -> float:
    return float(cfg.d_model) ** 0.5 if cfg.scale_embedding else 1.0


def embed_and_norm(
    shared: Params,
    pos: Params,
    ln: Params,
    ids: jax.Array,
    cfg: BartConfig,
    rngs: RngStream,
    dtype,
    pos_offset: jax.Array | int = 0,
) -> jax.Array:
    """token embed * scale + learned positions (+2 offset) → LN → dropout.

    Shared by the encoder, decoder, and the separate NER stream embedding
    (reference model :1242-1260)."""
    x = embed(shared, ids, dtype) * _embed_scale(cfg)
    t = ids.shape[-1]
    positions = jnp.arange(t) + POS_OFFSET + pos_offset
    x = x + embed(pos, positions, dtype)[None, :, :]
    x = layernorm(ln, x)
    return dropout(x, cfg.dropout, rngs.next())


def encoder_layer_fwd(p: Params, x: jax.Array, attn_mask, cfg: BartConfig, rngs: RngStream) -> jax.Array:
    """Vanilla BART encoder layer (reference model :725-744 non-fusion path)."""
    act = ACT2FN[cfg.activation_function]
    residual = x
    h, _ = mha(p["self_attn"], x, mask=attn_mask, num_heads=cfg.encoder_attention_heads)
    h = dropout(h, cfg.dropout, rngs.next())
    x = layernorm(p["self_attn_layer_norm"], residual + h)

    residual = x
    h = act(ckpt_name(linear(p["fc1"], x), "ffn_pre"))
    h = dropout(h, cfg.activation_dropout, rngs.next())
    h = linear(p["fc2"], h)
    h = dropout(h, cfg.dropout, rngs.next())
    return layernorm(p["final_layer_norm"], residual + h)


def decoder_layer_fwd(
    p: Params,
    x: jax.Array,
    self_mask,
    enc_out: jax.Array | None,
    cross_mask,
    cfg: BartConfig,
    rngs: RngStream,
    cache: Params | None = None,
    cache_index=None,
) -> tuple[jax.Array, Params | None]:
    """BART decoder layer (unmodified in the reference; model :765-890)."""
    act = ACT2FN[cfg.activation_function]
    new_cache = None

    residual = x
    self_cache = cache.get("self") if cache else None
    h, self_cache = mha(
        p["self_attn"], x, mask=self_mask, num_heads=cfg.decoder_attention_heads,
        cache=self_cache, cache_index=cache_index,
    )
    h = dropout(h, cfg.dropout, rngs.next())
    x = layernorm(p["self_attn_layer_norm"], residual + h)

    if enc_out is not None:
        residual = x
        cross_cache = cache.get("cross") if cache else None
        h, cross_cache = mha(
            p["encoder_attn"], x, key_value=enc_out, mask=cross_mask,
            num_heads=cfg.decoder_attention_heads, cache=cross_cache,
        )
        h = dropout(h, cfg.dropout, rngs.next())
        x = layernorm(p["encoder_attn_layer_norm"], residual + h)
    else:
        cross_cache = cache.get("cross") if cache else None

    residual = x
    h = act(ckpt_name(linear(p["fc1"], x), "ffn_pre"))
    h = dropout(h, cfg.activation_dropout, rngs.next())
    h = linear(p["fc2"], h)
    h = dropout(h, cfg.dropout, rngs.next())
    x = layernorm(p["final_layer_norm"], residual + h)

    if cache is not None:
        new_cache = {"self": self_cache, "cross": cross_cache}
    return x, new_cache


def encoder_fwd(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: BartConfig,
    *,
    dropout_rng=None,
    dtype=jnp.float32,
    remat: bool = False,
) -> jax.Array:
    """Text-only encoder (used by the CoLaM teacher)."""
    rngs = RngStream(dropout_rng)
    enc = params["encoder"]
    x = embed_and_norm(params["shared"], enc["embed_positions"], enc["layernorm_embedding"],
                       input_ids, cfg, rngs, dtype)
    mask = expand_mask(attention_mask, dtype=dtype)

    # remat needs array-only traced args: per-layer dropout keys instead of a
    # threaded RngStream object (a stateless re-derivation, same semantics)
    has_dropout = dropout_rng is not None
    base_key = dropout_rng if has_dropout else jax.random.PRNGKey(0)

    def layer_fn(p, x, mask, key, cfg, has_dropout):
        return encoder_layer_fwd(p, x, mask, cfg, RngStream(key if has_dropout else None))

    layer = checkpoint(layer_fn, static_argnums=(4, 5)) if remat else layer_fn
    for i, p in enumerate(enc["layers"]):
        x = layer(p, x, mask, jax.random.fold_in(base_key, i), cfg, has_dropout)
    return x


def decoder_fwd(
    params: Params,
    decoder_input_ids: jax.Array,
    enc_out: jax.Array,
    enc_attention_mask: jax.Array,
    cfg: BartConfig,
    *,
    decoder_attention_mask: jax.Array | None = None,
    dropout_rng=None,
    dtype=jnp.float32,
    remat: bool = False,
    cache: Params | None = None,
    cache_index=None,
) -> tuple[jax.Array, Params | None]:
    """Decoder over a full sequence (train) or a single step (decode, with cache).

    Training path builds the causal mask internally (HF builds causal+padding
    combined; reference model :1434-1450). Decode path: `decoder_input_ids`
    is [B, 1] and `cache_index` the current position.
    """
    rngs = RngStream(dropout_rng)
    dec = params["decoder"]
    t = decoder_input_ids.shape[-1]

    pos_offset = cache_index if cache is not None else 0
    x = embed_and_norm(params["shared"], dec["embed_positions"], dec["layernorm_embedding"],
                       decoder_input_ids, cfg, rngs, dtype, pos_offset=pos_offset)

    if cache is not None:
        # single-step decode: attend to all cache positions <= cache_index
        L = cache["layers"][0]["self"]["k"].shape[2]
        pos = jnp.arange(L)[None, None, None, :]
        self_mask = jnp.where(pos <= cache_index, 0.0, jnp.finfo(dtype).min).astype(dtype)
    else:
        self_mask = causal_mask(t, dtype)
        if decoder_attention_mask is not None:
            self_mask = self_mask + expand_mask(decoder_attention_mask, t, dtype)

    cross_mask = expand_mask(enc_attention_mask, t, dtype)

    has_dropout = dropout_rng is not None
    base_key = dropout_rng if has_dropout else jax.random.PRNGKey(0)

    def layer_fn(p, x, self_mask, enc_out, cross_mask, key, cfg, has_dropout):
        rs = RngStream(key if has_dropout else None)
        out, _ = decoder_layer_fwd(p, x, self_mask, enc_out, cross_mask, cfg, rs, None, None)
        return out

    use_remat = remat and cache is None
    layer = checkpoint(layer_fn, static_argnums=(6, 7)) if use_remat else None

    new_layer_caches = []
    for i, p in enumerate(dec["layers"]):
        if use_remat:
            x = layer(p, x, self_mask, enc_out, cross_mask,
                      jax.random.fold_in(base_key, i), cfg, has_dropout)
            new_layer_caches.append(None)
        else:
            layer_cache = cache["layers"][i] if cache is not None else None
            x, new_c = decoder_layer_fwd(p, x, self_mask, enc_out, cross_mask, cfg, rngs,
                                         layer_cache, cache_index)
            new_layer_caches.append(new_c)

    new_cache = {"layers": tuple(new_layer_caches)} if cache is not None else None
    return x, new_cache


def lm_logits(params: Params, hidden: jax.Array) -> jax.Array:
    """Tied lm_head: hidden @ sharedᵀ + final_logits_bias (reference model :1997)."""
    w = params["shared"]["weight"].astype(hidden.dtype)
    logits = jnp.einsum("btd,vd->btv", hidden, w, preferred_element_type=jnp.float32)
    return logits + params["final_logits_bias"].astype(jnp.float32)


def bart_forward(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    decoder_input_ids: jax.Array,
    cfg: BartConfig,
    *,
    dropout_rng=None,
    dtype=jnp.float32,
    remat: bool = False,
) -> dict[str, jax.Array]:
    """Teacher-forced seq2seq forward → {"logits", "decoder_hidden", "encoder_hidden"}."""
    rng_e = rng_d = None
    if dropout_rng is not None:
        rng_e, rng_d = jax.random.split(dropout_rng)
    enc_out = encoder_fwd(params, input_ids, attention_mask, cfg,
                          dropout_rng=rng_e, dtype=dtype, remat=remat)
    dec_out, _ = decoder_fwd(params, decoder_input_ids, enc_out, attention_mask, cfg,
                             dropout_rng=rng_d, dtype=dtype, remat=remat)
    return {
        "logits": lm_logits(params, dec_out),
        "decoder_hidden": dec_out,
        "encoder_hidden": enc_out,
    }


# ---------------------------------------------------------------------------
# Decode-time cache
# ---------------------------------------------------------------------------

def init_cache(params: Params, batch: int, max_len: int, enc_out: jax.Array,
               cfg: BartConfig, dtype=jnp.float32) -> Params:
    """Pre-allocate self-attn KV and precompute cross-attn KV once per sequence
    (HF computes cross KV at step 0 and reuses; reference model :474-477)."""
    h = cfg.decoder_attention_heads
    hd = cfg.d_model // h
    from vacnic_tpu.models.layers import _split_heads  # local import to avoid cycle

    layers = []
    for p in params["decoder"]["layers"]:
        ck = _split_heads(linear(p["encoder_attn"]["k_proj"], enc_out), h)
        cv = _split_heads(linear(p["encoder_attn"]["v_proj"], enc_out), h)
        layers.append({
            "self": {
                "k": jnp.zeros((batch, h, max_len, hd), dtype),
                "v": jnp.zeros((batch, h, max_len, hd), dtype),
            },
            "cross": {"k": ck, "v": cv},
        })
    return {"layers": tuple(layers)}


# ---------------------------------------------------------------------------
# Label shifting
# ---------------------------------------------------------------------------

def shift_tokens_right(input_ids: jax.Array, pad_token_id: int, decoder_start_token_id: int) -> jax.Array:
    """Prepend decoder_start (the reference uses *eos* as decoder start,
    train...match.py:267) and drop the last token (train...match.py:196-209)."""
    shifted = jnp.roll(input_ids, 1, axis=-1)
    shifted = shifted.at[:, 0].set(decoder_start_token_id)
    return jnp.where(shifted == -100, pad_token_id, shifted)
