"""CLIP text tower — needed by the CLIP retrieval scorer (the pipeline stage
absent from the reference snapshot, SURVEY §0.1: scores article sentences
against the image and writes `sents_byclip`) and by the optional CLIP
contrastive loss (train...match.py:312-321).

Matches OpenAI CLIP's text encoder: token embedding → +positional → causal
pre-LN transformer (quick-gelu MLP) → ln_final → features at each sequence's
argmax (EOT) token → text projection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vacnic_tpu.models.layers import (
    ACT2FN,
    Params,
    layernorm,
    layernorm_init,
    linear,
    linear_init,
    mha,
    mha_init,
)


def clip_text_init(key, vocab_size: int = 49408, context_length: int = 77,
                   width: int = 512, layers: int = 12, heads: int = 8,
                   output_dim: int = 512) -> Params:
    ks = jax.random.split(key, layers + 4)
    p: Params = {
        "token_embedding": {"weight": jax.random.normal(ks[0], (vocab_size, width)) * 0.02},
        "positional_embedding": jax.random.normal(ks[1], (context_length, width)) * 0.01,
        "ln_final": layernorm_init(width),
        "text_projection": jax.random.normal(ks[2], (width, output_dim)) * width**-0.5,
        "logit_scale": jnp.asarray(jnp.log(1 / 0.07), jnp.float32),
        "heads": heads,
    }
    lyrs = []
    for i in range(layers):
        k1, k2, k3 = jax.random.split(ks[3 + i], 3)
        lyrs.append({
            "attn": mha_init(k1, width),
            "ln_1": layernorm_init(width),
            "ln_2": layernorm_init(width),
            "mlp": {
                "c_fc": linear_init(k2, width, width * 4),
                "c_proj": linear_init(k3, width * 4, width),
            },
        })
    p["layers"] = tuple(lyrs)
    return p


def convert_clip_text_openai(sd, layers: int = 12, heads: int = 8) -> Params:
    """OpenAI CLIP full-model state dict → text-tower tree."""
    from vacnic_tpu.models.weights_io import _layernorm, _linear, _t

    p: Params = {
        "token_embedding": {"weight": jnp.asarray(_t(sd["token_embedding.weight"]))},
        "positional_embedding": jnp.asarray(_t(sd["positional_embedding"])),
        "ln_final": _layernorm(sd, "ln_final"),
        "text_projection": jnp.asarray(_t(sd["text_projection"])),
        "logit_scale": jnp.asarray(_t(sd["logit_scale"])),
        "heads": heads,
    }
    lyrs = []
    for i in range(layers):
        pre = f"transformer.resblocks.{i}"
        in_w = _t(sd[f"{pre}.attn.in_proj_weight"])
        in_b = _t(sd[f"{pre}.attn.in_proj_bias"])
        d = in_w.shape[1]
        qw, kw, vw = in_w[:d], in_w[d : 2 * d], in_w[2 * d :]
        qb, kb, vb = in_b[:d], in_b[d : 2 * d], in_b[2 * d :]
        lyrs.append({
            "attn": {
                "q_proj": {"kernel": jnp.asarray(qw.T), "bias": jnp.asarray(qb)},
                "k_proj": {"kernel": jnp.asarray(kw.T), "bias": jnp.asarray(kb)},
                "v_proj": {"kernel": jnp.asarray(vw.T), "bias": jnp.asarray(vb)},
                "out_proj": _linear(sd, f"{pre}.attn.out_proj"),
            },
            "ln_1": _layernorm(sd, f"{pre}.ln_1"),
            "ln_2": _layernorm(sd, f"{pre}.ln_2"),
            "mlp": {
                "c_fc": _linear(sd, f"{pre}.mlp.c_fc"),
                "c_proj": _linear(sd, f"{pre}.mlp.c_proj"),
            },
        })
    p["layers"] = tuple(lyrs)
    return p


def clip_text_fwd(params: Params, token_ids: jax.Array, dtype=jnp.float32,
                  num_heads: int | None = None) -> jax.Array:
    """[B, 77] CLIP-BPE ids → [B, output_dim] normalized-projection-ready embeds.

    `num_heads` must be passed explicitly when `params` flows through a jit
    boundary (the "heads" leaf is traced there and can't be read as a python
    int); un-jitted callers (the retrieval scorer) may rely on the stored leaf.
    """
    heads = num_heads if num_heads is not None else int(params["heads"])
    x = jnp.take(params["token_embedding"]["weight"], token_ids, axis=0).astype(dtype)
    t = x.shape[1]
    x = x + params["positional_embedding"][:t].astype(dtype)[None]
    causal = jnp.triu(jnp.full((t, t), jnp.finfo(jnp.float32).min), k=1)[None, None]
    for p in params["layers"]:
        h, _ = mha(p["attn"], layernorm(p["ln_1"], x), mask=causal, num_heads=heads)
        x = x + h
        y = layernorm(p["ln_2"], x)
        x = x + linear(p["mlp"]["c_proj"], ACT2FN["quick_gelu"](linear(p["mlp"]["c_fc"], y)))
    x = layernorm(params["ln_final"], x)
    # EOT token = highest id in each row (OpenAI convention)
    eot = jnp.argmax(token_ids, axis=-1)
    feats = x[jnp.arange(x.shape[0]), eot]
    return (feats @ params["text_projection"].astype(dtype)).astype(jnp.float32)
