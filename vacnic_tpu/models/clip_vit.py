"""CLIP ViT vision tower, functional JAX.

Reimplements exactly what the reference's `extract_clip_img_feat`
(train...match.py:220-240) computes by manually unrolling OpenAI CLIP's
visual backbone: conv1 patchify → prepend class embedding → +positional →
ln_pre → pre-LN transformer (quick-gelu MLP) → ln_post applied separately to
the CLS token and to the patch tokens. Returns (patch_tokens, cls) — with
`prompt_mlp_type="clipcap"` only the CLS feeds the model
(train...match.py:280-283).

The trainer runs this under `torch.no_grad()` with CLIP frozen
(run_full_train.sh:26 --freeze_clip True); mirror that by wrapping the call
in `jax.lax.stop_gradient` at the train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vacnic_tpu.core.config import ClipVisionConfig
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


def clip_vision_init(key, cfg: ClipVisionConfig) -> Params:
    ks = jax.random.split(key, cfg.layers + 4)
    scale = cfg.width**-0.5
    p: Params = {
        "conv1": {
            "kernel": jax.random.normal(ks[0], (cfg.patch_size, cfg.patch_size, 3, cfg.width)) * scale
        },
        "class_embedding": jax.random.normal(ks[1], (cfg.width,)) * scale,
        "positional_embedding": jax.random.normal(ks[2], (cfg.num_patches + 1, cfg.width)) * scale,
        "ln_pre": layernorm_init(cfg.width),
        "ln_post": layernorm_init(cfg.width),
        "proj": jax.random.normal(ks[3], (cfg.width, cfg.output_dim)) * scale,
    }
    layers = []
    for i in range(cfg.layers):
        k1, k2, k3 = jax.random.split(ks[4 + i], 3)
        layers.append({
            "attn": mha_init(k1, cfg.width),
            "ln_1": layernorm_init(cfg.width),
            "ln_2": layernorm_init(cfg.width),
            "mlp": {
                "c_fc": linear_init(k2, cfg.width, cfg.width * 4),
                "c_proj": linear_init(k3, cfg.width * 4, cfg.width),
            },
        })
    p["layers"] = tuple(layers)
    return p


def _resblock(p: Params, x: jax.Array, heads: int) -> jax.Array:
    h, _ = mha(p["attn"], layernorm(p["ln_1"], x), num_heads=heads)
    x = x + h
    y = layernorm(p["ln_2"], x)
    y = linear(p["mlp"]["c_proj"], ACT2FN["quick_gelu"](linear(p["mlp"]["c_fc"], y)))
    return x + y


def clip_vision_fwd(
    params: Params, pixels: jax.Array, cfg: ClipVisionConfig, dtype=jnp.float32
) -> tuple[jax.Array, jax.Array]:
    """pixels [B, H, W, 3] (CLIP-normalized) → (patch_tokens [B, G², W], cls [B, W]).

    NHWC layout (TPU-native conv); weights_io converts torch NCHW conv kernels.
    """
    x = pixels.astype(dtype)
    x = jax.lax.conv_general_dilated(
        x,
        params["conv1"]["kernel"].astype(dtype),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [B, G, G, width]
    b = x.shape[0]
    x = x.reshape(b, -1, cfg.width)  # [B, G², width]
    cls_tok = jnp.broadcast_to(params["class_embedding"].astype(dtype), (b, 1, cfg.width))
    x = jnp.concatenate([cls_tok, x], axis=1)
    x = x + params["positional_embedding"].astype(dtype)[None]
    x = layernorm(params["ln_pre"], x)
    for p in params["layers"]:
        x = _resblock(p, x, cfg.heads)
    cls = layernorm(params["ln_post"], x[:, 0, :])
    patches = layernorm(params["ln_post"], x[:, 1:, :])
    return patches.astype(jnp.float32), cls.astype(jnp.float32)


def clip_image_embed(params: Params, pixels: jax.Array, cfg: ClipVisionConfig, dtype=jnp.float32) -> jax.Array:
    """CLS → joint-embedding projection (used by the CLIP retrieval scorer and
    the optional CLIP contrastive loss; OpenAI `visual.proj`)."""
    _, cls = clip_vision_fwd(params, pixels, cfg, dtype)
    return cls @ params["proj"].astype(jnp.float32)
