"""Multimodal BART: the VACNIC fusion encoder + vanilla decoder.

Rebuilds `BartForMultiModalGeneration` (reference
src/models/modeling_mmbart_...face_name_ids_crossattn.py:1877, and its
only-visual subset ...enc_self_crossattn.py) as one model with optional
streams — the reference's `only_image` flag already selects between the two
files' behaviors (SURVEY §2.2).

Per fusion layer (reference :568-762), with streams threaded layer-to-layer:

  img  : residual FFN (d→ffn_dim→d) + LN                        (:588-590, 646-653)
  face : residual FFN (d→3072→d) + LN                           (:607-609, 656-664)
  ner  : self-attn of name states over concat(face, name) KV     (:600-605, 667-679)
         then a length-compressing FFN 80→4·20→20 applied across
         the *length* dimension (transpose trick) + LN           (:595-598, 681-688)
  text : self-attn (+pad mask), then cross-attn with
         KV = concat(img_prompt, ner_prefix)   [add_ner_ffn]     (:611-616, 690-723)
         KV = img_prompt only                  [only_image]
  text : standard FFN + LN                                       (:738-744)

Mask families (reference :1262-1296):
  * attention_mask      — article pad mask, expanded additive.
  * face_name_mask      — concat(face_mask, name_mask) expanded to tgt=80.
  * img+ner cross mask  — all-ones over (prompt, ner_prefix), tgt=src_len
                          (ner_prefix positions are always visible: the
                          length-compression mixes padding anyway).

Deviation from the reference (documented, not a behavior the released config
exercises): with only_image=False and add_ner_ffn=False the reference builds a
cross-KV of concat(img, ner, text) but a mask covering only img+ner
(:666, :1296), which crashes at runtime in torch; here that path masks the
full KV correctly using the article pad mask for the text segment.
"""

from __future__ import annotations

import copy
from typing import Any

import jax
import jax.numpy as jnp

from vacnic_tpu.core.config import BartConfig, FusionConfig
from vacnic_tpu.models import bart as B
from vacnic_tpu.models.layers import (
    ACT2FN,
    Params,
    RngStream,
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


# ---------------------------------------------------------------------------
# Prompt mappers (reference :76-123)
# ---------------------------------------------------------------------------

def prompt_mlp_clipcap_init(key, img_size: int, prompt_size: int) -> Params:
    """ClipCap mapper: Linear(img→img·P/2) → Tanh → Linear(→img·P) (reference :111-123)."""
    k1, k2 = jax.random.split(key)
    mid = (img_size * prompt_size) // 2
    return {
        "prompt_fc1": linear_init(k1, img_size, mid),
        "prompt_fc2": linear_init(k2, mid, img_size * prompt_size),
    }


def prompt_mlp_clipcap_fwd(p: Params, cls_feat: jax.Array, img_size: int, prompt_size: int) -> jax.Array:
    """[B, img_size] → [B, prompt_size, img_size] (reshape at reference :1275-1276)."""
    h = jnp.tanh(linear(p["prompt_fc1"], cls_feat))
    h = linear(p["prompt_fc2"], h)
    return h.reshape(h.shape[0], prompt_size, img_size)


def prompt_mlp_patch_init(key, map_size: tuple[int, ...]) -> Params:
    """Non-clipcap mapper over patch tokens (reference MLP :76-108): linears over
    the *patch* dimension of transposed (B, hidden, n_patches)."""
    ks = jax.random.split(key, len(map_size) - 1)
    return {
        "stages": tuple(
            linear_init(ks[i], map_size[i], map_size[i + 1]) for i in range(len(map_size) - 1)
        )
    }


def prompt_mlp_patch_fwd(p: Params, patch_feat: jax.Array) -> jax.Array:
    """[B, n_patches, width] → [B, map_size[-1], width].

    NOTE: the reference uses a raw RESHAPE (B, width, n_patches), not a
    transpose (reference MLP.forward :96-107) — a memory reinterpretation
    that mixes patch and channel axes. Reproduced exactly (same trick as the
    NER length-compress FFN) so converted "mlp"-type checkpoints match."""
    b, n_patches, width = patch_feat.shape
    x = patch_feat.reshape(b, width, n_patches)
    n = len(p["stages"])
    for i, stage in enumerate(p["stages"]):
        x = linear(stage, x)
        if i < n - 1:
            x = jnp.tanh(x)
    return x.reshape(b, -1, width)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def fusion_encoder_layer_init(key, cfg: BartConfig, fcfg: FusionConfig, fused: bool) -> Params:
    """Vanilla encoder-layer params plus (if `fused`) the fusion members
    (reference :586-616). The reference allocates fusion params on every layer
    and leaves them unused off the fusion list; we allocate only where used."""
    p = B.encoder_layer_init(key, cfg)
    if not fused:
        return p
    ks = jax.random.split(jax.random.fold_in(key, 1), 8)
    p.update({
        "img_up": linear_init(ks[0], cfg.d_model, cfg.encoder_ffn_dim),
        "img_down": linear_init(ks[1], cfg.encoder_ffn_dim, cfg.d_model),
        "img_layer_norm": layernorm_init(cfg.d_model),
    })
    if not fcfg.only_image:
        p.update({
            "face_up": linear_init(ks[2], cfg.d_model, 3072),
            "face_down": linear_init(ks[3], 3072, cfg.d_model),
            "face_layer_norm": layernorm_init(cfg.d_model),
            "self_attn_img_name": mha_init(ks[4], cfg.d_model),
            "img_name_attn_layer_norm": layernorm_init(cfg.d_model),
            "ner_map_up": linear_init(ks[5], fcfg.max_ner_type_len, 4 * fcfg.max_ner_type_len_gt),
            "ner_map_down": linear_init(ks[6], 4 * fcfg.max_ner_type_len_gt, fcfg.max_ner_type_len_gt),
            "ner_map_layer_norm": layernorm_init(cfg.d_model),
        })
    # cross_attn_img_ner exists in both the full and only-visual variants
    p.update({
        "cross_attn_img_ner": mha_init(ks[7], cfg.d_model),
        "img_ner_attn_layer_norm": layernorm_init(cfg.d_model),
    })
    return p


def multimodal_bart_init(key, cfg: BartConfig, fcfg: FusionConfig) -> Params:
    """Extends the vanilla BART tree with the fusion encoder members
    (reference BartEncoder.__init__ modifications :1131-1166)."""
    params = B.bart_init(key, cfg)
    enc = params["encoder"]
    ks = jax.random.split(jax.random.fold_in(key, 99), 6)

    fused_set = set(fcfg.fusion_layers)
    enc["layers"] = tuple(
        fusion_encoder_layer_init(jax.random.fold_in(ks[0], i), cfg, fcfg, i in fused_set)
        for i in range(cfg.encoder_layers)
    )

    if fcfg.prompt_mlp_type == "clipcap":
        enc["prompt_mlp"] = prompt_mlp_clipcap_init(ks[1], fcfg.img_size, fcfg.prompt_size)
    else:
        enc["prompt_mlp"] = prompt_mlp_patch_init(ks[1], fcfg.map_size)

    if cfg.d_model == 1024:
        enc["visual_map"] = linear_init(ks[2], 768, 1024)  # reference :1143-1144

    if not fcfg.only_image:
        # Separate NER embedding table seeded from shared[:50265] (reference
        # :1150-1151), deep-copied positional table + LN (:1153-1155).
        ner_w = embedding_init(ks[3], fcfg.ner_vocab_size, cfg.d_model)["weight"]
        shared_w = params["shared"]["weight"]
        n_seed = min(shared_w.shape[0], fcfg.ner_vocab_size, 50265)
        ner_w = ner_w.at[:n_seed].set(shared_w[:n_seed])
        enc["embed_tokens_ner"] = {"weight": ner_w}
        enc["embed_positions_ner"] = copy.deepcopy(enc["embed_positions"])
        enc["layernorm_embedding_ner"] = layernorm_init(cfg.d_model)
        enc["face_proj"] = linear_init(ks[4], fcfg.face_feature_dim, fcfg.dim_common)  # _linear_1 :1162

    if fcfg.init_attn_weight:
        params = tie_fusion_attn_weights(params, fcfg)
    return params


def tie_fusion_attn_weights(params: Params, fcfg: FusionConfig) -> Params:
    """Tie each fused layer's fusion attentions to its CURRENT self_attn
    (init_attn_weight_encoder, reference :1858-1869). Applied at init, and
    re-applied after pretrained BART weights are merged in (cli --init-bart):
    the tie must copy the pretrained self_attn, not the random init it would
    otherwise have captured."""
    enc = params["encoder"]
    layers = list(enc["layers"])
    for i in set(fcfg.fusion_layers):
        if i >= len(layers):
            continue
        lp = dict(layers[i])
        lp["cross_attn_img_ner"] = copy.deepcopy(lp["self_attn"])
        if not fcfg.only_image and "self_attn_img_name" in lp:
            lp["self_attn_img_name"] = copy.deepcopy(lp["self_attn"])
        layers[i] = lp
    enc["layers"] = tuple(layers)
    return params


# ---------------------------------------------------------------------------
# Fusion encoder layer forward
# ---------------------------------------------------------------------------

def _residual_ffn(up: Params, down: Params, ln: Params, x, act, cfg, rngs: RngStream):
    residual = x
    h = act(ckpt_name(linear(up, x), "ffn_pre"))
    h = dropout(h, cfg.activation_dropout, rngs.next())
    h = linear(down, h)
    h = dropout(h, cfg.dropout, rngs.next())
    return layernorm(ln, residual + h)


def fusion_encoder_layer_fwd(
    p: Params,
    x: jax.Array,
    attn_mask: jax.Array,
    streams: dict[str, Any],
    masks: dict[str, Any],
    cfg: BartConfig,
    fcfg: FusionConfig,
    rngs: RngStream,
    fused: bool,
    add_ner_ffn: bool = True,
) -> tuple[jax.Array, dict[str, Any]]:
    """One encoder layer; `streams` = {"img", "face", "ner"} hidden states
    threaded between layers (reference returns them per layer :752-762)."""
    act = ACT2FN[cfg.activation_function]

    if not fused:
        x = B.encoder_layer_fwd(p, x, attn_mask, cfg, rngs)
        return x, streams

    img = _residual_ffn(p["img_up"], p["img_down"], p["img_layer_norm"],
                        streams["img"], act, cfg, rngs)
    face = streams.get("face")
    ner = streams.get("ner")

    if not fcfg.only_image:
        face = _residual_ffn(p["face_up"], p["face_down"], p["face_layer_norm"],
                             face, act, cfg, rngs)
        if add_ner_ffn:
            # name states attend over concat(face, name) (reference :667-679)
            residual = ner
            fn_kv = jnp.concatenate([face, ner], axis=1)
            h, _ = mha(p["self_attn_img_name"], ner, key_value=fn_kv,
                       mask=masks["face_name"], num_heads=cfg.encoder_attention_heads)
            ner = layernorm(p["img_name_attn_layer_norm"], residual + h)

            # length-compressing NER-prefix FFN across the length dim (:681-688)
            bsz, ner_len, d = ner.shape
            t = ner.reshape(bsz, d, ner_len)  # reference reshapes, not transposes
            t = act(linear(p["ner_map_up"], t))
            t = dropout(t, cfg.activation_dropout, rngs.next())
            t = linear(p["ner_map_down"], t)
            t = dropout(t, cfg.dropout, rngs.next())
            ner_prefix = t.reshape(bsz, fcfg.max_ner_type_len_gt, d)
            ner_prefix = layernorm(p["ner_map_layer_norm"], ner_prefix)
            kv = jnp.concatenate([img, ner_prefix], axis=1)
            cross_mask = masks["img_ner"]
        else:
            kv = jnp.concatenate([img, ner, x], axis=1)
            cross_mask = masks["img_ner_text"]
    else:
        kv = img
        cross_mask = masks["img_ner"]

    # text self-attention (reference :697-707)
    residual = x
    h, _ = mha(p["self_attn"], x, mask=attn_mask, num_heads=cfg.encoder_attention_heads)
    h = dropout(h, cfg.dropout, rngs.next())
    x = layernorm(p["self_attn_layer_norm"], residual + h)

    # cross-attention to the multimodal KV (reference :710-723)
    residual = x
    h, _ = mha(p["cross_attn_img_ner"], x, key_value=kv, mask=cross_mask,
               num_heads=cfg.encoder_attention_heads)
    h = dropout(h, cfg.dropout, rngs.next())
    x = layernorm(p["img_ner_attn_layer_norm"], residual + h)

    # standard FFN (reference :738-744)
    x = _residual_ffn(p["fc1"], p["fc2"], p["final_layer_norm"], x, act, cfg, rngs)

    return x, {"img": img, "face": face, "ner": ner}


# ---------------------------------------------------------------------------
# Multimodal encoder forward
# ---------------------------------------------------------------------------

def embed_ner_stream(enc: Params, name_ids: jax.Array, cfg: BartConfig,
                     rngs: RngStream, dtype) -> jax.Array:
    """NER stream embedding: separate table + positions + LN + dropout
    (reference :1253-1260). Also reused no-grad by `get_embedding_ner`
    (train...match.py:112-133)."""
    return B.embed_and_norm(enc["embed_tokens_ner"], enc["embed_positions_ner"],
                            enc["layernorm_embedding_ner"], name_ids, cfg, rngs, dtype)


def map_image_prompt(enc: Params, image_features: jax.Array, cfg: BartConfig,
                     fcfg: FusionConfig) -> jax.Array:
    """CLIP features → prompt tokens [B, P, d_model] (reference :1272-1278)."""
    if fcfg.prompt_mlp_type == "clipcap":
        img = prompt_mlp_clipcap_fwd(enc["prompt_mlp"], image_features, fcfg.img_size, fcfg.prompt_size)
    else:
        img = prompt_mlp_patch_fwd(enc["prompt_mlp"], image_features)
    if cfg.d_model == 1024:
        img = linear(enc["visual_map"], img)
    return img


def extract_visual_prompt(params: Params, image_features: jax.Array,
                          cfg: BartConfig, fcfg: FusionConfig) -> jax.Array:
    """`extract_visual_prompt` (train...match.py:562-569): no-grad prompt-MLP
    mapping of CLIP features — clipcap reshape to [B, P, 768] then
    `visual_map` when d_model==1024 — for prompt-representation analysis
    outside the encoder."""
    return jax.lax.stop_gradient(
        map_image_prompt(params["encoder"], image_features, cfg, fcfg))


def mm_encoder_fwd(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    image_features: jax.Array,
    cfg: BartConfig,
    fcfg: FusionConfig,
    *,
    face_features: jax.Array | None = None,
    face_mask: jax.Array | None = None,
    name_ids: jax.Array | None = None,
    name_mask: jax.Array | None = None,
    add_ner_ffn: bool = True,
    dropout_rng=None,
    dtype=jnp.float32,
    remat: bool = False,
) -> dict[str, jax.Array]:
    """Modified BartEncoder.forward (reference :1172-1381).

    Returns {"last_hidden", "img", "ner", "face"} — the extended
    BaseModelOutput fields `hidden_states_img/ner/face` (reference :1379-1381).
    """
    rngs = RngStream(dropout_rng)
    enc = params["encoder"]
    src_len = input_ids.shape[-1]

    x = B.embed_and_norm(params["shared"], enc["embed_positions"], enc["layernorm_embedding"],
                         input_ids, cfg, rngs, dtype)

    masks: dict[str, Any] = {}
    streams: dict[str, Any] = {}

    if not fcfg.only_image:
        ner = embed_ner_stream(enc, name_ids, cfg, rngs, dtype)
        face = linear(enc["face_proj"], face_features.astype(dtype))
        streams["ner"], streams["face"] = ner, face
        if add_ner_ffn:
            fn_mask = jnp.concatenate([face_mask, name_mask], axis=1)
            masks["face_name"] = expand_mask(fn_mask, fcfg.max_ner_type_len, dtype)
        # add_ner_ffn=False: the reference also builds a name-only mask here
        # (:1262-1266) but no layer consumes it on that path (the name-face
        # attention block is ffn-gated, :667-679) — we skip the dead compute.
        prompt_len = fcfg.prompt_size if fcfg.prompt_mlp_type == "clipcap" else fcfg.map_size[-1]
        ones = jnp.ones((input_ids.shape[0], prompt_len + fcfg.max_ner_type_len_gt), dtype)
        masks["img_ner"] = expand_mask(ones, src_len, dtype)
        # corrected add_ner_ffn=False mask: img+ner always visible, text by pad mask
        ones_in = jnp.ones((input_ids.shape[0], prompt_len + name_ids.shape[-1]), dtype)
        masks["img_ner_text"] = expand_mask(
            jnp.concatenate([ones_in, attention_mask.astype(dtype)], axis=1), src_len, dtype
        )
    else:
        prompt_len = fcfg.prompt_size if fcfg.prompt_mlp_type == "clipcap" else fcfg.map_size[-1]
        ones = jnp.ones((input_ids.shape[0], prompt_len), dtype)
        masks["img_ner"] = expand_mask(ones, src_len, dtype)

    streams["img"] = map_image_prompt(enc, image_features, cfg, fcfg).astype(dtype)
    attn_mask = expand_mask(attention_mask, dtype=dtype)

    fused_set = set(fcfg.fusion_layers)
    has_dropout = dropout_rng is not None
    base_key = dropout_rng if has_dropout else jax.random.PRNGKey(0)

    def layer_fn(p, x, attn_mask, streams, masks, key, cfg, fcfg, fused, add_ner, has_do):
        rs = RngStream(key if has_do else None)
        return fusion_encoder_layer_fwd(p, x, attn_mask, streams, masks, cfg, fcfg, rs,
                                        fused, add_ner)

    layer = B.checkpoint(layer_fn, static_argnums=(6, 7, 8, 9, 10)) if remat else layer_fn

    for i, p in enumerate(enc["layers"]):
        x, streams = layer(p, x, attn_mask, streams, masks, jax.random.fold_in(base_key, i),
                           cfg, fcfg, i in fused_set, add_ner_ffn, has_dropout)

    return {
        "last_hidden": x,
        "img": streams.get("img"),
        "ner": streams.get("ner"),
        "face": streams.get("face"),
    }


def _enc_plan_from_env():
    """EncPlan with on-chip sweep overrides (ENC_NSELF / ENC_NFFN /
    ENC_VMEM), defaulting to the measured-best configuration."""
    import os as _os

    from vacnic_tpu.kernels.encoder_stack import EncPlan

    base = EncPlan()
    return base._replace(
        n_self=int(_os.environ.get("ENC_NSELF", base.n_self)),
        n_ffn=int(_os.environ.get("ENC_NFFN", base.n_ffn)),
        vmem_mb=int(_os.environ.get("ENC_VMEM", base.vmem_mb)),
        fuse_ffn=bool(int(_os.environ.get("ENC_FUSE", int(base.fuse_ffn)))),
    )


def fused_encoder_eligible(fcfg: FusionConfig, cfg: BartConfig,
                           add_ner_ffn: bool, dropout_rng) -> bool:
    """The fused Pallas encoder handles the released configurations: every
    layer fused, deterministic (no dropout), and a precomputable cross KV —
    add_ner_ffn=True (kv = img+ner_prefix) or only_image (kv = img). The
    add_ner_ffn=False variant puts x itself in the KV and stays on XLA."""
    return (
        dropout_rng is None
        and set(fcfg.fusion_layers) == set(range(cfg.encoder_layers))
        and (fcfg.only_image or add_ner_ffn)
    )


def _fused_encoder_prologue(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    image_features: jax.Array,
    cfg: BartConfig,
    fcfg: FusionConfig,
    *,
    face_features: jax.Array | None = None,
    face_mask: jax.Array | None = None,
    name_ids: jax.Array | None = None,
    name_mask: jax.Array | None = None,
    add_ner_ffn: bool = True,
    dtype=jnp.float32,
    interpret: bool = False,
):
    """The fused encoder's XLA prologue: token embed, sequential stream
    evolution, batched ner_map + cross-K/V projections, stacked text-path
    weights, pad biases. Split out so scripts/bench_encoder_parts.py
    ENC_MODE=glue can time the non-kernel share in isolation. Returns
    (x, sp, cross_k, cross_v, self_bias, cross_bias, streams_dict)."""
    from vacnic_tpu.kernels.encoder_stack import EncStackParams

    assert fused_encoder_eligible(fcfg, cfg, add_ner_ffn, None)
    rngs = RngStream(None)
    act = ACT2FN[cfg.activation_function]
    enc = params["encoder"]
    layers = enc["layers"]

    x = B.embed_and_norm(params["shared"], enc["embed_positions"],
                         enc["layernorm_embedding"], input_ids, cfg, rngs, dtype)

    # ---- stream loop (mirrors fusion_encoder_layer_fwd's stream section) ---
    img = map_image_prompt(enc, image_features, cfg, fcfg).astype(dtype)
    face = ner = None
    fn_mask_bias = None
    if not fcfg.only_image:
        ner = embed_ner_stream(enc, name_ids, cfg, rngs, dtype)
        face = linear(enc["face_proj"], face_features.astype(dtype))
        fn_mask = jnp.concatenate([face_mask, name_mask], axis=1)
        fn_mask_bias = expand_mask(fn_mask, fcfg.max_ner_type_len, dtype)

    def st(*path):
        def leaf(p):
            o = p
            for k in path:
                o = o[k]
            return o

        return jnp.stack([leaf(p) for p in layers])

    def ln_batched(name, t):
        """layernorm with per-layer params over stacked [L, B, N, d]."""
        g = st(name, "scale").astype(jnp.float32)
        b = st(name, "bias").astype(jnp.float32)
        tf = t.astype(jnp.float32)
        mu = jnp.mean(tf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(tf - mu), axis=-1, keepdims=True)
        y = (tf - mu) * jax.lax.rsqrt(var + 1e-5)
        return (y * g[:, None, None, :] + b[:, None, None, :]).astype(t.dtype)

    def linear_batched(t, kern, bias):
        """[L, B, N, din] @ [L, din, dout] + [L, dout] with linear()'s
        f32-accumulate/cast recipe."""
        y = jnp.einsum("lbnd,lde->lbne", t, kern.astype(t.dtype),
                       preferred_element_type=jnp.float32)
        return (y + bias.astype(jnp.float32)[:, None, None, :]).astype(t.dtype)

    # The per-layer stream EVOLUTION is sequential (img/face/ner feed the
    # next layer), but ner_map + the cross K/V projections are pure
    # per-layer epilogue — batched below over all L as single einsums
    # instead of 12 groups of small ops (the stream precompute measured
    # ~15.5 ms of the 90.9 ms b32 fused-encoder forward).
    img_states, ner_states = [], []
    for p in layers:
        img = _residual_ffn(p["img_up"], p["img_down"], p["img_layer_norm"],
                            img, act, cfg, rngs)
        if not fcfg.only_image:
            face = _residual_ffn(p["face_up"], p["face_down"], p["face_layer_norm"],
                                 face, act, cfg, rngs)
            residual = ner
            fn_kv = jnp.concatenate([face, ner], axis=1)
            h, _ = mha(p["self_attn_img_name"], ner, key_value=fn_kv,
                       mask=fn_mask_bias, num_heads=cfg.encoder_attention_heads)
            ner = layernorm(p["img_name_attn_layer_norm"], residual + h)
            ner_states.append(ner)
        img_states.append(img)

    img_stack = jnp.stack(img_states)  # [L, B, P, d]
    if fcfg.only_image:
        kv = img_stack
    else:
        ner_stack = jnp.stack(ner_states)  # [L, B, N, d]
        nL, bsz, ner_len, d = ner_stack.shape
        # the reference's raw .reshape quirk (model :595-598) preserved
        t = ner_stack.reshape(nL, bsz, d, ner_len)
        t = act(linear_batched(t, st("ner_map_up", "kernel"),
                               st("ner_map_up", "bias")))
        t = linear_batched(t, st("ner_map_down", "kernel"),
                           st("ner_map_down", "bias"))
        ner_prefix = t.reshape(nL, bsz, fcfg.max_ner_type_len_gt, d)
        ner_prefix = ln_batched("ner_map_layer_norm", ner_prefix)
        kv = jnp.concatenate([img_stack, ner_prefix], axis=2)  # [L, B, KV, d]

    # project through each layer's cross k/v (biases folded in) so the
    # kernel consumes ready K/V, like the decode path's cross cache;
    # K pre-transposed to [L, B, d, KV] — the kernel's lane-aligned
    # contraction layout (matches the decode path's cross-cache convention)
    cross_k = linear_batched(kv, st("cross_attn_img_ner", "k_proj", "kernel"),
                             st("cross_attn_img_ner", "k_proj", "bias")
                             ).transpose(0, 1, 3, 2)
    cross_v = linear_batched(kv, st("cross_attn_img_ner", "v_proj", "kernel"),
                             st("cross_attn_img_ner", "v_proj", "bias"))

    # ---- stacked text-path weights ----------------------------------------
    wd = jnp.bfloat16 if jax.default_backend() != "cpu" and not interpret else jnp.float32

    def ln2(name):
        return jnp.stack([jnp.stack([p[name]["scale"], p[name]["bias"]])
                          for p in layers]).astype(jnp.float32)

    sp = EncStackParams(
        w_qkv=jnp.concatenate([st("self_attn", "q_proj", "kernel"),
                               st("self_attn", "k_proj", "kernel"),
                               st("self_attn", "v_proj", "kernel")], axis=-1).astype(wd),
        b_qkv=jnp.concatenate([st("self_attn", "q_proj", "bias"),
                               st("self_attn", "k_proj", "bias"),
                               st("self_attn", "v_proj", "bias")], axis=-1)[:, None, :]
        .astype(jnp.float32),
        w_so=st("self_attn", "out_proj", "kernel").astype(wd),
        b_so=st("self_attn", "out_proj", "bias")[:, None, :].astype(jnp.float32),
        ln_s=ln2("self_attn_layer_norm"),
        w_cq=st("cross_attn_img_ner", "q_proj", "kernel").astype(wd),
        b_cq=st("cross_attn_img_ner", "q_proj", "bias")[:, None, :].astype(jnp.float32),
        w_co=st("cross_attn_img_ner", "out_proj", "kernel").astype(wd),
        b_co=st("cross_attn_img_ner", "out_proj", "bias")[:, None, :].astype(jnp.float32),
        ln_c=ln2("img_ner_attn_layer_norm"),
        w_fc1=st("fc1", "kernel").astype(wd),
        b_fc1=st("fc1", "bias")[:, None, :].astype(jnp.float32),
        w_fc2=st("fc2", "kernel").astype(wd),
        b_fc2=st("fc2", "bias")[:, None, :].astype(jnp.float32),
        ln_f=ln2("final_layer_norm"),
    )

    neg = jnp.finfo(jnp.float32).min
    self_bias = (1.0 - attention_mask.astype(jnp.float32)) * neg  # [B, S]
    cross_bias = jnp.zeros((input_ids.shape[0], cross_v.shape[2]), jnp.float32)
    streams_out = {"img": img, "ner": ner, "face": face}
    return x, sp, cross_k, cross_v, self_bias, cross_bias, streams_out


def mm_encoder_fwd_fused(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    image_features: jax.Array,
    cfg: BartConfig,
    fcfg: FusionConfig,
    *,
    face_features: jax.Array | None = None,
    face_mask: jax.Array | None = None,
    name_ids: jax.Array | None = None,
    name_mask: jax.Array | None = None,
    add_ner_ffn: bool = True,
    dtype=jnp.float32,
    interpret: bool = False,
    max_kernel_batch: int = 32,
) -> dict[str, jax.Array]:
    """mm_encoder_fwd with the TEXT path fused into one Pallas kernel
    (kernels/encoder_stack). The fusion streams evolve independently of the
    text states, so they (and each layer's projected cross K/V over
    concat(img, ner_prefix)) are precomputed in XLA
    (_fused_encoder_prologue), then the kernel runs all layers' self-attn +
    cross-attn + FFN with the activations VMEM-resident. Inference-only (no
    dropout); numerics match mm_encoder_fwd to bf16 tolerance
    (tests/test_encoder_stack.py)."""
    from vacnic_tpu.kernels.encoder_stack import encoder_text_stack

    x, sp, cross_k, cross_v, self_bias, cross_bias, streams_out = \
        _fused_encoder_prologue(
            params, input_ids, attention_mask, image_features, cfg, fcfg,
            face_features=face_features, face_mask=face_mask,
            name_ids=name_ids, name_mask=name_mask, add_ner_ffn=add_ner_ffn,
            dtype=dtype, interpret=interpret)

    # the kernel keeps the whole [Bk, S, d] activation VMEM-resident, which
    # caps the per-call batch (~32 at bart-large: 33.5 MB scratch; batch 128
    # would need 134 MB) — larger batches run the kernel over slices
    # (the encoder is batch-parallel)
    bsz = input_ids.shape[0]
    mk = max_kernel_batch
    plan = _enc_plan_from_env()
    if bsz <= mk:
        last = encoder_text_stack(sp, x, cross_k, cross_v, self_bias,
                                  cross_bias, cfg, plan=plan, interpret=interpret)
    else:
        n_slices = -(-bsz // mk)
        outs = []
        for i in range(n_slices):
            sl = slice(i * mk, min((i + 1) * mk, bsz))
            outs.append(encoder_text_stack(
                sp, x[sl], cross_k[:, sl], cross_v[:, sl], self_bias[sl],
                cross_bias[sl], cfg, plan=plan, interpret=interpret))
        last = jnp.concatenate(outs, axis=0)
    return {"last_hidden": last, **streams_out}


# ---------------------------------------------------------------------------
# Full model forward
# ---------------------------------------------------------------------------

def mm_forward(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    decoder_input_ids: jax.Array,
    image_features: jax.Array,
    cfg: BartConfig,
    fcfg: FusionConfig,
    *,
    face_features=None,
    face_mask=None,
    name_ids=None,
    name_mask=None,
    add_ner_ffn: bool = True,
    dropout_rng=None,
    dtype=jnp.float32,
    remat: bool = False,
    allow_fused_encoder: bool = True,
) -> dict[str, jax.Array]:
    """BartForMultiModalGeneration.forward (reference :1929-2021):
    multimodal encoder → vanilla decoder → tied lm_head + final_logits_bias.

    allow_fused_encoder=False forces the XLA encoder even in eval mode —
    required when this forward is DIFFERENTIATED with dropout_rng=None
    (gradient checks, saliency, no-dropout fine-tunes): the fused Pallas
    encoder has no VJP, so jax.grad through the default eval path would
    fail on accelerator backends."""
    import os as _os

    rng_e = rng_d = None
    if dropout_rng is not None:
        rng_e, rng_d = jax.random.split(dropout_rng)
    # deterministic eval-mode forward (no dropout, no grads needed — the
    # kernel has no VJP) uses the fused Pallas encoder on accelerator
    # backends: the teacher-forced val loop gets the same speedup as
    # generation (VERDICT r2 #4, eval-mode first)
    use_fused = (
        allow_fused_encoder
        and dropout_rng is None and not remat
        and jax.default_backend() != "cpu"
        and _os.environ.get("VACNIC_PALLAS_ENCODER", "1") == "1"
        and fused_encoder_eligible(fcfg, cfg, add_ner_ffn, None)
    )
    enc_fwd = mm_encoder_fwd_fused if use_fused else mm_encoder_fwd
    enc_kwargs = {} if use_fused else dict(dropout_rng=rng_e, remat=remat)
    enc_out = enc_fwd(
        params, input_ids, attention_mask, image_features, cfg, fcfg,
        face_features=face_features, face_mask=face_mask,
        name_ids=name_ids, name_mask=name_mask, add_ner_ffn=add_ner_ffn,
        dtype=dtype, **enc_kwargs,
    )
    dec_out, _ = B.decoder_fwd(params, decoder_input_ids, enc_out["last_hidden"],
                               attention_mask, cfg, dropout_rng=rng_d, dtype=dtype, remat=remat)
    return {
        "logits": B.lm_logits(params, dec_out),
        "decoder_hidden": dec_out,
        "encoder_hidden": enc_out["last_hidden"],
        "hidden_states_img": enc_out["img"],
        "hidden_states_ner": enc_out["ner"],
        "hidden_states_face": enc_out["face"],
    }
