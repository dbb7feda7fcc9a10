"""Checkpoint conversion: HF BART / CLIP torch state dicts → JAX pytrees.

The reference loads `patrickvonplaten/bart-large-fp32` via HF
`from_pretrained` (train...match.py:743) and OpenAI `clip.load("ViT-B/16")`
(train...match.py:736); this module maps either state-dict layout onto the
param trees defined in models/bart.py / models/clip_vit.py / models/fusion.py.
Torch (out, in) kernels are transposed to JAX (in, out).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np
import jax.numpy as jnp

from vacnic_tpu.core.config import BartConfig, ClipVisionConfig, FusionConfig

Params = dict[str, Any]


def _t(x) -> np.ndarray:
    """torch tensor / ndarray → float32 ndarray (detached)."""
    if hasattr(x, "detach"):
        x = x.detach().float().cpu().numpy()  # .float() handles torch bf16/fp16
    return np.asarray(x, dtype=np.float32)


def load_state_dict(path: str) -> dict[str, Any]:
    """Load a checkpoint file into a flat state dict: supports HF safetensors
    (model.safetensors), torch .bin/.pt (pytorch_model.bin,
    the reference's pickled `torch.save(model)` checkpoints — in that case the
    module's state_dict is extracted), or a directory containing either."""
    import os

    if os.path.isdir(path):
        for name in ("model.safetensors", "pytorch_model.bin"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
        else:
            raise FileNotFoundError(f"no checkpoint file in {path}")
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(path, framework="numpy") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):  # whole pickled module (reference format)
        obj = obj.state_dict()
    return obj


def _linear(sd: Mapping[str, Any], prefix: str) -> Params:
    p = {"kernel": jnp.asarray(_t(sd[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in sd:
        p["bias"] = jnp.asarray(_t(sd[f"{prefix}.bias"]))
    return p


def _layernorm(sd: Mapping[str, Any], prefix: str) -> Params:
    return {
        "scale": jnp.asarray(_t(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(_t(sd[f"{prefix}.bias"])),
    }


def _embedding(sd: Mapping[str, Any], key: str) -> Params:
    return {"weight": jnp.asarray(_t(sd[key]))}


def _mha(sd: Mapping[str, Any], prefix: str) -> Params:
    return {name: _linear(sd, f"{prefix}.{name}") for name in ("q_proj", "k_proj", "v_proj", "out_proj")}


# ---------------------------------------------------------------------------
# BART
# ---------------------------------------------------------------------------

def _bart_encoder_layer(sd, prefix: str) -> Params:
    return {
        "self_attn": _mha(sd, f"{prefix}.self_attn"),
        "self_attn_layer_norm": _layernorm(sd, f"{prefix}.self_attn_layer_norm"),
        "fc1": _linear(sd, f"{prefix}.fc1"),
        "fc2": _linear(sd, f"{prefix}.fc2"),
        "final_layer_norm": _layernorm(sd, f"{prefix}.final_layer_norm"),
    }


def _bart_decoder_layer(sd, prefix: str) -> Params:
    return {
        "self_attn": _mha(sd, f"{prefix}.self_attn"),
        "self_attn_layer_norm": _layernorm(sd, f"{prefix}.self_attn_layer_norm"),
        "encoder_attn": _mha(sd, f"{prefix}.encoder_attn"),
        "encoder_attn_layer_norm": _layernorm(sd, f"{prefix}.encoder_attn_layer_norm"),
        "fc1": _linear(sd, f"{prefix}.fc1"),
        "fc2": _linear(sd, f"{prefix}.fc2"),
        "final_layer_norm": _layernorm(sd, f"{prefix}.final_layer_norm"),
    }


def convert_bart(sd: Mapping[str, Any], cfg: BartConfig) -> Params:
    """HF `BartForConditionalGeneration.state_dict()` → models/bart.py tree.

    Accepts both `model.`-prefixed (ForConditionalGeneration) and bare
    (BartModel) key layouts.
    """
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")} | {
            k: v for k, v in sd.items() if not k.startswith("model.")
        }
    params: Params = {
        "shared": _embedding(sd, "shared.weight"),
        "encoder": {
            "embed_positions": _embedding(sd, "encoder.embed_positions.weight"),
            "layernorm_embedding": _layernorm(sd, "encoder.layernorm_embedding"),
            "layers": tuple(
                _bart_encoder_layer(sd, f"encoder.layers.{i}") for i in range(cfg.encoder_layers)
            ),
        },
        "decoder": {
            "embed_positions": _embedding(sd, "decoder.embed_positions.weight"),
            "layernorm_embedding": _layernorm(sd, "decoder.layernorm_embedding"),
            "layers": tuple(
                _bart_decoder_layer(sd, f"decoder.layers.{i}") for i in range(cfg.decoder_layers)
            ),
        },
    }
    if "final_logits_bias" in sd:
        params["final_logits_bias"] = jnp.asarray(_t(sd["final_logits_bias"]).reshape(-1))
    else:
        params["final_logits_bias"] = jnp.zeros((params["shared"]["weight"].shape[0],), jnp.float32)
    return params


def resize_vocab(params: Params, new_vocab: int) -> Params:
    """Extend the shared embedding + logits bias to `new_vocab` rows.

    Matches `resize_token_embeddings` + `_resize_final_logits_bias`
    (reference model :1906-1918): new rows are drawn N(0, 0.02²)... the HF
    resize uses the model's initializer (normal std=0.02); the logits bias is
    zero-extended.
    """
    old = np.asarray(params["shared"]["weight"])
    v, d = old.shape
    if new_vocab <= v:
        new_w = old[:new_vocab]
        new_b = np.asarray(params["final_logits_bias"])[:new_vocab]
    else:
        rng = np.random.RandomState(0)
        extra = rng.normal(0.0, 0.02, size=(new_vocab - v, d)).astype(np.float32)
        new_w = np.concatenate([old, extra], axis=0)
        new_b = np.concatenate(
            [np.asarray(params["final_logits_bias"]), np.zeros((new_vocab - v,), np.float32)]
        )
    out = dict(params)
    out["shared"] = {"weight": jnp.asarray(new_w)}
    out["final_logits_bias"] = jnp.asarray(new_b)
    return out


def convert_multimodal_bart(sd: Mapping[str, Any], cfg: BartConfig, fcfg: FusionConfig) -> Params:
    """Reference `BartForMultiModalGeneration.state_dict()` → models/fusion.py
    tree. Reference member names (model file): per fusion layer `_linear_1up/
    _linear_1down` (img FFN), `_face_up/_face_down`, `self_attn_img_name`,
    `ner_map_up/ner_map_down`, `cross_attn_img_ner` + their layer norms
    (:588-616); encoder-level `prompt_mlp.model.{0,2}` (:1136), `visual_map`
    (:1143), `embed_tokens_ner`, `embed_positions_ner`,
    `layernorm_embedding_ner` (:1150-1155), `_linear_1` (face proj, :1162)."""
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")} | {
            k: v for k, v in sd.items() if not k.startswith("model.")
        }
    params = convert_bart(sd, cfg)
    enc = params["encoder"]

    layers = []
    for i, base in enumerate(enc["layers"]):
        p = dict(base)
        pre = f"encoder.layers.{i}"
        if f"{pre}._linear_1up.weight" in sd and i in set(fcfg.fusion_layers):
            p.update({
                "img_up": _linear(sd, f"{pre}._linear_1up"),
                "img_down": _linear(sd, f"{pre}._linear_1down"),
                "img_layer_norm": _layernorm(sd, f"{pre}.img_layer_norm"),
                "cross_attn_img_ner": _mha(sd, f"{pre}.cross_attn_img_ner"),
                "img_ner_attn_layer_norm": _layernorm(sd, f"{pre}.img_ner_attn_layer_norm"),
            })
            if not fcfg.only_image:
                p.update({
                    "face_up": _linear(sd, f"{pre}._face_up"),
                    "face_down": _linear(sd, f"{pre}._face_down"),
                    "face_layer_norm": _layernorm(sd, f"{pre}.face_layer_norm"),
                    "self_attn_img_name": _mha(sd, f"{pre}.self_attn_img_name"),
                    "img_name_attn_layer_norm": _layernorm(sd, f"{pre}.img_name_attn_layer_norm"),
                    "ner_map_up": _linear(sd, f"{pre}.ner_map_up"),
                    "ner_map_down": _linear(sd, f"{pre}.ner_map_down"),
                    "ner_map_layer_norm": _layernorm(sd, f"{pre}.ner_map_layer_norm"),
                })
        layers.append(p)
    enc["layers"] = tuple(layers)

    # Both reference mapper classes serialize as prompt_mlp.model.{0,2,...};
    # the layout must be chosen by the CONFIGURED type (a clipcap ckpt has
    # exactly 2 linears, an "mlp" ckpt has len(map_size)-1 of them).
    if "encoder.prompt_mlp.model.0.weight" in sd:
        if fcfg.prompt_mlp_type == "clipcap":
            enc["prompt_mlp"] = {
                "prompt_fc1": _linear(sd, "encoder.prompt_mlp.model.0"),
                "prompt_fc2": _linear(sd, "encoder.prompt_mlp.model.2"),
            }
        else:
            stages = []
            i = 0
            while f"encoder.prompt_mlp.model.{i}.weight" in sd:
                stages.append(_linear(sd, f"encoder.prompt_mlp.model.{i}"))
                i += 2
            enc["prompt_mlp"] = {"stages": tuple(stages)}
    if "encoder.visual_map.weight" in sd:
        enc["visual_map"] = _linear(sd, "encoder.visual_map")
    if not fcfg.only_image and "encoder.embed_tokens_ner.weight" in sd:
        enc["embed_tokens_ner"] = _embedding(sd, "encoder.embed_tokens_ner.weight")
        enc["embed_positions_ner"] = _embedding(sd, "encoder.embed_positions_ner.weight")
        enc["layernorm_embedding_ner"] = _layernorm(sd, "encoder.layernorm_embedding_ner")
        enc["face_proj"] = _linear(sd, "encoder._linear_1")
    return params


# ---------------------------------------------------------------------------
# CLIP (OpenAI layout and HF layout)
# ---------------------------------------------------------------------------

def convert_clip_vision_openai(sd: Mapping[str, Any], cfg: ClipVisionConfig) -> Params:
    """OpenAI CLIP `visual.*` state dict → models/clip_vit.py tree."""
    p: Params = {
        "conv1": {"kernel": jnp.asarray(_t(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0))},
        "class_embedding": jnp.asarray(_t(sd["visual.class_embedding"])),
        "positional_embedding": jnp.asarray(_t(sd["visual.positional_embedding"])),
        "ln_pre": _layernorm(sd, "visual.ln_pre"),
        "ln_post": _layernorm(sd, "visual.ln_post"),
        "layers": [],
    }
    if "visual.proj" in sd:
        p["proj"] = jnp.asarray(_t(sd["visual.proj"]))
    layers = []
    for i in range(cfg.layers):
        pre = f"visual.transformer.resblocks.{i}"
        in_w = _t(sd[f"{pre}.attn.in_proj_weight"])  # (3d, d)
        in_b = _t(sd[f"{pre}.attn.in_proj_bias"])
        d = in_w.shape[1]
        qw, kw, vw = in_w[:d], in_w[d:2 * d], in_w[2 * d:]
        qb, kb, vb = in_b[:d], in_b[d:2 * d], in_b[2 * d:]
        layers.append({
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
    p["layers"] = tuple(layers)
    return p


def convert_clip_vision_hf(sd: Mapping[str, Any], cfg: ClipVisionConfig) -> Params:
    """HF `CLIPVisionModel.state_dict()` → models/clip_vit.py tree."""
    pre = "vision_model"
    if not any(k.startswith(pre) for k in sd):
        raise ValueError("not an HF CLIP vision state dict")
    p: Params = {
        "conv1": {
            "kernel": jnp.asarray(_t(sd[f"{pre}.embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0))
        },
        "class_embedding": jnp.asarray(_t(sd[f"{pre}.embeddings.class_embedding"])),
        "positional_embedding": jnp.asarray(_t(sd[f"{pre}.embeddings.position_embedding.weight"])),
        "ln_pre": _layernorm(sd, f"{pre}.pre_layrnorm"),  # (sic) HF misspells it
        "ln_post": _layernorm(sd, f"{pre}.post_layernorm"),
    }
    layers = []
    for i in range(cfg.layers):
        lp = f"{pre}.encoder.layers.{i}"
        layers.append({
            "attn": {
                "q_proj": _linear(sd, f"{lp}.self_attn.q_proj"),
                "k_proj": _linear(sd, f"{lp}.self_attn.k_proj"),
                "v_proj": _linear(sd, f"{lp}.self_attn.v_proj"),
                "out_proj": _linear(sd, f"{lp}.self_attn.out_proj"),
            },
            "ln_1": _layernorm(sd, f"{lp}.layer_norm1"),
            "ln_2": _layernorm(sd, f"{lp}.layer_norm2"),
            "mlp": {
                "c_fc": _linear(sd, f"{lp}.mlp.fc1"),
                "c_proj": _linear(sd, f"{lp}.mlp.fc2"),
            },
        })
    p["layers"] = tuple(layers)
    if "visual_projection.weight" in sd:
        p["proj"] = jnp.asarray(_t(sd["visual_projection.weight"]).T)
    return p
