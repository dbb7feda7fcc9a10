"""The SPMD training step: one jitted program per step.

Fuses what the reference does as five separate torch dispatches per batch
(SURVEY §3.1 hot loop): CLIP feature extraction (no-grad,
train...match.py:274-276), multimodal forward (:281), frozen-teacher forward
(:293), SECLA name-embedding pass (:325-330), backward + AdamW step
(:364-374) — into a single XLA computation differentiated once.

Parallelism: batch arrays are sharded over the mesh's `data` axis, params
replicated (or TP-sharded via core.mesh.param_shardings). Gradient
all-reduce and the contrastive losses' cross-shard all-gathers are emitted by
XLA from the sharding annotations — the TPU-native equivalent of the
reference's DDP/NCCL wrap (train...match.py:86-87, 620).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from vacnic_tpu.core.config import VacnicConfig, dtype_of
from vacnic_tpu.models import bart as B
from vacnic_tpu.models import fusion as F
from vacnic_tpu.models.clip_vit import clip_vision_fwd
from vacnic_tpu.models.layers import RngStream
from vacnic_tpu.train import losses as L
from vacnic_tpu.train.optim import make_optimizer

Params = dict[str, Any]


class TrainState(NamedTuple):
    step: jax.Array
    params: Params  # {"model": multimodal bart, "clip": clip vision (optional)}
    teacher: Params  # frozen text-only BART (CoLaM teacher)
    opt_state: Any
    rng: jax.Array


def create_mask(ids: jax.Array) -> jax.Array:
    """`create_src_mask_bart` (train...match.py:212-217): 0 where pad (==1)."""
    return (ids != 1).astype(jnp.int32)


def face_mask_from_emb(face_emb: jax.Array) -> jax.Array:
    """Padding face rows are all-ones vectors (collate pads with ones,
    goodnews...py:48-49); mask keys off the last component == 1
    (train...match.py:269)."""
    return (face_emb[:, :, -1] != 1).astype(jnp.int32)


def embed_names_3d(model_params: Params, names_ids_3d: jax.Array, cfg) -> jax.Array:
    """`get_embedding_ner` (train...match.py:112-133): no-grad embedding of
    [B, N, Lname] per-name ids through the NER table + positions + LN,
    *unmasked* mean over length → [B, N, d]."""
    bsz, n, ln = names_ids_3d.shape
    flat = names_ids_3d.reshape(bsz * n, ln)
    enc = model_params["encoder"]
    h = B.embed_and_norm(enc["embed_tokens_ner"], enc["embed_positions_ner"],
                         enc["layernorm_embedding_ner"], flat, cfg, RngStream(None), jnp.float32)
    return jax.lax.stop_gradient(jnp.mean(h, axis=1).reshape(bsz, n, -1))


def embed_tgt(model_params: Params, tgt_ids: jax.Array, cfg) -> jax.Array:
    """`get_embedding_tgt` (train...match.py:137-155): no-grad decoder-side
    token+position embedding of target ids (used by representation-analysis
    variants)."""
    h = B.embed_and_norm(model_params["shared"], model_params["decoder"]["embed_positions"],
                         model_params["decoder"]["layernorm_embedding"], tgt_ids, cfg,
                         RngStream(None), jnp.float32)
    return jax.lax.stop_gradient(h)


def get_hidden_states_ner(model_params: Params, src_ids, src_mask, img_feat,
                          name_ids, name_mask, face_features, face_mask,
                          cfg, fcfg) -> jax.Array:
    """`get_hidden_states_ner` (train...match.py:169-179): stop-gradient
    encoder pass returning the GT-NER stream's hidden states. The reference
    helper targets a pre-release model signature (org/gpe id streams +
    `add_img_ner_attn=False`); in the released face_name_ids model the NER
    stream never cross-attends to the image, so the equivalent is the full
    encoder forward with gradients stopped, reading `hidden_states_ner`."""
    out = F.mm_encoder_fwd(
        model_params, src_ids, src_mask, img_feat, cfg, fcfg,
        face_features=face_features, face_mask=face_mask,
        name_ids=name_ids, name_mask=name_mask, add_ner_ffn=True,
    )
    return jax.lax.stop_gradient(out["ner"])


def compute_losses(
    params: Params,
    teacher: Params,
    batch: dict[str, jax.Array],
    cfg: VacnicConfig,
    dropout_rng: jax.Array | None,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Loss composition of train_epoch (train...match.py:242-363)."""
    bart_cfg, fcfg, tcfg = cfg.bart, cfg.fusion, cfg.train
    dtype = dtype_of(tcfg.compute_dtype)

    src_ids = batch["article_ids"]
    tgt_ids = batch["caption_ids"]
    src_mask = create_mask(src_ids)
    tgt_mask = create_mask(tgt_ids)
    tgt_input = B.shift_tokens_right(tgt_ids, bart_cfg.pad_token_id, bart_cfg.eos_token_id)

    rngs = {}
    if dropout_rng is not None:
        keys = jax.random.split(dropout_rng, 3)
        rngs = {"model": keys[0], "teacher": keys[1]}

    # --- CLIP image features (frozen; torch.no_grad in the reference) -------
    if "image_cls" in batch:
        img_feat_cls = batch["image_cls"]
    else:
        _, img_feat_cls = clip_vision_fwd(params["clip"], batch["pixels"], cfg.clip, dtype)
        img_feat_cls = jax.lax.stop_gradient(img_feat_cls)

    mm_kwargs: dict[str, Any] = {}
    if not fcfg.only_image:
        face_emb = batch["face_emb"]
        mm_kwargs = dict(
            face_features=face_emb,
            face_mask=face_mask_from_emb(face_emb),
            name_ids=batch["names_art_ids"],
            name_mask=create_mask(batch["names_art_ids"]),
            add_ner_ffn=True,
        )

    out = F.mm_forward(
        params["model"], src_ids, src_mask, tgt_input, img_feat_cls, bart_cfg, fcfg,
        dropout_rng=rngs.get("model"), dtype=dtype, remat=tcfg.grad_checkpoint,
        # this forward is differentiated; the fused Pallas encoder has no VJP,
        # so a no-dropout config (dropout_rng=None, grad_checkpoint=False)
        # must not fall into the eval-mode fused path
        allow_fused_encoder=False, **mm_kwargs,
    )

    txt_loss = L.lm_cross_entropy(out["logits"], tgt_ids, bart_cfg.pad_token_id)
    metrics = {"txt_loss": txt_loss}
    total = txt_loss

    # --- CoLaM: frozen text-only teacher (train...match.py:292-309) ---------
    if tcfg.alpha > 0:
        if "teacher_pooled" in batch:
            # cross-epoch teacher cache: the deterministic teacher's pooled
            # state was computed in a previous epoch — skip its forward
            margin_loss = L.colam_margin_from_pooled(
                out["decoder_hidden"].astype(jnp.float32),
                batch["teacher_pooled"].astype(jnp.float32),
                tgt_mask, tcfg.margin,
            )
        else:
            # deterministic teacher: HF from_pretrained returns the model in
            # eval mode and the reference never calls .train() on it — no
            # dropout
            t_out = B.bart_forward(teacher, src_ids, src_mask, tgt_input, bart_cfg,
                                   dropout_rng=None, dtype=dtype)
            t_pooled = L.l2_normalize(
                L.pool(jax.lax.stop_gradient(
                    t_out["decoder_hidden"].astype(jnp.float32)), tgt_mask))
            margin_loss = L.colam_margin_from_pooled(
                out["decoder_hidden"].astype(jnp.float32), t_pooled,
                tgt_mask, tcfg.margin,
            )
            if tcfg.teacher_cache:
                # surfaced so the loop can populate the cache (popped from
                # metrics before logging)
                metrics["teacher_pooled"] = t_pooled
        metrics["margin_loss"] = margin_loss
        total = total + tcfg.alpha * margin_loss

    # --- face-name mapping loss (SECLA path; train...match.py:323-330) ------
    if not fcfg.only_image and not tcfg.no_mapping:
        if tcfg.use_secla:
            name_embeds = embed_names_3d(params["model"], batch["names_ids"], bart_cfg)
            fn_loss = L.secla_loss(out["hidden_states_face"].astype(jnp.float32), name_embeds)
        else:
            flat_ids = batch["names_ids_flatten"]
            flat_mask = create_mask(flat_ids)
            aux = F.mm_encoder_fwd(
                params["model"], src_ids, src_mask, img_feat_cls, bart_cfg, fcfg,
                face_features=batch["face_emb"],
                face_mask=face_mask_from_emb(batch["face_emb"]),
                name_ids=flat_ids, name_mask=flat_mask, add_ner_ffn=False, dtype=dtype,
            )
            # exp(logit_scale) from the CLIP model (train...match.py:332-355);
            # it lives on the text tower when one is loaded, else the trained
            # OpenAI CLIP value exp(ln 100)=100.
            scale_src = params.get("clip_text") or params.get("clip") or {}
            logit_scale = jnp.exp(scale_src.get("logit_scale", jnp.log(jnp.float32(100.0))))
            fn_loss = L.face_name_infonce(
                out["hidden_states_face"].astype(jnp.float32),
                face_mask_from_emb(batch["face_emb"]),
                aux["ner"].astype(jnp.float32), flat_mask, logit_scale,
            )
        metrics["face_name_loss"] = fn_loss
        total = total + tcfg.mapping_loss_weight * fn_loss

    # --- optional CLIP image/caption contrastive loss (train...match.py:312-321;
    # released script disables it via --no_clip_loss True) -------------------
    if not tcfg.no_clip_loss and "pixels" in batch and "caption_ids_clip" in batch:
        from vacnic_tpu.models.clip_text import clip_text_fwd
        from vacnic_tpu.models.clip_vit import clip_image_embed

        if "clip_text" not in params:
            raise ValueError(
                "train.no_clip_loss=false needs a CLIP text tower: pass a "
                "full-CLIP --clip-ckpt (or build params['clip_text'] with "
                "clip_text_init) — params['clip'] holds only the vision tower"
            )
        img_emb = clip_image_embed(params["clip"], batch["pixels"], cfg.clip, dtype)
        # static head count from config: the tower's stored "heads" leaf is
        # traced under jit and can't be read here
        txt_emb = clip_text_fwd(params["clip_text"], batch["caption_ids_clip"], dtype,
                                num_heads=cfg.clip.text_heads)
        scale = jnp.exp(params["clip_text"]["logit_scale"])
        clip_loss = L.clip_contrastive_loss(img_emb, txt_emb, scale)
        metrics["clip_loss"] = clip_loss
        total = total + clip_loss

    metrics["loss"] = total
    return total, metrics


def perturb_bos(params: Params, rng: jax.Array, scale: float = 1.0) -> Params:
    """--perturb: add Gaussian noise to the shared embedding's BOS row
    (train...match.py:756-758)."""
    w = params["shared"]["weight"]
    noise = jax.random.normal(rng, (w.shape[1],), w.dtype) * scale
    out = dict(params)
    out["shared"] = {"weight": w.at[0].add(noise)}
    return out


def make_train_step(cfg: VacnicConfig, num_training_steps: int, mu_dtype=None,
                    nu_dtype=None):
    """Returns (init_fn, step_fn). step_fn: (state, batch) → (state, metrics),
    jittable and shardable (annotate inputs with NamedShardings)."""
    # freeze_clip=False enables the 1e-7 CLIP param group (the reference's
    # optimizer_clip, train...match.py:85-109; its released script freezes
    # CLIP and additionally never steps that optimizer, :376-378 — so the
    # default freeze_clip=True is the reference-faithful path).
    tx = make_optimizer(cfg.train, num_training_steps,
                        train_clip=not cfg.train.freeze_clip,
                        mu_dtype=mu_dtype, nu_dtype=nu_dtype)

    def init_fn(params: Params, teacher: Params, rng) -> TrainState:
        return TrainState(
            step=jnp.int32(0),
            params=params,
            teacher=teacher,
            opt_state=tx.init(params),
            rng=rng,
        )

    def step_fn(state: TrainState, batch: dict[str, jax.Array]):
        rng, dropout_rng = jax.random.split(state.rng)

        def loss_fn(params):
            return compute_losses(params, state.teacher, batch, cfg, dropout_rng)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params, teacher=state.teacher,
            opt_state=opt_state, rng=rng,
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return init_fn, step_fn


def eval_step(params: Params, batch: dict[str, jax.Array], cfg: VacnicConfig):
    """Teacher-forced validation: LM loss only, deterministic
    (eval_epoch computes just txt_loss; train...match.py:434-440)."""
    bart_cfg, fcfg = cfg.bart, cfg.fusion
    dtype = dtype_of(cfg.train.compute_dtype)
    src_ids, tgt_ids = batch["article_ids"], batch["caption_ids"]
    src_mask = create_mask(src_ids)
    tgt_input = B.shift_tokens_right(tgt_ids, bart_cfg.pad_token_id, bart_cfg.eos_token_id)
    if "image_cls" in batch:
        img_feat_cls = batch["image_cls"]
    else:
        _, img_feat_cls = clip_vision_fwd(params["clip"], batch["pixels"], cfg.clip, dtype)
    mm_kwargs: dict[str, Any] = {}
    if not fcfg.only_image:
        face_emb = batch["face_emb"]
        mm_kwargs = dict(
            face_features=face_emb, face_mask=face_mask_from_emb(face_emb),
            name_ids=batch["names_art_ids"],
            name_mask=create_mask(batch["names_art_ids"]), add_ner_ffn=True,
        )
    out = F.mm_forward(params["model"], src_ids, src_mask, tgt_input, img_feat_cls,
                       bart_cfg, fcfg, dtype=dtype, **mm_kwargs)
    return {
        "val_loss": L.lm_cross_entropy(out["logits"], tgt_ids, bart_cfg.pad_token_id),
        # greedy teacher-forced ids for the val text dump (train...match.py:432);
        # argmax on device so only [B,T] ids cross to host, not [B,T,V] logits
        "argmax_ids": jnp.argmax(out["logits"], axis=-1),
    }
