"""Training losses: caption LM, CoLaM margin, SECLA face-naming, CLIP InfoNCE.

Rebuilds the loss stack of the reference trainer
(train_mmbart...bart_guide_match.py): total =
  txt_loss + mapping_loss_weight · face_name_loss + α · margin_loss
(+ optional CLIP contrastive, disabled in the released script via
--no_clip_loss True; composition at :358-363).

Contrastive losses are computed over the **global** batch: under data
parallelism the B×B logits force XLA to all-gather the embeddings across the
data axis, which preserves single-device loss semantics exactly (SURVEY §2.9).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Pooling (reference model :1679-1695)
# ---------------------------------------------------------------------------

def pool(last_hidden: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked mean-pool; all-masked rows → 1.0 (the reference's
    `torch.nan_to_num(emb, nan=1.0)` after 0/0).

    The divide is guarded BEFORE the `where`: dividing by a raw zero would
    produce NaN whose gradient leaks through the untaken `where` branch
    (nan·0 = nan) and poisons the whole step."""
    m = mask.astype(last_hidden.dtype)[..., None]
    summed = jnp.sum(last_hidden * m, axis=1)
    denom = jnp.sum(m, axis=1)
    emb = summed / jnp.maximum(denom, 1e-9)
    return jnp.where(denom > 0, emb, jnp.ones_like(emb))


def pool_replace(last_hidden: jax.Array, mask: jax.Array, img_feat: jax.Array) -> jax.Array:
    """As `pool` but all-masked rows take the (stop-gradient) image feature
    (reference pool_replace, train...match.py:188-196)."""
    m = mask.astype(last_hidden.dtype)[..., None]
    summed = jnp.sum(last_hidden * m, axis=1)
    denom = jnp.sum(m, axis=1)
    emb = summed / jnp.maximum(denom, 1e-9)
    return jnp.where(denom > 0, emb, jax.lax.stop_gradient(img_feat))


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


# ---------------------------------------------------------------------------
# LM loss
# ---------------------------------------------------------------------------

def lm_cross_entropy(logits: jax.Array, labels: jax.Array, ignore_index: int = 1) -> jax.Array:
    """CrossEntropyLoss(ignore_index=pad) — mean over non-pad label positions
    (train...match.py:287, loss_fn at :816)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    valid = (labels != ignore_index).astype(jnp.float32)
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)


# ---------------------------------------------------------------------------
# CoLaM margin loss (train...match.py:292-309; HingeEmbeddingLoss :820)
# ---------------------------------------------------------------------------

def colam_margin_loss(
    decoder_hidden: jax.Array,
    teacher_decoder_hidden: jax.Array,
    caption_mask: jax.Array,
    margin: float,
) -> jax.Array:
    """Push the multimodal decoder's pooled state away from the frozen
    text-only BART teacher's: mean(max(0, Δ − cos_sim)) — HingeEmbeddingLoss
    with target −1 on diag(H·H_bartᵀ)."""
    h_t = l2_normalize(pool(jax.lax.stop_gradient(teacher_decoder_hidden), caption_mask))
    return colam_margin_from_pooled(decoder_hidden, h_t, caption_mask, margin)


def colam_margin_from_pooled(
    decoder_hidden: jax.Array,
    teacher_pooled: jax.Array,  # [B, d] — already pooled + L2-normalized
    caption_mask: jax.Array,
    margin: float,
) -> jax.Array:
    """CoLaM against a precomputed teacher vector. The frozen text-only
    teacher is deterministic (no dropout), so its pooled state per sample is
    a constant across epochs — the training loop caches it after epoch 1 and
    skips the whole teacher forward (train/loop.py teacher_cache), which is
    numerics-identical to recomputing it."""
    h = l2_normalize(pool(decoder_hidden, caption_mask))
    sim = jnp.sum(h * jax.lax.stop_gradient(teacher_pooled), axis=-1)
    return jnp.mean(jnp.maximum(0.0, margin - sim))


# ---------------------------------------------------------------------------
# SECLA (train...match.py:631-660)
# ---------------------------------------------------------------------------

def _batch_softmax(match: jax.Array) -> jax.Array:
    """match [B, B, spans, regions] → CE over the B×B span-aggregated logits
    vs the identity target (reference batch_softmax :631-647)."""
    b = match.shape[0]
    num_spans = match.shape[2]
    per_span = jnp.max(match, axis=-1)  # max over regions
    logits = jnp.sum(per_span, axis=-1) / num_spans  # [B, B]
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.diagonal(logp))


def secla_loss(face_states: jax.Array, name_embeds: jax.Array) -> jax.Array:
    """Symmetric weakly-supervised face-naming loss (BatchSoftmax :649-660):
    pairwise name↔face similarity across the batch, both directions summed.

    face_states: hidden_states_face from the fusion encoder [B, F, d];
    name_embeds: no-grad per-name embeddings from the NER table [B, N, d].
    """
    # ner_j.unsqueeze(1) @ face_jᵀ broadcast → [B, B, N, F]
    face_ner = jnp.einsum("and,bfd->abnf", name_embeds, face_states)
    ner_face = jnp.einsum("afd,bnd->abfn", face_states, name_embeds)
    return _batch_softmax(face_ner) + _batch_softmax(ner_face)


# ---------------------------------------------------------------------------
# InfoNCE variants
# ---------------------------------------------------------------------------

def _sym_infonce(a: jax.Array, b: jax.Array, logit_scale: jax.Array) -> jax.Array:
    """0.5·CE(a·bᵀ) + 0.5·CE(b·aᵀ) with identity targets."""
    logits = logit_scale * (a @ b.T)
    logp1 = jax.nn.log_softmax(logits, axis=-1)
    logp2 = jax.nn.log_softmax(logits.T, axis=-1)
    return -0.5 * jnp.mean(jnp.diagonal(logp1)) - 0.5 * jnp.mean(jnp.diagonal(logp2))


def face_name_infonce(
    face_states: jax.Array,
    face_mask: jax.Array,
    name_states: jax.Array,
    name_mask: jax.Array,
    logit_scale: jax.Array,
) -> jax.Array:
    """Non-SECLA mapping loss (train...match.py:332-355): pooled+normalized
    face stream vs no-grad pooled flat-name stream, CLIP-style symmetric CE
    scaled by exp(logit_scale)."""
    f = l2_normalize(pool(face_states, face_mask))
    n = l2_normalize(pool(jax.lax.stop_gradient(name_states), name_mask))
    return _sym_infonce(n, f, logit_scale)


def clip_contrastive_loss(image_embeds: jax.Array, text_embeds: jax.Array,
                          logit_scale: jax.Array) -> jax.Array:
    """Optional CLIP image/caption loss (train...match.py:312-321; released
    script disables it)."""
    return _sym_infonce(
        l2_normalize(image_embeds), l2_normalize(text_embeds), logit_scale
    )
