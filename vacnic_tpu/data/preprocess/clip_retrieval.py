"""CLIP sentence retrieval — the preprocessing stage ABSENT from the reference
snapshot (SURVEY §0.1): score article segments against the image with CLIP and
keep the top `num_sentences` (8) as the encoder context (`sents_byclip`,
consumed at goodnews...py:562-563; dict files
`*_clip{N}sent_contras_name_pos.json`, train...match.py:772).

Device-side and batched: all segments of a batch of articles are embedded in
one jitted CLIP-text forward; ranking is a single cosine top-k on device.
"""

from __future__ import annotations

import re
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vacnic_tpu.models.clip_text import clip_text_fwd

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")


def split_sentences(article: str) -> list[str]:
    """Plain punctuation-based segmentation (the reference's articles are
    pre-segmented in MongoDB `parsed_section` paragraphs; this covers raw
    text input)."""
    return [s.strip() for s in _SENT_SPLIT.split(article) if s.strip()]


def rank_segments(
    text_params,
    image_embed: jax.Array,  # [D] CLIP joint embedding of the image
    segment_ids: jax.Array,  # [S, 77] CLIP-tokenized segments
    num_sentences: int = 8,
) -> jax.Array:
    """Return indices of the top-`num_sentences` segments by cosine similarity."""
    seg_embeds = clip_text_fwd(text_params, segment_ids)
    seg_embeds = seg_embeds / jnp.linalg.norm(seg_embeds, axis=-1, keepdims=True)
    img = image_embed / jnp.linalg.norm(image_embed)
    sims = seg_embeds @ img
    k = min(num_sentences, sims.shape[0])
    _, idx = jax.lax.top_k(sims, k)
    return idx


def retrieve_sentences(
    text_params,
    clip_tokenizer,
    image_embed: np.ndarray,
    article: str,
    num_sentences: int = 8,
    context_length: int = 77,
) -> str:
    """article text + image embedding → `sents_byclip` string (top segments
    joined in rank order, matching the dataset's consumption contract)."""
    segments = split_sentences(article)
    if not segments:
        return article
    params_context_length = text_params["positional_embedding"].shape[0]
    context_length = min(context_length, params_context_length)
    ids = np.zeros((len(segments), context_length), np.int32)
    for i, s in enumerate(segments):
        row = clip_tokenizer.encode(s, max_length=context_length)
        ids[i, : len(row)] = row
    idx = np.asarray(
        rank_segments(text_params, jnp.asarray(image_embed), jnp.asarray(ids), num_sentences)
    )
    return " ".join(segments[i] for i in idx)
