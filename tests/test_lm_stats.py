"""lm_stats kernel (fused LM head + shortlist statistics) parity.

The kernel computes logits + per-block max + lse partials in one pass
(kernels/lm_stats.py); stage 2 recovers the exact per-row top-C and the
logsumexp. Reference behavior: the LM projection with final_logits_bias
(reference model file :1884-1885, :1997) feeding HF-4.18 beam search."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vacnic_tpu.kernels.lm_stats import VBLOCK, lm_stats, lm_stats_topk


def _mk(bk, d, v, seed=0):
    key = jax.random.PRNGKey(seed)
    vp = -(-v // 4096) * 4096
    x = jax.random.normal(key, (bk, d), jnp.float32).astype(jnp.bfloat16)
    w = jnp.zeros((vp, d), jnp.bfloat16).at[:v].set(
        jax.random.normal(jax.random.fold_in(key, 1), (v, d),
                          jnp.float32).astype(jnp.bfloat16))
    b = jnp.full((1, vp), -1e9, jnp.float32).at[0, :v].set(0.0)
    return x, w, b, vp


def test_lm_stats_kernel_parity():
    x, w, b, vp = _mk(40, 128, 50267)
    logits, m, s = lm_stats(x, w, b, interpret=True)
    ref = jnp.dot(x, w.T, preferred_element_type=jnp.float32) + b
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(ref))
    # block maxes and partials reconstruct the row stats exactly
    r3 = np.asarray(ref).reshape(40, vp // VBLOCK, VBLOCK)
    np.testing.assert_array_equal(np.asarray(m), r3.max(-1))


def test_lm_stats_unaligned_rows():
    """bk=4 (batch 2 x 2 beams in the tiny e2e test) must pad to 8 rows
    internally and slice back — regression for the r4 Mosaic-fix assert."""
    x, w, b, vp = _mk(4, 128, 50267, seed=5)
    logits, m, s = lm_stats(x, w, b, interpret=True)
    assert logits.shape == (4, vp) and m.shape == (4, vp // VBLOCK)
    ref = jnp.dot(x, w.T, preferred_element_type=jnp.float32) + b
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(ref))
    r3 = np.asarray(ref).reshape(4, vp // VBLOCK, VBLOCK)
    np.testing.assert_array_equal(np.asarray(m), r3.max(-1))


def test_lm_stats_topk_and_lse():
    x, w, b, vp = _mk(24, 128, 50267, seed=3)
    logits, m, s = lm_stats(x, w, b, interpret=True)
    ref = jnp.dot(x, w.T, preferred_element_type=jnp.float32) + b
    cv, ci, lse = lm_stats_topk(logits, m, s, 16, 50267)
    cv0, ci0 = jax.lax.top_k(ref[:, :50267], 16)
    np.testing.assert_array_equal(np.asarray(cv), np.asarray(cv0))
    np.testing.assert_array_equal(np.asarray(ci), np.asarray(ci0))
    assert int(np.asarray(ci).max()) < 50267  # pad columns can never rank
    lse0 = jax.scipy.special.logsumexp(ref[:, :50267], axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse0),
                               atol=3e-5, rtol=0)


def test_lm_stats_topk_ties():
    """Duplicated values across blocks: lowest-index tie-break must match
    a direct top_k."""
    x, w, b, vp = _mk(8, 128, 50267, seed=7)
    ref = jnp.dot(x, w.T, preferred_element_type=jnp.float32) + b
    # plant ties far apart (different blocks)
    ref = ref.at[:, 30000:30008].set(ref[:, 100:108])
    nvb = vp // VBLOCK
    m = ref.reshape(8, nvb, VBLOCK).max(-1)
    mm = ref.reshape(8, nvb, VBLOCK).max(-1, keepdims=True)
    s = jnp.sum(jnp.exp(ref.reshape(8, nvb, VBLOCK) - mm), -1)
    cv, ci, lse = lm_stats_topk(ref, m, s, 16, 50267)
    cv0, ci0 = jax.lax.top_k(ref[:, :50267], 16)
    np.testing.assert_array_equal(np.asarray(cv), np.asarray(cv0))
    np.testing.assert_array_equal(np.asarray(ci), np.asarray(ci0))


def test_generate_mm_stats_token_parity(monkeypatch):
    """End-to-end: generate_mm with the fused stats head (interpret-mode
    kernels on CPU) emits the same tokens as the plain pallas path; scores
    agree to f32 summation-order tolerance."""
    from vacnic_tpu.core.config import VacnicConfig
    from vacnic_tpu.data.synthetic import synthetic_batch
    from vacnic_tpu.infer.generate import generate_mm
    from vacnic_tpu.models import fusion as F
    from vacnic_tpu.train.train_step import create_mask, face_mask_from_emb

    cfg = VacnicConfig.tiny()
    # vocab big enough for the shortlist auto-gate AND >= 16 vocab blocks
    cfg = dataclasses.replace(
        cfg, bart=dataclasses.replace(cfg.bart, vocab_size=16500))
    params = F.multimodal_bart_init(jax.random.PRNGKey(0), cfg.bart, cfg.fusion)
    batch = synthetic_batch(cfg, batch_size=2, seed=0)
    dcfg = dataclasses.replace(cfg.decode, num_beams=2, max_length=8)

    def run():
        seqs, scores = generate_mm(
            params, batch["article_ids"], create_mask(batch["article_ids"]),
            batch["image_cls"], cfg.bart, cfg.fusion, dcfg,
            face_features=batch["face_emb"],
            face_mask=face_mask_from_emb(batch["face_emb"]),
            name_ids=batch["names_art_ids"],
            name_mask=create_mask(batch["names_art_ids"]),
            dtype=jnp.float32)
        return np.asarray(seqs), np.asarray(scores)

    monkeypatch.setenv("VACNIC_PALLAS_DECODE", "1")
    monkeypatch.delenv("VACNIC_LM_STATS", raising=False)
    s_plain, sc_plain = run()
    monkeypatch.setenv("VACNIC_LM_STATS", "1")
    s_stats, sc_stats = run()
    np.testing.assert_array_equal(s_plain, s_stats)
    np.testing.assert_allclose(sc_plain, sc_stats, atol=1e-4, rtol=0)
