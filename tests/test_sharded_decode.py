"""SPMD decode: beam search over a data-sharded batch must produce the same
tokens as single-device (inference-side equivalent of the train-step DP test)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vacnic_tpu.core.config import BartConfig, DecodeConfig
from vacnic_tpu.models import bart as B
from vacnic_tpu.infer.generate import generate_text_bart

TINY = BartConfig.tiny()


def test_decode_sharded_matches_single():
    devices = jax.devices()
    assert len(devices) >= 8
    params = B.bart_init(jax.random.PRNGKey(5), TINY)
    rng = np.random.RandomState(2)
    src = rng.randint(4, TINY.vocab_size, size=(8, 10))
    src[3, -4:] = 1
    mask = (src != 1).astype(np.int32)
    dcfg = DecodeConfig(num_beams=3, max_length=9, length_penalty=2.0,
                        no_repeat_ngram_size=0)

    seqs1, scores1 = generate_text_bart(params, jnp.asarray(src), jnp.asarray(mask), TINY, dcfg)

    mesh = Mesh(np.asarray(devices[:8]).reshape(8, 1), ("data", "model"))
    bshard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    seqs8, scores8 = generate_text_bart(
        jax.device_put(params, repl),
        jax.device_put(jnp.asarray(src), bshard),
        jax.device_put(jnp.asarray(mask), bshard),
        TINY, dcfg,
    )
    np.testing.assert_array_equal(np.asarray(seqs1), np.asarray(seqs8))
    np.testing.assert_allclose(np.asarray(scores1), np.asarray(scores8), rtol=1e-5)


def test_pallas_decode_sharded_matches_single(monkeypatch):
    """generate_mm_sharded: the fused Pallas decode path (per-chip program,
    interpret mode on CPU) over an 8-way data mesh must be token-identical to
    the single-device XLA path."""
    import dataclasses

    from vacnic_tpu.core.config import VacnicConfig
    from vacnic_tpu.data.synthetic import synthetic_batch
    from vacnic_tpu.infer.generate import generate_mm, generate_mm_sharded
    from vacnic_tpu.models import fusion as F
    from vacnic_tpu.train.train_step import create_mask, face_mask_from_emb

    devices = jax.devices()
    assert len(devices) >= 8
    cfg = VacnicConfig.tiny()
    key = jax.random.PRNGKey(0)
    params = F.multimodal_bart_init(key, cfg.bart, cfg.fusion)
    batch = synthetic_batch(cfg, batch_size=8, seed=0)
    dcfg = dataclasses.replace(cfg.decode, num_beams=2, max_length=8)
    kwargs = dict(
        face_features=batch["face_emb"],
        face_mask=face_mask_from_emb(batch["face_emb"]),
        name_ids=batch["names_art_ids"],
        name_mask=create_mask(batch["names_art_ids"]),
    )

    monkeypatch.delenv("VACNIC_PALLAS_DECODE", raising=False)
    jax.clear_caches()
    seqs1, scores1 = generate_mm(
        params, batch["article_ids"], create_mask(batch["article_ids"]),
        batch["image_cls"], cfg.bart, cfg.fusion, dcfg, **kwargs)
    seqs1, scores1 = np.asarray(seqs1), np.asarray(scores1)

    monkeypatch.setenv("VACNIC_PALLAS_DECODE", "1")
    jax.clear_caches()
    mesh = Mesh(np.asarray(devices[:8]).reshape(8, 1), ("data", "model"))
    seqs8, scores8 = generate_mm_sharded(
        mesh, params, batch["article_ids"], create_mask(batch["article_ids"]),
        batch["image_cls"], cfg.bart, cfg.fusion, dcfg, **kwargs)
    np.testing.assert_array_equal(seqs1, np.asarray(seqs8))
    np.testing.assert_allclose(scores1, np.asarray(scores8), rtol=2e-3, atol=2e-3)
