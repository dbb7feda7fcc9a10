"""Fused encoder text-stack kernel: parity against mm_encoder_fwd in
interpret mode (full-precision), both the full multimodal config and the
only-image variant."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vacnic_tpu.core.config import VacnicConfig
from vacnic_tpu.data.synthetic import synthetic_batch
from vacnic_tpu.models import fusion as F
from vacnic_tpu.train.train_step import create_mask, face_mask_from_emb


@pytest.fixture(scope="module", params=[False, True], ids=["full", "onlyimg"])
def setup(request):
    cfg = VacnicConfig.tiny()
    only_image = request.param
    cfg = dataclasses.replace(
        cfg,
        bart=dataclasses.replace(cfg.bart, d_model=128, encoder_attention_heads=2,
                                 decoder_attention_heads=2, encoder_ffn_dim=256,
                                 decoder_ffn_dim=256),
        fusion=dataclasses.replace(cfg.fusion, dim_common=128, img_size=128,
                                   only_image=only_image),
    )
    key = jax.random.PRNGKey(0)
    params = F.multimodal_bart_init(key, cfg.bart, cfg.fusion)
    batch = synthetic_batch(cfg, batch_size=4, seed=0)
    return cfg, params, batch


def test_fused_encoder_parity(setup):
    cfg, params, batch = setup
    src = batch["article_ids"]
    kwargs = {}
    if not cfg.fusion.only_image:
        kwargs = dict(
            face_features=batch["face_emb"],
            face_mask=face_mask_from_emb(batch["face_emb"]),
            name_ids=batch["names_art_ids"],
            name_mask=create_mask(batch["names_art_ids"]),
        )
    assert F.fused_encoder_eligible(cfg.fusion, cfg.bart, True, None)

    ref = F.mm_encoder_fwd(params, src, create_mask(src), batch["image_cls"],
                           cfg.bart, cfg.fusion, **kwargs)
    fused = F.mm_encoder_fwd_fused(params, src, create_mask(src), batch["image_cls"],
                                   cfg.bart, cfg.fusion, interpret=True, **kwargs)
    np.testing.assert_allclose(np.asarray(fused["last_hidden"]),
                               np.asarray(ref["last_hidden"]),
                               atol=2e-4, rtol=2e-4)
    for k in ("img", "ner", "face"):
        if ref[k] is not None:
            np.testing.assert_allclose(np.asarray(fused[k]), np.asarray(ref[k]),
                                       atol=2e-4, rtol=2e-4)


def test_fused_encoder_ineligible_configs():
    cfg = VacnicConfig.tiny()
    # dropout on -> ineligible
    assert not F.fused_encoder_eligible(cfg.fusion, cfg.bart, True, jax.random.PRNGKey(0))
    # add_ner_ffn=False (x in the KV) -> ineligible unless only_image
    assert not F.fused_encoder_eligible(cfg.fusion, cfg.bart, False, None)
    # partial fusion layers -> ineligible
    part = dataclasses.replace(cfg.fusion, fusion_layers=(0,))
    assert not F.fused_encoder_eligible(part, cfg.bart, True, None)


def test_fused_encoder_batch_slicing(setup):
    """max_kernel_batch smaller than the batch runs the kernel per slice and
    concatenates — results must equal the single-call path."""
    cfg, params, batch = setup
    src = batch["article_ids"]
    kwargs = {}
    if not cfg.fusion.only_image:
        kwargs = dict(
            face_features=batch["face_emb"],
            face_mask=face_mask_from_emb(batch["face_emb"]),
            name_ids=batch["names_art_ids"],
            name_mask=create_mask(batch["names_art_ids"]),
        )
    one = F.mm_encoder_fwd_fused(params, src, create_mask(src), batch["image_cls"],
                                 cfg.bart, cfg.fusion, interpret=True, **kwargs)
    sliced = F.mm_encoder_fwd_fused(params, src, create_mask(src), batch["image_cls"],
                                    cfg.bart, cfg.fusion, interpret=True,
                                    max_kernel_batch=2, **kwargs)
    np.testing.assert_allclose(np.asarray(sliced["last_hidden"]),
                               np.asarray(one["last_hidden"]), atol=2e-4, rtol=2e-4)


def test_fused_encoder_merged_phases_parity(setup, monkeypatch):
    """fuse_ffn=True (self+cross+FFN in one grid phase) must match the XLA
    encoder exactly like the split-phase layout does."""
    cfg, params, batch = setup
    src = batch["article_ids"]
    kwargs = {}
    if not cfg.fusion.only_image:
        kwargs = dict(
            face_features=batch["face_emb"],
            face_mask=face_mask_from_emb(batch["face_emb"]),
            name_ids=batch["names_art_ids"],
            name_mask=create_mask(batch["names_art_ids"]),
        )
    monkeypatch.setenv("ENC_FUSE", "1")
    ref = F.mm_encoder_fwd(params, src, create_mask(src), batch["image_cls"],
                           cfg.bart, cfg.fusion, **kwargs)
    fused = F.mm_encoder_fwd_fused(params, src, create_mask(src), batch["image_cls"],
                                   cfg.bart, cfg.fusion, interpret=True, **kwargs)
    np.testing.assert_allclose(np.asarray(fused["last_hidden"]),
                               np.asarray(ref["last_hidden"]),
                               atol=2e-4, rtol=2e-4)
