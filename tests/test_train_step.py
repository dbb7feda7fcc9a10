"""Train-step tests: loss decreases, gradients only where expected, and the
SPMD invariant — identical losses on a 1-device vs 8-device mesh (SURVEY §4
distributed strategy; substitutes for the cluster the reference never had)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vacnic_tpu.core.config import VacnicConfig
from vacnic_tpu.core.rng import set_random_seed
from vacnic_tpu.data.synthetic import synthetic_batch
from vacnic_tpu.models import bart as B
from vacnic_tpu.models import fusion as F
from vacnic_tpu.train.train_step import TrainState, eval_step, make_train_step


@pytest.fixture(scope="module")
def setup():
    cfg = VacnicConfig.tiny()
    key = set_random_seed(0)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {"model": F.multimodal_bart_init(k1, cfg.bart, cfg.fusion)}
    teacher = B.bart_init(k2, cfg.bart)
    batch = synthetic_batch(cfg, batch_size=8, seed=1)
    return cfg, params, teacher, batch, k3


def test_loss_decreases(setup):
    cfg, params, teacher, batch, key = setup
    init_fn, step_fn = make_train_step(cfg, num_training_steps=100)
    state = init_fn(params, teacher, key)
    step = jax.jit(step_fn)
    state, m0 = step(state, batch)
    losses = [float(m0["loss"])]
    for _ in range(5):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert int(state.step) == 6


def test_metrics_composition(setup):
    cfg, params, teacher, batch, key = setup
    init_fn, step_fn = make_train_step(cfg, 100)
    state = init_fn(params, teacher, key)
    _, m = jax.jit(step_fn)(state, batch)
    t = cfg.train
    expect = float(m["txt_loss"]) + t.alpha * float(m["margin_loss"]) + \
        t.mapping_loss_weight * float(m["face_name_loss"])
    assert abs(float(m["loss"]) - expect) < 1e-4


def test_teacher_frozen(setup):
    cfg, params, teacher, batch, key = setup
    init_fn, step_fn = make_train_step(cfg, 100)
    state = init_fn(params, teacher, key)
    # two steps: step 0's warmup LR is exactly 0 (HF linear-warmup semantics)
    new_state, _ = jax.jit(step_fn)(state, batch)
    new_state, _ = jax.jit(step_fn)(new_state, batch)
    before = jax.tree_util.tree_leaves(state.teacher)
    after = jax.tree_util.tree_leaves(new_state.teacher)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # model params did change
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(new_state.params))
    )
    assert changed


def test_dp_loss_matches_single_device(setup):
    """The contrastive losses are global-batch B×B; sharding the batch over 8
    devices must not change any loss term (SURVEY §2.9 all-gather semantics)."""
    cfg, params, teacher, batch, key = setup
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, compute_dtype="float32")
    )
    init_fn, step_fn = make_train_step(cfg, 100)
    state = init_fn(params, teacher, key)

    # single device
    _, m1 = jax.jit(step_fn)(state, batch)

    devices = jax.devices()
    assert len(devices) >= 8, "conftest should provide 8 virtual CPU devices"
    mesh = Mesh(np.asarray(devices[:8]).reshape(8, 1), ("data", "model"))
    bshard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    sharded_batch = {k: jax.device_put(v, bshard) for k, v in batch.items()}
    sharded_state = jax.device_put(state, repl)
    _, m8 = jax.jit(step_fn)(sharded_state, sharded_batch)

    for k in ("loss", "txt_loss", "margin_loss", "face_name_loss"):
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), rtol=2e-5, atol=2e-5,
            err_msg=f"{k} differs between 1-device and 8-device mesh",
        )


def test_eval_step(setup):
    cfg, params, teacher, batch, key = setup
    m = jax.jit(lambda p, b: eval_step(p, b, cfg))({"model": params["model"]}, batch)
    assert np.isfinite(float(m["val_loss"]))


def test_get_hidden_states_ner(setup):
    from vacnic_tpu.train.train_step import (
        create_mask, face_mask_from_emb, get_hidden_states_ner)

    cfg, params, teacher, batch, key = setup
    src_ids = batch["article_ids"]
    ner = jax.jit(lambda p: get_hidden_states_ner(
        p, src_ids, create_mask(src_ids), batch["image_cls"],
        batch["names_art_ids"], create_mask(batch["names_art_ids"]),
        batch["face_emb"], face_mask_from_emb(batch["face_emb"]),
        cfg.bart, cfg.fusion))(params["model"])
    # the NER *stream* keeps max_ner_type_len (the compressed prefix is
    # per-layer ephemeral; reference hidden_states_ner is the stream)
    assert ner.shape == (src_ids.shape[0], batch["names_art_ids"].shape[1],
                         cfg.bart.d_model)
    assert np.isfinite(np.asarray(ner)).all()
    # stop-gradient: derivative through the helper is exactly zero
    g = jax.grad(lambda p: jnp.sum(get_hidden_states_ner(
        p, src_ids, create_mask(src_ids), batch["image_cls"],
        batch["names_art_ids"], create_mask(batch["names_art_ids"]),
        batch["face_emb"], face_mask_from_emb(batch["face_emb"]),
        cfg.bart, cfg.fusion)))(params["model"])
    assert float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.abs(x).sum(), g, jnp.float32(0))) == 0.0


def test_extract_visual_prompt(setup):
    cfg, params, teacher, batch, key = setup
    prompt = F.extract_visual_prompt(params["model"], batch["image_cls"],
                                     cfg.bart, cfg.fusion)
    bsz = batch["image_cls"].shape[0]
    assert prompt.shape == (bsz, cfg.fusion.prompt_size, cfg.bart.d_model)
    # matches the in-encoder mapping (fusion.map_image_prompt, reference :1272-1278)
    want = F.map_image_prompt(params["model"]["encoder"], batch["image_cls"],
                              cfg.bart, cfg.fusion)
    np.testing.assert_allclose(np.asarray(prompt), np.asarray(want), rtol=1e-6)


def test_teacher_pooled_cache_matches_teacher_forward():
    """compute_losses with a precomputed `teacher_pooled` batch entry must
    reproduce the teacher-forward loss exactly (the teacher is deterministic;
    train/loop.py caches its pooled state across epochs)."""
    import dataclasses

    import numpy as np

    from vacnic_tpu.core.config import VacnicConfig
    from vacnic_tpu.core.rng import set_random_seed
    from vacnic_tpu.data.synthetic import synthetic_batch
    from vacnic_tpu.models import bart as B
    from vacnic_tpu.models import fusion as F
    from vacnic_tpu.train.train_step import compute_losses

    cfg = VacnicConfig.tiny()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, teacher_cache=True,
                                       grad_checkpoint=False))
    key = set_random_seed(0)
    params = {"model": F.multimodal_bart_init(key, cfg.bart, cfg.fusion)}
    teacher = B.bart_init(jax.random.fold_in(key, 1), cfg.bart)
    batch = synthetic_batch(cfg, 4)

    l1, m1 = compute_losses(params, teacher, batch, cfg, dropout_rng=None)
    assert "teacher_pooled" in m1  # surfaced for the loop to cache
    batch2 = dict(batch)
    batch2["teacher_pooled"] = m1["teacher_pooled"]
    l2, m2 = compute_losses(params, teacher, batch2, cfg, dropout_rng=None)
    assert "teacher_pooled" not in m2  # cached path skips the teacher forward
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(m1["margin_loss"]), float(m2["margin_loss"]),
                               rtol=1e-6, atol=1e-6)


def test_rbg_prng_train_step():
    """TrainConfig.prng_impl="rbg" (TPU-hardware RNG for dropout masks) must
    run a full train step with finite decreasing loss. Process-global default
    impl is restored afterwards so other tests keep threefry."""
    import jax

    from vacnic_tpu.train.train_step import make_train_step

    cfg = VacnicConfig.tiny()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, prng_impl="rbg"))
    try:
        key = set_random_seed(cfg.train.seed, cfg.train.prng_impl)
        assert key.shape == (4,)  # rbg key
        params = {"model": F.multimodal_bart_init(key, cfg.bart, cfg.fusion)}
        teacher = B.bart_init(jax.random.fold_in(key, 1), cfg.bart)
        init_fn, step_fn = make_train_step(cfg, 10)
        state = init_fn(params, teacher, jax.random.fold_in(key, 2))
        batch = synthetic_batch(cfg, 4)
        step = jax.jit(step_fn)
        losses = []
        for _ in range(3):
            state, m = step(state, batch)
            losses.append(float(np.asarray(m["loss"])))
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]
    finally:
        jax.config.update("jax_default_prng_impl", "threefry2x32")


def test_clip_contrastive_loss_branch():
    """The optional CLIP contrastive loss (train...match.py:312-321; released
    script disables it) must run jitted end-to-end: flat vision tower at
    params['clip'], text tower at params['clip_text'] — and both CLIP groups
    stay frozen (the reference never steps the CLIP optimizer, :376-378)."""
    from vacnic_tpu.models.clip_text import clip_text_init
    from vacnic_tpu.models.clip_vit import clip_vision_init

    cfg = VacnicConfig.tiny()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, no_clip_loss=False))
    key = set_random_seed(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    text_tower = clip_text_init(
        k5, vocab_size=64, context_length=16, width=32, layers=2,
        heads=cfg.clip.text_heads, output_dim=cfg.clip.output_dim)
    params = {
        "model": F.multimodal_bart_init(k1, cfg.bart, cfg.fusion),
        "clip": clip_vision_init(k4, cfg.clip),
        # the integer "heads" metadata leaf must be stripped before the tree
        # is differentiated (value_and_grad rejects int inputs) — same as cli
        "clip_text": {k: v for k, v in text_tower.items() if k != "heads"},
    }
    teacher = B.bart_init(k2, cfg.bart)
    batch = synthetic_batch(cfg, batch_size=4, seed=1, with_pixels=True)
    rng = np.random.RandomState(3)
    batch["caption_ids_clip"] = jnp.asarray(
        rng.randint(1, 63, size=(4, 16)).astype(np.int32))

    init_fn, step_fn = make_train_step(cfg, 100)
    state = init_fn(params, teacher, k3)
    step = jax.jit(step_fn)
    state1, m = step(state, batch)
    state2, _ = step(state1, batch)

    t = cfg.train
    assert np.isfinite(float(m["clip_loss"]))
    expect = (float(m["txt_loss"]) + t.alpha * float(m["margin_loss"])
              + t.mapping_loss_weight * float(m["face_name_loss"])
              + float(m["clip_loss"]))
    assert abs(float(m["loss"]) - expect) < 1e-4
    for grp in ("clip", "clip_text"):
        for a, b in zip(jax.tree_util.tree_leaves(state.params[grp]),
                        jax.tree_util.tree_leaves(state2.params[grp])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the trained model params did change
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.params["model"]),
                        jax.tree_util.tree_leaves(state2.params["model"])))


def test_tie_fusion_attn_weights_reapplies_after_merge():
    """init_attn_weight ties cross_attn_img_ner/self_attn_img_name to
    self_attn at init; after pretrained weights replace self_attn (cli
    --init-bart merge) the tie must be re-applied so the fusion attentions
    copy the PRETRAINED weights, not the discarded random init
    (init_attn_weight_encoder runs on the loaded model, ref :1897-1898)."""
    cfg = VacnicConfig.tiny()
    fcfg = dataclasses.replace(cfg.fusion, init_attn_weight=True)
    params = F.multimodal_bart_init(jax.random.PRNGKey(0), cfg.bart, fcfg)
    # simulate the pretrained merge: overwrite each fused layer's self_attn
    layers = list(params["encoder"]["layers"])
    for i in fcfg.fusion_layers:
        lp = dict(layers[i])
        lp["self_attn"] = jax.tree_util.tree_map(
            lambda a: a + 1.0, lp["self_attn"])
        layers[i] = lp
    params["encoder"]["layers"] = tuple(layers)
    params = F.tie_fusion_attn_weights(params, fcfg)
    for i in fcfg.fusion_layers:
        lp = params["encoder"]["layers"][i]
        for member in ("cross_attn_img_ner", "self_attn_img_name"):
            for a, b in zip(jax.tree_util.tree_leaves(lp[member]),
                            jax.tree_util.tree_leaves(lp["self_attn"])):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_freeze_clip_false_trains_clip_group():
    """freeze_clip=False must wire the 1e-7 CLIP optimizer group into the
    train step (the reference's optimizer_clip, train...match.py:85-109):
    with the CLIP contrastive loss on, the CLIP towers must actually move."""
    from vacnic_tpu.models.clip_text import clip_text_init
    from vacnic_tpu.models.clip_vit import clip_vision_init

    cfg = VacnicConfig.tiny()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, no_clip_loss=False, freeze_clip=False,
            # lift the CLIP lr so one update is far above f32 ulp noise
            lr_clip=1e-3))
    key = set_random_seed(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    text_tower = clip_text_init(
        k5, vocab_size=64, context_length=16, width=32, layers=2,
        heads=cfg.clip.text_heads, output_dim=cfg.clip.output_dim)
    params = {
        "model": F.multimodal_bart_init(k1, cfg.bart, cfg.fusion),
        "clip": clip_vision_init(k4, cfg.clip),
        "clip_text": {k: v for k, v in text_tower.items() if k != "heads"},
    }
    teacher = B.bart_init(k2, cfg.bart)
    batch = synthetic_batch(cfg, batch_size=4, seed=1, with_pixels=True)
    rng = np.random.RandomState(3)
    batch["caption_ids_clip"] = jnp.asarray(
        rng.randint(1, 63, size=(4, 16)).astype(np.int32))

    init_fn, step_fn = make_train_step(cfg, 100)
    state = init_fn(params, teacher, k3)
    step = jax.jit(step_fn)
    state1, _ = step(state, batch)
    state2, _ = step(state1, batch)  # step 2: warmup lr is nonzero

    for grp in ("clip", "clip_text"):
        assert any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(state.params[grp]),
                            jax.tree_util.tree_leaves(state2.params[grp]))
        ), f"{grp} params did not move with freeze_clip=False"
