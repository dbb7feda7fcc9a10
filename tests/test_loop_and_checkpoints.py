"""Orchestration tests: fit() epoch loop with best/last checkpoints, caption
generation dump in the reference output format, and checkpoint round-trips."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vacnic_tpu.core.config import VacnicConfig
from vacnic_tpu.core.rng import set_random_seed
from vacnic_tpu.data.synthetic import synthetic_batch
from vacnic_tpu.data.tokenize import HashWordTokenizer
from vacnic_tpu.models import bart as B
from vacnic_tpu.models import fusion as F
from vacnic_tpu.train.checkpoints import CheckpointManager
from vacnic_tpu.train.loop import fit, generate_captions
from vacnic_tpu.train.train_step import make_train_step


@pytest.fixture()  # function-scoped: fit() DONATES the TrainState buffers
def setup():
    cfg = VacnicConfig.tiny()
    key = set_random_seed(0)
    params = {"model": F.multimodal_bart_init(key, cfg.bart, cfg.fusion)}
    teacher = B.bart_init(jax.random.fold_in(key, 1), cfg.bart)
    return cfg, params, teacher, key


def _loader(cfg, n_batches, bs=4, with_captions=False):
    out = []
    for i in range(n_batches):
        b = dict(synthetic_batch(cfg, bs, seed=i))
        if with_captions:
            b["caption"] = [f"ground truth caption {i} {j}" for j in range(bs)]
        out.append(b)
    return out


def test_fit_saves_best_and_last(setup, tmp_path):
    cfg, params, teacher, key = setup
    import dataclasses

    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, num_epochs=2))
    init_fn, step_fn = make_train_step(cfg, 10)
    state = init_fn(params, teacher, jax.random.fold_in(key, 2))
    out_dir = str(tmp_path / "run")
    tok = HashWordTokenizer(cfg.bart.vocab_size)
    state = fit(cfg, state, step_fn, _loader(cfg, 2),
                _loader(cfg, 1, with_captions=True), out_dir, tokenizer=tok)
    assert int(state.step) == 4
    # eval_epoch dumps BOTH gt_cap and the greedy argmax text per val step
    # (reference train...match.py:432-438)
    with open(os.path.join(out_dir, "val_outputs.json")) as f:
        val_out = json.load(f)
    first = val_out[next(iter(val_out))]
    assert set(first) == {"gt_cap", "logit_output"}
    assert len(first["logit_output"]) == len(first["gt_cap"]) == 4
    assert all(isinstance(s, str) for s in first["logit_output"])
    for sub in ("best", "last"):
        mgr = CheckpointManager(os.path.join(out_dir, sub))
        assert mgr.latest_step() is not None
        assert CheckpointManager.load_config(os.path.join(out_dir, sub)) == cfg
    # metrics JSONL written
    logs = [f for f in os.listdir(out_dir) if f.endswith(".metrics.jsonl")]
    assert logs
    # resume round-trip through a fresh template
    template = init_fn(params, teacher, jax.random.fold_in(key, 2))
    restored, at = CheckpointManager(os.path.join(out_dir, "last")).restore(template)
    assert at == int(state.step)


def test_restore_across_prng_impl(tmp_path):
    """A checkpoint saved with a threefry (2,)-shaped raw rng key must restore
    into a template holding an rbg (4,) key (the post-r3 default), and vice
    versa — the stored key is discarded (different impl, no stream continuity)
    but every other leaf comes from disk. Regression for the prng_impl flip
    breaking --resume of pre-rbg checkpoints."""
    from vacnic_tpu.train.train_step import TrainState

    def state(rng_shape, fill):
        return TrainState(
            step=jnp.asarray(7, jnp.int32),
            params={"model": {"w": jnp.full((4, 4), fill, jnp.float32)}},
            teacher={"w": jnp.full((4,), fill, jnp.float32)},
            opt_state={"mu": jnp.full((4, 4), fill, jnp.float32)},
            rng=jnp.zeros(rng_shape, jnp.uint32),
        )

    for saved_shape, tpl_shape in (((2,), (4,)), ((4,), (2,))):
        d = str(tmp_path / f"ck{saved_shape[0]}")
        mgr = CheckpointManager(d)
        mgr.save(7, state(saved_shape, 3.0))
        mgr.wait()
        template = state(tpl_shape, 0.0)._replace(
            rng=jnp.arange(tpl_shape[0], dtype=jnp.uint32))
        restored, at = CheckpointManager(d).restore(template)
        assert at == 7
        np.testing.assert_array_equal(np.asarray(restored.params["model"]["w"]),
                                      np.full((4, 4), 3.0, np.float32))
        # the template's key survives (fresh stream for the new impl)
        assert restored.rng.shape == tpl_shape
        np.testing.assert_array_equal(np.asarray(restored.rng),
                                      np.arange(tpl_shape[0], dtype=np.uint32))


def test_restore_raw_handles_extra_subtrees(tmp_path):
    """A checkpoint whose param tree carries an optional subtree the restore
    template can't predict (params['clip_text'] from a no_clip_loss=false
    run, tower dims from the CLIP ckpt file) must fail the template restore
    but load via restore_raw — the cli generate fallback (review finding)."""
    from vacnic_tpu.train.train_step import TrainState

    saved = TrainState(
        step=jnp.asarray(3, jnp.int32),
        params={"model": {"w": jnp.full((4, 4), 2.0, jnp.float32)},
                "clip": {"w": jnp.full((4,), 1.0, jnp.float32)},
                "clip_text": {"token_embedding": jnp.full((8, 4), 5.0, jnp.float32)}},
        teacher={"w": jnp.zeros((4,), jnp.float32)},
        opt_state={"mu": jnp.zeros((4, 4), jnp.float32)},
        rng=jnp.zeros((4,), jnp.uint32),
    )
    d = str(tmp_path / "ck")
    mgr = CheckpointManager(d)
    mgr.save(3, saved)
    mgr.wait()
    template = saved._replace(
        params={"model": saved.params["model"], "clip": saved.params["clip"]})
    with pytest.raises(Exception):
        CheckpointManager(d).restore(template)
    raw, at = CheckpointManager(d).restore_raw()
    assert at == 3
    rparams = raw["params"] if isinstance(raw, dict) else raw.params
    np.testing.assert_array_equal(
        np.asarray(rparams["clip_text"]["token_embedding"]),
        np.full((8, 4), 5.0, np.float32))
    np.testing.assert_array_equal(np.asarray(rparams["model"]["w"]),
                                  np.full((4, 4), 2.0, np.float32))


def test_generate_captions_output_format(setup, tmp_path):
    cfg, params, teacher, key = setup
    tok = HashWordTokenizer(cfg.bart.vocab_size)
    import dataclasses

    cfg = dataclasses.replace(cfg, decode=dataclasses.replace(cfg.decode, num_beams=2, max_length=6))
    out_path = str(tmp_path / "caps.json")
    out = generate_captions(cfg, {"model": params["model"]},
                            _loader(cfg, 2, bs=2, with_captions=True), tok,
                            out_path=out_path)
    # the reference output contract: {step: {gt, gen}} + "bleu" + "other metrics"
    assert "bleu" in out and "other metrics" in out
    sample_keys = [k for k in out if k not in ("bleu", "other metrics")]
    assert len(sample_keys) == 4
    assert set(out[sample_keys[0]]) == {"gt", "gen"}
    with open(out_path) as f:
        loaded = json.load(f)
    assert "bleu" in loaded


def test_fit_teacher_cache_epochs(setup, tmp_path):
    """fit() with teacher_cache=True: epoch 1 populates the pooled-teacher
    cache from step metrics, epoch 2 feeds it back (the cached-path program
    has a different batch pytree — both must run and train identically
    finitely). sample_idx rides through collate/_device_feed."""
    import dataclasses

    cfg, params, teacher, key = setup
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, num_epochs=2, teacher_cache=True))
    init_fn, step_fn = make_train_step(cfg, 10)
    state = init_fn(params, teacher, jax.random.fold_in(key, 2))
    loader = _loader(cfg, 2)
    for i, b in enumerate(loader):
        b["sample_idx"] = np.arange(i * 4, i * 4 + 4, dtype=np.int32)
    tok = HashWordTokenizer(cfg.bart.vocab_size)
    state = fit(cfg, state, step_fn, loader, _loader(cfg, 1, with_captions=True),
                str(tmp_path / "run"), tokenizer=tok)
    assert int(state.step) == 4
    # the teacher_pooled vectors must never leak into the metrics JSONL
    import json as _json

    with open(str(tmp_path / "run" / "run.metrics.jsonl")) as f:
        for line in f:
            assert "teacher_pooled" not in _json.loads(line)
