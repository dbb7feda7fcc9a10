"""Gradient-checkpoint (remat) coverage: the full-train default config path.

Pins the bug found by bench_train: RngStream objects must not cross
jax.checkpoint; remat and non-remat must agree exactly when deterministic and
both must train with dropout on.
"""

import dataclasses

import numpy as np
import jax

from vacnic_tpu.core.config import VacnicConfig
from vacnic_tpu.core.rng import set_random_seed
from vacnic_tpu.data.synthetic import synthetic_batch
from vacnic_tpu.models import bart as B
from vacnic_tpu.models import fusion as F
from vacnic_tpu.train.train_step import compute_losses, make_train_step


def _setup(grad_checkpoint: bool):
    cfg = VacnicConfig.tiny()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, grad_checkpoint=grad_checkpoint)
    )
    key = set_random_seed(0)
    params = {"model": F.multimodal_bart_init(key, cfg.bart, cfg.fusion)}
    teacher = B.bart_init(jax.random.fold_in(key, 1), cfg.bart)
    batch = synthetic_batch(cfg, 4)
    return cfg, params, teacher, batch, key


def test_remat_matches_no_remat_deterministic():
    cfg_r, params, teacher, batch, _ = _setup(True)
    cfg_n = dataclasses.replace(
        cfg_r, train=dataclasses.replace(cfg_r.train, grad_checkpoint=False)
    )
    l1, _ = compute_losses(params, teacher, batch, cfg_r, dropout_rng=None)
    l2, _ = compute_losses(params, teacher, batch, cfg_n, dropout_rng=None)
    assert abs(float(l1) - float(l2)) < 1e-6


def test_remat_grad_matches_no_remat():
    cfg_r, params, teacher, batch, _ = _setup(True)
    cfg_n = dataclasses.replace(
        cfg_r, train=dataclasses.replace(cfg_r.train, grad_checkpoint=False)
    )

    def loss(cfg):
        return lambda p: compute_losses(p, teacher, batch, cfg, dropout_rng=None)[0]

    g_r = jax.grad(loss(cfg_r))(params)
    g_n = jax.grad(loss(cfg_n))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_r), jax.tree_util.tree_leaves(g_n)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_remat_trains_with_dropout():
    cfg, params, teacher, batch, key = _setup(True)
    init_fn, step_fn = make_train_step(cfg, 10)
    state = init_fn(params, teacher, jax.random.fold_in(key, 2))
    step = jax.jit(step_fn)
    losses = []
    for _ in range(3):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))


def test_remat_names_policy_grad_matches(monkeypatch):
    """VACNIC_REMAT_POLICY=names:ffn_pre,attn_qkv (the measured train-throughput
    config) must not change gradients — only what is stored vs recomputed."""
    cfg_r, params, teacher, batch, _ = _setup(True)
    cfg_n = dataclasses.replace(
        cfg_r, train=dataclasses.replace(cfg_r.train, grad_checkpoint=False)
    )

    def loss(cfg):
        return lambda p: compute_losses(p, teacher, batch, cfg, dropout_rng=None)[0]

    g_n = jax.grad(loss(cfg_n))(params)
    monkeypatch.setenv("VACNIC_REMAT_POLICY", "names:ffn_pre,attn_qkv")
    g_r = jax.grad(loss(cfg_r))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_r), jax.tree_util.tree_leaves(g_n)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)
