"""Unit tests for the loss stack (SURVEY §4 recommended unit coverage):
SECLA batch_softmax on hand-computed cases, CoLaM hinge on known similarities,
masked pooling incl. the all-masked NaN→1.0 rule, LM CE ignore-pad."""

import numpy as np
import pytest
import jax.numpy as jnp

from vacnic_tpu.train import losses as L

torch = pytest.importorskip("torch")


def test_pool_matches_reference_semantics():
    h = jnp.asarray(np.random.RandomState(0).randn(2, 3, 4).astype(np.float32))
    mask = jnp.asarray([[1, 1, 0], [0, 0, 0]])
    out = np.asarray(L.pool(h, mask))
    expect0 = np.asarray(h)[0, :2].mean(axis=0)
    np.testing.assert_allclose(out[0], expect0, rtol=1e-6)
    # all-masked row → ones (reference nan_to_num(nan=1.0), train...match.py:184)
    np.testing.assert_allclose(out[1], np.ones(4), rtol=0)


def test_lm_ce_matches_torch_ignore_index():
    rng = np.random.RandomState(1)
    logits = rng.randn(2, 5, 7).astype(np.float32)
    labels = rng.randint(0, 7, size=(2, 5))
    labels[0, 3:] = 1  # pad
    ours = float(L.lm_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), ignore_index=1))
    ref = torch.nn.functional.cross_entropy(
        torch.tensor(logits).reshape(-1, 7), torch.tensor(labels).reshape(-1), ignore_index=1
    ).item()
    assert abs(ours - ref) < 1e-5


def test_colam_hinge_known_values():
    # identical states → sim 1 → loss = max(0, margin-1) = 0 for margin 1
    h = jnp.asarray(np.random.RandomState(2).randn(3, 4, 8).astype(np.float32))
    mask = jnp.ones((3, 4), jnp.int32)
    assert float(L.colam_margin_loss(h, h, mask, margin=1.0)) < 1e-6
    # orthogonal states → sim 0 → loss = margin
    a = jnp.zeros((1, 2, 4)).at[:, :, 0].set(1.0)
    b = jnp.zeros((1, 2, 4)).at[:, :, 1].set(1.0)
    m = jnp.ones((1, 2), jnp.int32)
    assert abs(float(L.colam_margin_loss(a, b, m, margin=0.7)) - 0.7) < 1e-6


def test_secla_matches_torch_reference():
    """Pin secla_loss to the reference BatchSoftmax formula
    (train...match.py:631-660) re-expressed in torch."""
    rng = np.random.RandomState(3)
    B, F, N, D = 4, 3, 5, 8
    face = rng.randn(B, F, D).astype(np.float32)
    ner = rng.randn(B, N, D).astype(np.float32)

    tface, tner = torch.tensor(face), torch.tensor(ner)
    face_ner = torch.matmul(tner.unsqueeze(1), tface.permute(0, 2, 1))  # [B,B,N,F]
    ner_face = torch.matmul(tface.unsqueeze(1), tner.permute(0, 2, 1))  # [B,B,F,N]

    def batch_softmax(match):
        bsz, _, spans, _ = match.size()
        scores = match.max(-1).values.sum(-1) / spans
        return torch.nn.functional.cross_entropy(scores, torch.arange(bsz))

    ref = (batch_softmax(face_ner) + batch_softmax(ner_face)).item()
    ours = float(L.secla_loss(jnp.asarray(face), jnp.asarray(ner)))
    assert abs(ours - ref) < 1e-5


def test_infonce_symmetric():
    rng = np.random.RandomState(4)
    a = jnp.asarray(rng.randn(3, 2, 8).astype(np.float32))
    am = jnp.ones((3, 2), jnp.int32)
    b = jnp.asarray(rng.randn(3, 4, 8).astype(np.float32))
    bm = jnp.ones((3, 4), jnp.int32)
    loss = float(L.face_name_infonce(a, am, b, bm, jnp.float32(10.0)))
    assert np.isfinite(loss) and loss > 0


def test_scale_by_adam_low_precision_tracks_fp32():
    """bf16-moment Adam must track optax's fp32 scale_by_adam to bf16
    resolution over multiple steps (update math is fp32; only carried
    state is low precision)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vacnic_tpu.train.optim import scale_by_adam_low_precision

    ref = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    low = scale_by_adam_low_precision(0.9, 0.999, 1e-8)
    params = {"w": jnp.zeros((4, 8), jnp.float32)}
    s_ref, s_low = ref.init(params), low.init(params)
    key = jax.random.PRNGKey(0)
    for i in range(5):
        g = {"w": jax.random.normal(jax.random.fold_in(key, i), (4, 8), jnp.float32)}
        u_ref, s_ref = ref.update(g, s_ref)
        u_low, s_low = low.update(g, s_low)
        np.testing.assert_allclose(np.asarray(u_low["w"]), np.asarray(u_ref["w"]),
                                   rtol=2e-2, atol=2e-2)
    assert s_low.mu["w"].dtype == jnp.bfloat16 and s_low.nu["w"].dtype == jnp.bfloat16
