"""Golden parity: functional JAX BART vs installed torch/transformers BART on a
tiny random config (SURVEY §4 golden-parity strategy — no network needed)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vacnic_tpu.core.config import BartConfig
from vacnic_tpu.models import bart as B
from vacnic_tpu.models.weights_io import convert_bart

TINY = BartConfig.tiny()


def make_hf_tiny(seed=0):
    from transformers import BartConfig as HFBartConfig, BartForConditionalGeneration

    torch.manual_seed(seed)
    hf_cfg = HFBartConfig(
        vocab_size=TINY.vocab_size,
        d_model=TINY.d_model,
        encoder_layers=TINY.encoder_layers,
        decoder_layers=TINY.decoder_layers,
        encoder_attention_heads=TINY.encoder_attention_heads,
        decoder_attention_heads=TINY.decoder_attention_heads,
        encoder_ffn_dim=TINY.encoder_ffn_dim,
        decoder_ffn_dim=TINY.decoder_ffn_dim,
        max_position_embeddings=TINY.max_position_embeddings,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        activation_function="gelu",
        scale_embedding=False,
        pad_token_id=1,
        bos_token_id=0,
        eos_token_id=2,
        decoder_start_token_id=2,
        forced_bos_token_id=0,
    )
    model = BartForConditionalGeneration(hf_cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def pair():
    hf = make_hf_tiny()
    params = convert_bart(hf.state_dict(), TINY)
    return hf, params


def _batch(rng, bsz=2, src=9, tgt=7):
    src_ids = rng.randint(4, TINY.vocab_size, size=(bsz, src))
    src_ids[0, -2:] = 1  # pad tail of row 0
    mask = (src_ids != 1).astype(np.int64)
    tgt_ids = rng.randint(4, TINY.vocab_size, size=(bsz, tgt))
    dec_in = np.asarray(B.shift_tokens_right(jnp.asarray(tgt_ids), 1, 2))
    return src_ids, mask, tgt_ids, dec_in


def test_forward_logits_parity(pair, rng):
    hf, params = pair
    src_ids, mask, _, dec_in = _batch(rng)
    with torch.no_grad():
        out = hf(
            input_ids=torch.tensor(src_ids),
            attention_mask=torch.tensor(mask),
            decoder_input_ids=torch.tensor(dec_in),
        )
    ours = B.bart_forward(params, jnp.asarray(src_ids), jnp.asarray(mask), jnp.asarray(dec_in), TINY)
    np.testing.assert_allclose(
        np.asarray(ours["logits"]), out.logits.numpy(), atol=2e-4, rtol=2e-4
    )


def test_encoder_parity(pair, rng):
    hf, params = pair
    src_ids, mask, _, _ = _batch(rng)
    with torch.no_grad():
        enc = hf.model.encoder(
            input_ids=torch.tensor(src_ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state
    ours = B.encoder_fwd(params, jnp.asarray(src_ids), jnp.asarray(mask), TINY)
    np.testing.assert_allclose(np.asarray(ours), enc.numpy(), atol=1e-4, rtol=1e-4)


def test_shift_tokens_right_eos_start():
    """Reference uses *eos* (2) as decoder start (train...match.py:267)."""
    ids = jnp.asarray([[0, 5, 6, 2, 1]])
    shifted = B.shift_tokens_right(ids, pad_token_id=1, decoder_start_token_id=2)
    assert shifted.tolist() == [[2, 0, 5, 6, 2]]


def test_incremental_decode_matches_full(pair, rng):
    """KV-cached step-by-step decode must equal the teacher-forced forward."""
    hf, params = pair
    src_ids, mask, _, dec_in = _batch(rng, tgt=5)
    full = B.bart_forward(params, jnp.asarray(src_ids), jnp.asarray(mask), jnp.asarray(dec_in), TINY)

    enc_out = B.encoder_fwd(params, jnp.asarray(src_ids), jnp.asarray(mask), TINY)
    cache = B.init_cache(params, dec_in.shape[0], dec_in.shape[1], enc_out, TINY)
    step_logits = []
    for t in range(dec_in.shape[1]):
        tok = jnp.asarray(dec_in[:, t : t + 1])
        dec_h, cache = B.decoder_fwd(
            params, tok, enc_out, jnp.asarray(mask), TINY, cache=cache, cache_index=jnp.int32(t)
        )
        step_logits.append(B.lm_logits(params, dec_h)[:, 0])
    inc = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full["logits"]), atol=1e-4, rtol=1e-4)


def test_grad_flow():
    """Loss differentiates end-to-end (sanity for the train step)."""
    key = jax.random.PRNGKey(0)
    params = B.bart_init(key, TINY)
    src = jnp.ones((2, 6), jnp.int32) * 5
    mask = jnp.ones((2, 6), jnp.int32)
    tgt = jnp.ones((2, 4), jnp.int32) * 7
    dec_in = B.shift_tokens_right(tgt, 1, 2)

    def loss_fn(p):
        out = B.bart_forward(p, src, mask, dec_in, TINY)
        return jnp.mean(out["logits"] ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)
