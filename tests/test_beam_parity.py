"""Beam-search token parity vs installed transformers on tiny random BART.

The BASELINE north star calls for bit-compatible captions; this pins our
jitted beam search to HF `generate` semantics (beam 5, length_penalty 2.0,
eos decoder start, forced bos — README.md:8 decode config) on models where
we control every weight.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from vacnic_tpu.core.config import BartConfig, DecodeConfig
from vacnic_tpu.models.weights_io import convert_bart
from vacnic_tpu.infer.generate import generate_text_bart

from tests.test_bart_parity import make_hf_tiny, TINY


def _hf_generate(hf, src_ids, mask, dcfg: DecodeConfig):
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor(src_ids),
            attention_mask=torch.tensor(mask),
            num_beams=dcfg.num_beams,
            max_length=dcfg.max_length,
            length_penalty=dcfg.length_penalty,
            early_stopping=dcfg.early_stopping,
            min_length=dcfg.min_length,
            no_repeat_ngram_size=dcfg.no_repeat_ngram_size,
            forced_bos_token_id=0,
            decoder_start_token_id=2,
            do_sample=False,
        )
    return out.numpy()


def _trim(row, pad=1):
    row = list(row)
    while row and row[-1] == pad:
        row.pop()
    return row


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("lp,ngram", [(2.0, 0), (1.0, 0), (2.0, 3)])
def test_beam_tokens_match_hf(seed, lp, ngram):
    hf = make_hf_tiny(seed=seed)
    params = convert_bart(hf.state_dict(), TINY)
    rng = np.random.RandomState(seed + 100)
    src = rng.randint(4, TINY.vocab_size, size=(2, 8))
    src[1, -3:] = 1
    mask = (src != 1).astype(np.int64)

    dcfg = DecodeConfig(
        num_beams=4, max_length=12, length_penalty=lp, early_stopping=True,
        min_length=0, no_repeat_ngram_size=ngram,
    )
    hf_out = _hf_generate(hf, src, mask, dcfg)
    seqs, scores = generate_text_bart(params, jnp.asarray(src), jnp.asarray(mask), TINY, dcfg)
    seqs = np.asarray(seqs)
    for i in range(src.shape[0]):
        assert _trim(seqs[i]) == _trim(hf_out[i]), (
            f"row {i}: ours={_trim(seqs[i])} hf={_trim(hf_out[i])}"
        )
