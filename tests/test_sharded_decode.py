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
