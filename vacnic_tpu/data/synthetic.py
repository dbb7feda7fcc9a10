"""Synthetic batch generation matching the §2.4 batch contract.

Used by tests, bench.py, and the multi-chip dry run: produces batches with
the exact static shapes and padding conventions of the data layer (pad id 1,
face pad rows of ones, per-name <bos><NONAME><eos> rows) without needing the
GoodNews/NYTimes corpora on disk.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from vacnic_tpu.core.config import VacnicConfig

NONAME_ID = 50266  # <NONAME> (collate special_token_id, goodnews...py:118)


def synthetic_batch(cfg: VacnicConfig, batch_size: int, seed: int = 0,
                    with_pixels: bool = False, num_names: int = 3,
                    name_len: int = 4) -> dict[str, jnp.ndarray]:
    rng = np.random.RandomState(seed)
    b = batch_size
    bart, fus, data = cfg.bart, cfg.fusion, cfg.data
    v = bart.vocab_size

    def ids(shape, maxlen_pad=None):
        x = rng.randint(4, min(v, 50000), size=shape).astype(np.int32)
        return x

    src = ids((b, data.article_max_length))
    src[:, 0] = bart.bos_token_id
    # ragged pad tails
    for i in range(b):
        pad_from = rng.randint(data.article_max_length // 2, data.article_max_length)
        src[i, pad_from - 1] = bart.eos_token_id
        src[i, pad_from:] = bart.pad_token_id

    tgt = ids((b, data.caption_max_length))
    tgt[:, 0] = bart.bos_token_id
    for i in range(b):
        pad_from = rng.randint(4, data.caption_max_length)
        tgt[i, pad_from - 1] = bart.eos_token_id
        tgt[i, pad_from:] = bart.pad_token_id

    # name arrays are embedded by the separate NER table (fusion.py
    # embed_ner_stream; reference :1253-1260), so their ids must stay below
    # ner_vocab_size as well — in the real pipeline both tables cover the
    # BART vocab, but tests shrink them independently, and out-of-range
    # gather indices FILL WITH NaN under jit (burned: an inconsistent
    # vocab_size=16500 / ner_vocab_size=128 test config NaN-poisoned every
    # logit and both beam paths decoded garbage)
    nv = min(v, fus.ner_vocab_size, 50000)
    names_art = rng.randint(4, nv, size=(b, fus.max_ner_type_len)).astype(np.int32)
    names_art[:, 0] = bart.bos_token_id
    names_art[:, -1] = bart.pad_token_id

    # names_3d (names_ids) is ALSO embedded through the NER table
    # (train_step.embed_names_3d), so the same nv cap applies — incl. the
    # <NONAME> sentinel, which at full vocab is 50266 but must stay inside
    # a shrunk test NER table
    noname = min(NONAME_ID, v - 1, fus.ner_vocab_size - 1)
    names_3d = np.full((b, num_names, name_len), bart.pad_token_id, np.int32)
    names_3d[:, :, 0] = bart.bos_token_id
    names_3d[:, :, 1] = rng.randint(4, nv, size=(b, num_names))
    names_3d[:, :, 2] = bart.eos_token_id
    names_3d[:, -1, 1] = noname  # trailing <NONAME> row (goodnews...py:356)

    names_flat = rng.randint(4, nv, size=(b, fus.max_ner_type_len_gt)).astype(np.int32)
    names_flat[:, 0] = bart.bos_token_id

    faces = rng.randn(b, fus.max_faces, fus.face_feature_dim).astype(np.float32)
    # pad: row of ones for missing faces (pad_tensor_feat, goodnews...py:48)
    faces[:, fus.max_faces // 2 :, :] = 1.0

    batch = {
        "article_ids": jnp.asarray(src),
        "caption_ids": jnp.asarray(tgt),
        "names_art_ids": jnp.asarray(names_art),
        "names_ids": jnp.asarray(names_3d),
        "names_ids_flatten": jnp.asarray(names_flat),
        "face_emb": jnp.asarray(faces),
    }
    if with_pixels:
        batch["pixels"] = jnp.asarray(
            rng.randn(b, cfg.clip.image_size, cfg.clip.image_size, 3).astype(np.float32)
        )
    else:
        batch["image_cls"] = jnp.asarray(rng.randn(b, fus.img_size).astype(np.float32))
    return batch
