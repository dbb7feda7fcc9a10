"""Data-layer tests: entity-id fixed-length contract, collate padding
conventions (incl. empty-face ones-rows), tokenizer round-trips, pipeline
prefetch (SURVEY §4: tiny synthetic fixture exercising every collate branch)."""

import numpy as np
import pytest

from vacnic_tpu.data.collate import collate, pad_names_3d
from vacnic_tpu.data.pipeline import PrefetchLoader
from vacnic_tpu.data.preprocess.entity_ids import (
    dedupe_entities,
    find_first_sublist,
    make_entity_ids,
    person_token_positions,
)
from vacnic_tpu.data.tokenize import HashWordTokenizer


@pytest.fixture(scope="module")
def tok():
    t = HashWordTokenizer(vocab_size=50265)
    t.add_special_tokens(["<ENT>", "<NONAME>", "<PERSON>", "<ORGNORP>", "<GPELOC>"])
    return t


def test_special_token_ids(tok):
    assert tok.added_tokens["<ENT>"] == 50265
    assert tok.added_tokens["<NONAME>"] == 50266
    assert tok.added_tokens["<PERSON>"] == 50267


def test_gpt2_pretokenizer_classes():
    """Letters/numbers/punct split separately (GPT-2 \\p{L}/\\p{N} classes) —
    merged `\\w+` diverges from the pretrained BART vocab on 'COVID19' etc."""
    from vacnic_tpu.data.tokenize import _GPT2_SPLIT

    assert _GPT2_SPLIT.findall("COVID19 cases") == ["COVID", "19", " cases"]
    assert _GPT2_SPLIT.findall("foo_bar") == ["foo", "_", "bar"]
    assert _GPT2_SPLIT.findall("it's 9/11") == ["it", "'s", " 9", "/", "11"]


def test_find_first_sublist():
    assert find_first_sublist([1, 2, 3, 4], [3, 4]) == (2, 4)
    assert find_first_sublist([1, 2], [5]) is None


def test_dedupe_entities():
    assert dedupe_entities(["Barack Obama", "Obama", "Biden"]) == ["Barack Obama", "Biden"]
    # reference compare_ner semantics: exact duplicates eliminate each other
    assert dedupe_entities(["John Smith", "John Smith"]) == []


def test_make_entity_ids_contract(tok):
    flat, separate = make_entity_ids("Alice met Bob", ["Alice", "Bob"], tok, max_length=20)
    assert len(flat) == 20
    assert flat[0] == tok.bos_token_id
    assert tok.added_tokens["<ENT>"] in flat  # separator present
    # per-entity rows end with a <NONAME> row
    assert separate[-1][1] == tok.added_tokens["<NONAME>"]
    # empty entity list → <NONAME> fallback
    flat2, _ = make_entity_ids("nothing here", [], tok, max_length=10)
    assert flat2[1] == tok.added_tokens["<NONAME>"]
    assert len(flat2) == 10


def test_make_entity_ids_truncation(tok):
    ents = [f"Entity{i} LongName{i}" for i in range(50)]
    flat, _ = make_entity_ids("text", ents, tok, max_length=12)
    assert len(flat) == 12


def test_person_positions():
    ids = [5, 50267, 50267, 6, 50267, 7]
    spans = person_token_positions(ids, person_token_id=50267)
    assert spans == [[1, 2], [4, 4]]
    spans_tgt = person_token_positions(ids, person_token_id=50267, is_tgt_input=True)
    assert spans_tgt == [[2, 3], [5, 5]]


def _mk_sample(tok, n_faces, n_names, seed):
    rng = np.random.RandomState(seed)
    return {
        "article_ids": tok.encode("some article text here", max_length=16),
        "caption_ids": tok.encode("a caption", max_length=8),
        "names_art_ids": [0, 11, 12, 2],
        "names_ids_flatten": [0, 13, 2],
        "names_ids": [[0, 14, 2]] * n_names + [[0, 50266, 2]],
        "face_emb": rng.randn(n_faces, 512).astype(np.float32),
        "caption": "a caption",
        "pixels": rng.randn(8, 8, 3).astype(np.float32),
    }


def test_collate_branches(tok):
    # three samples: faces+names / faces-only / neither (SURVEY §4 fixture)
    samples = [_mk_sample(tok, 2, 2, 0), _mk_sample(tok, 1, 0, 1), _mk_sample(tok, 0, 0, 2)]
    batch = collate(samples, article_len=16, caption_len=8, ner_len=10, ner_len_gt=6,
                    max_faces=4, num_names=4, name_len=5)
    assert batch["article_ids"].shape == (3, 16)
    assert batch["face_emb"].shape == (3, 4, 512)
    # empty-face sample → all rows are ones (the reference's [[ ]] → ones pad)
    np.testing.assert_array_equal(batch["face_emb"][2], np.ones((4, 512), np.float32))
    # partially-filled: first row real, rest ones
    assert not np.allclose(batch["face_emb"][0][0], 1.0)
    np.testing.assert_array_equal(batch["face_emb"][0][2:], np.ones((2, 512)))
    # names_ids 3-D: missing names filled with <bos><NONAME><eos>
    assert batch["names_ids"].shape == (3, 4, 5)
    np.testing.assert_array_equal(batch["names_ids"][2][0][:3], [0, 50266, 2])
    # pad id 1 on token streams
    assert batch["caption_ids"][0][-1] == 1


def test_pad_names_3d_truncation():
    rows = [[[0, 5, 6, 7, 8, 9, 2]]]
    out = pad_names_3d(rows, num_names=2, name_len=4)
    assert out.shape == (1, 2, 4)
    np.testing.assert_array_equal(out[0, 0], [0, 5, 6, 7])


class _ToyDataset:
    def __init__(self, tok, n=10):
        self.tok, self.n = tok, n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return _mk_sample(self.tok, i % 3, i % 2, int(i))


def test_prefetch_loader(tok):
    ds = _ToyDataset(tok, n=10)
    loader = PrefetchLoader(
        ds, batch_size=4,
        collate_fn=lambda s: collate(s, article_len=16, caption_len=8, ner_len=10,
                                     ner_len_gt=6, max_faces=4, num_names=4, name_len=5),
        num_workers=2, seed=0,
    )
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    assert batches[0]["article_ids"].shape == (4, 16)
    # deterministic across epochs with same seed? shuffle differs per epoch:
    b2 = list(loader)
    assert len(b2) == 2


def test_prefetch_loader_abandoned_iterator_terminates(tok):
    """Breaking out of iteration mid-epoch (fit() at max_steps) must not leak
    a producer thread blocked in q.put on the full prefetch queue."""
    import threading
    import time

    ds = _ToyDataset(tok, n=64)
    loader = PrefetchLoader(
        ds, batch_size=4,
        collate_fn=lambda s: collate(s, article_len=16, caption_len=8, ner_len=10,
                                     ner_len_gt=6, max_faces=4, num_names=4, name_len=5),
        num_workers=2, prefetch=1, seed=0,
    )
    before = {t.ident for t in threading.enumerate()}
    it = iter(loader)
    next(it)  # producer now races ahead and blocks on the size-1 queue
    it.close()  # abandon: generator finally sets the stop event
    deadline = time.time() + 10.0
    while time.time() < deadline:
        extra = [t for t in threading.enumerate()
                 if t.ident not in before and t.is_alive()]
        if not extra:
            break
        time.sleep(0.05)
    assert not extra, f"leaked producer threads: {extra}"


def test_prefetch_loader_producer_error_surfaces(tok):
    """A dataset read/collate failure inside the producer thread must raise in
    the consumer, not deadlock `for batch in loader` on an empty queue."""
    import pytest

    class _BadDataset(_ToyDataset):
        def __getitem__(self, i):
            if int(i) == 5:
                raise OSError("corrupt image file")
            return super().__getitem__(i)

    loader = PrefetchLoader(
        _BadDataset(tok, n=8), batch_size=4,
        collate_fn=lambda s: collate(s, article_len=16, caption_len=8, ner_len=10,
                                     ner_len_gt=6, max_faces=4, num_names=4, name_len=5),
        num_workers=2, shuffle=False, seed=0,
    )
    with pytest.raises(OSError, match="corrupt image file"):
        list(loader)


def test_bpe_tokenizer_if_vocab_available(tmp_path):
    """Exercise the byte-level BPE with a miniature vocab/merges pair."""
    import json

    from vacnic_tpu.data.tokenize import BartBpeTokenizer, _bytes_to_unicode

    b2u = _bytes_to_unicode()
    base = ["<s>", "<pad>", "</s>", "<unk>"]
    chars = [b2u[ord(c)] for c in "abcdehlor "]
    merges = ["h e", "l l", "he ll", "Ġ h", "Ġh e"]
    merged = ["he", "ll", "hell", "Ġh", "Ġhe"]
    vocab = {t: i for i, t in enumerate(base + sorted(set(chars)) + merged)}
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n" + "\n".join(merges))

    t = BartBpeTokenizer(str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"))
    ids = t.encode("hell hello")
    assert ids[0] == t.bos_token_id and ids[-1] == t.eos_token_id
    assert vocab["hell"] in ids
    assert t.decode(ids).startswith("hell")
    t.add_special_tokens(["<ENT>"])
    ids2 = t.encode("hell <ENT> hello")
    assert t.added_tokens["<ENT>"] in ids2
