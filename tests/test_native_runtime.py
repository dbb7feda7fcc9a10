"""Native C runtime tests: the fastbpe merge engine must produce identical
ids to the pure-Python BPE (skipped when no system compiler is available)."""

import json
import os
import random
import string

import pytest

from vacnic_tpu.data.tokenize import BartBpeTokenizer, _bytes_to_unicode
from vacnic_tpu.runtime.native import load_fastbpe


@pytest.fixture(scope="module")
def vocab_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("vocab")
    b2u = _bytes_to_unicode()
    base = ["<s>", "<pad>", "</s>", "<unk>"]
    chars = sorted(set(b2u.values()))
    words = ["the", "hello", "world", "news", "caption", "president"]
    merges, extra, seen = [], [], set(chars)
    for w in words:
        for seq in ([b2u[b] for b in w.encode()], [b2u[b] for b in (" " + w).encode()]):
            cur = list(seq)
            while len(cur) > 1:
                merges.append(f"{cur[0]} {cur[1]}")
                cur = [cur[0] + cur[1]] + cur[2:]
                if cur[0] not in seen:
                    extra.append(cur[0])
                    seen.add(cur[0])
    vocab = {t: i for i, t in enumerate(base + chars + extra)}
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n" + "\n".join(dict.fromkeys(merges)))
    return str(d / "vocab.json"), str(d / "merges.txt")


def test_native_matches_python(vocab_files):
    if load_fastbpe() is None:
        pytest.skip("no system compiler for the native runtime")
    vf, mf = vocab_files
    tn = BartBpeTokenizer(vf, mf)
    tp = BartBpeTokenizer(vf, mf)
    tp._native_tried = True  # force pure-Python path
    assert tn._get_native() is not None

    rng = random.Random(1)
    distinct = ["".join(rng.choices(string.ascii_lowercase, k=rng.randint(2, 12))) for _ in range(500)]
    for _ in range(10):
        text = " ".join(rng.choices(distinct + ["hello", "world", "président"], k=200))
        assert tn.encode(text) == tp.encode(text)


def test_native_handles_unicode_fallback(vocab_files):
    if load_fastbpe() is None:
        pytest.skip("no system compiler for the native runtime")
    vf, mf = vocab_files
    tn = BartBpeTokenizer(vf, mf)
    tp = BartBpeTokenizer(vf, mf)
    tp._native_tried = True
    text = "héllo wörld — naïve café"
    assert tn.encode(text) == tp.encode(text)
