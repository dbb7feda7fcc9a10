"""CLIP BPE tokenizer: id-level parity vs the installed HF CLIPTokenizer
(same algorithm as OpenAI clip.tokenize, goodnews...py:628), OpenAI-gz vocab
loading, clip.tokenize array semantics, and end-to-end wiring into the
dataset's `caption_ids_clip` and the retrieval stage.
"""

import gzip
import json

import numpy as np
import pytest

from vacnic_tpu.data.clip_tokenize import (
    ClipBpeTokenizer,
    EOT_TOKEN,
    SOT_TOKEN,
    basic_clean,
    whitespace_clean,
)

# Merges chosen so common test words get multi-step merges (order = rank).
MERGES = [
    ("h", "e"), ("l", "o</w>"), ("he", "l"), ("hel", "lo</w>"),
    ("w", "o"), ("wo", "r"), ("wor", "l"), ("worl", "d</w>"),
    ("t", "he</w>"), ("a", "n"), ("an", "d</w>"), ("i", "s</w>"),
    ("o", "b"), ("ob", "a"), ("oba", "m"), ("obam", "a</w>"),
    ("i", "t</w>"), ("'", "s</w>"),
]


def _write_hf_files(tmp_path, merges):
    tok = _openai_style(tmp_path, merges)
    vocab_file = tmp_path / "vocab.json"
    merges_file = tmp_path / "merges.txt"
    with open(vocab_file, "w", encoding="utf-8") as f:
        json.dump(tok.encoder, f, ensure_ascii=False)
    with open(merges_file, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(" ".join(m) for m in merges))
    return str(vocab_file), str(merges_file)


def _openai_style(tmp_path, merges):
    gz = tmp_path / "bpe_simple_vocab_test.txt.gz"
    body = "bpe vocab header line\n" + "\n".join(" ".join(m) for m in merges)
    with gzip.open(gz, "wt", encoding="utf-8") as f:
        f.write(body)
    return ClipBpeTokenizer.from_openai_vocab(str(gz))


@pytest.fixture(scope="module")
def toks(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("clipvocab")
    vocab_file, merges_file = _write_hf_files(tmp, MERGES)
    mine = ClipBpeTokenizer.from_hf_files(vocab_file, merges_file)
    from transformers import CLIPTokenizer

    hf = CLIPTokenizer(vocab_file, merges_file)
    return mine, hf


# Battery avoids HTML entities / control chars / CJK: without ftfy installed,
# HF falls back to BasicTokenizer instead of whitespace_clean — both agree on
# plain text, which is what news captions are.
TEXTS = [
    "Hello World",
    "hello   world  ",
    "The world is hello",
    "COVID19 cases rose 42%",
    "It's Obama's plan, isn't it?",
    "Barack Obama visited Paris in 2020.",
    "hyphen-ated words and 3.14 numbers",
    "weird   spacing\tand\nnewlines",
]


def test_hf_id_parity(toks):
    mine, hf = toks
    for text in TEXTS:
        got = mine.encode(text)
        want = hf(text)["input_ids"]
        assert got == want, f"{text!r}: {got} != {want}"


def test_hf_token_string_parity(toks):
    mine, hf = toks
    for text in TEXTS:
        pieces = []
        for tok in mine._encode_text(text):
            pieces.append(mine.decoder[tok])
        assert pieces == hf.tokenize(text), text


def test_openai_vocab_order_and_special_ids(tmp_path):
    tok = _openai_style(tmp_path, MERGES)
    # OpenAI layout: 256 bytes + 256 byte</w> + merges + SOT + EOT
    assert tok.encoder[SOT_TOKEN] == 512 + len(MERGES)
    assert tok.encoder[EOT_TOKEN] == 513 + len(MERGES)
    assert tok.encoder["hello</w>"] == 512 + 3  # rank-3 merge joins to hello</w>
    # with the real 48,894-merge file this yields 49406/49407


def test_openai_and_hf_loaders_agree(tmp_path, toks):
    mine_hf, _ = toks
    mine_oa = _openai_style(tmp_path, MERGES)
    for text in TEXTS:
        assert mine_oa.encode(text) == mine_hf.encode(text)


def test_tokenize_array_semantics(toks):
    mine, _ = toks
    out = mine.tokenize(["hello world", "the world"], context_length=77)
    assert out.shape == (2, 77) and out.dtype == np.int32
    assert out[0, 0] == mine.sot_token_id
    row = out[0][out[0] != 0]
    assert row[-1] == mine.eot_token_id
    # zero padding after eot (reference collate pads with 0, goodnews...py:95-99)
    assert (out[0, len(row):] == 0).all()


def test_tokenize_truncation(toks):
    mine, _ = toks
    long = "hello world " * 40
    with pytest.raises(RuntimeError):
        mine.tokenize(long, context_length=8, truncate=False)
    out = mine.tokenize(long, context_length=8, truncate=True)
    assert out.shape == (1, 8)
    assert out[0, -1] == mine.eot_token_id  # truncate keeps EOT last
    assert mine.encode(long, max_length=8) == list(out[0])


def test_lowercase_and_cleanup(toks):
    mine, _ = toks
    assert mine.encode("HELLO WORLD") == mine.encode("hello world")
    assert whitespace_clean("a\t b\n\nc ") == "a b c"
    assert basic_clean("fish &amp;amp; chips") == "fish & chips"  # html unescaped twice


def test_digits_split_single(toks):
    # CLIP pattern is [\p{N}] — one digit per pretoken, unlike GPT-2's \p{N}+
    mine, hf = toks
    ids = mine.encode("2020", add_special_tokens=False)
    assert len(ids) == 4
    assert ids == hf("2020", add_special_tokens=False)["input_ids"]


def test_decode_roundtrip(toks):
    mine, _ = toks
    for text in ["hello world", "the world is hello", "obama and world"]:
        assert mine.decode(mine.encode(text)) == text


def test_decode_keeps_inner_zero_id(toks):
    # raw id 0 is the legitimate '!' byte symbol (first bytes_to_unicode
    # entry) — it is padding ONLY after the first EOT. "!!" encodes as
    # ['!'(id 0), '!</w>'], so a decode that drops every 0 loses characters.
    mine, _ = toks
    ids = mine.encode("hello !!", add_special_tokens=False)
    assert 0 in ids
    assert mine.decode(mine.encode("hello !!")) == "hello !!"
    # zero-padding after EOT (the tokenize() array layout) still drops
    row = mine.tokenize("hello !!", context_length=16)[0]
    assert mine.decode(row.tolist()) == "hello !!"


def test_dataset_emits_caption_ids_clip(tmp_path):
    from vacnic_tpu.data.collate import collate
    from vacnic_tpu.data.datasets import NewsCaptionDataset
    from vacnic_tpu.data.tokenize import HashWordTokenizer

    from PIL import Image

    clip_tok = _openai_style(tmp_path, MERGES)
    dd = {
        "h1": {"caption": "Obama visited the world", "sents_byclip": "hello world."},
        "h2": {"caption": "hello hello", "sents_byclip": "the world is big."},
    }
    (tmp_path / "images_processed").mkdir()
    for h in dd:
        Image.new("RGB", (32, 32), (120, 60, 30)).save(tmp_path / "images_processed" / f"{h}.jpg")
    ds = NewsCaptionDataset(dd, str(tmp_path), HashWordTokenizer(), dataset="goodnews",
                            retrieved_sent=True, train=False, clip_tokenizer=clip_tok)
    s0 = ds[0]
    assert s0["caption_ids_clip"][0] == clip_tok.sot_token_id
    assert s0["caption_ids_clip"][-1] == clip_tok.eot_token_id
    batch = collate([ds[0], ds[1]], article_len=16, caption_len=16, ner_len=8,
                    ner_len_gt=4, max_faces=4, face_dim=512, noname_id=50266)
    assert batch["caption_ids_clip"].shape[0] == 2
    # clip ids pad with 0 (goodnews...py:95-99)
    assert batch["caption_ids_clip"].min() == 0


def test_retrieval_end_to_end_with_real_tokenizer(tmp_path):
    import jax

    from vacnic_tpu.data.preprocess.clip_retrieval import retrieve_sentences
    from vacnic_tpu.models.clip_text import clip_text_fwd, clip_text_init

    clip_tok = _openai_style(tmp_path, MERGES)
    params = clip_text_init(jax.random.PRNGKey(0), vocab_size=len(clip_tok),
                            context_length=77, width=32, layers=2, heads=2,
                            output_dim=16)
    article = ("The world met today. Obama spoke about hello. "
               "It is the world and hello. Nothing else happened.")
    img = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (16,)))
    out = retrieve_sentences(params, clip_tok, img, article, num_sentences=2)
    sents = out.split(". ")
    assert len([s for s in sents if s]) >= 1
    assert out != article  # top-2 of 4 segments selected
