"""Preprocessing tests: NER typing/replacement artifacts, CLIP retrieval
ranking, and Mongo extraction against a fake in-memory collection."""

import numpy as np
import pytest

from vacnic_tpu.data.preprocess.entity_ids import person_token_positions
from vacnic_tpu.data.preprocess.mongo_extract import (
    build_context,
    extract_article,
    get_ner_by_type,
    top_k_faces,
)
from vacnic_tpu.data.preprocess.ner_typing import (
    caption_name_positions,
    make_ner_dict_by_type,
    process_article,
    replace_entity_ids,
)
from vacnic_tpu.data.tokenize import HashWordTokenizer
from vacnic_tpu.eval.entity_eval import HeuristicNER


@pytest.fixture(scope="module")
def tok():
    t = HashWordTokenizer(50265)
    t.add_special_tokens(["<ENT>", "<NONAME>", "<PERSON>", "<ORGNORP>", "<GPELOC>"])
    return t


def test_make_ner_dict_by_type():
    unique, labels = make_ner_dict_by_type(
        ["Obama", "Apple", "Paris", "Obama", "France"],
        ["PERSON", "ORG", "GPE", "PERSON", "LOC"],
    )
    assert unique == {
        "Obama": "<PERSON>_1", "Apple": "<ORGNORP>_1",
        "Paris": "<GPELOC>_1", "France": "<GPELOC>_2",
    }
    assert labels == ["<PERSON>_1", "<ORGNORP>_1", "<GPELOC>_1", "<PERSON>_1", "<GPELOC>_2"]


def test_replace_entity_ids_and_positions(tok):
    text = "Obama met Apple in Paris yesterday with Obama"
    _, labels = make_ner_dict_by_type(["Obama", "Apple", "Paris"], ["PERSON", "ORG", "GPE"])
    ids = replace_entity_ids(text, ["Obama", "Apple", "Paris"], labels, tok)
    pid = tok.added_tokens["<PERSON>"]
    # both Obama occurrences replaced
    assert ids.count(pid) == 2
    assert tok.added_tokens["<ORGNORP>"] in ids
    assert tok.added_tokens["<GPELOC>"] in ids
    spans = person_token_positions(ids, person_token_id=pid)
    assert len(spans) == 2


def test_process_article_artifact(tok):
    # preprocessing needs case-preserving NER or span replacement can't match
    art = process_article(
        "Barack Obama visited the World Bank Group", HeuristicNER(lowercase=False), tok
    )
    assert tok.added_tokens["<PERSON>"] in art["input_ids"]
    assert tok.added_tokens["<ORGNORP>"] in art["input_ids"]


def test_caption_name_positions(tok):
    pos = caption_name_positions(
        "Barack Obama waves in Paris", HeuristicNER(lowercase=False), tok,
        person_token_id=tok.added_tokens["<PERSON>"],
    )
    assert len(pos) >= 1
    assert all(len(p) == 2 for p in pos)


# ---------------------------------------------------------------------------
# Mongo extraction against a fake collection
# ---------------------------------------------------------------------------

class FakeCollection:
    def __init__(self, docs):
        self.docs = docs

    def find_one(self, query, projection=None):
        want = query["_id"]
        want = want["$eq"] if isinstance(want, dict) else want
        for d in self.docs:
            if d["_id"] == want:
                return d
        return None

    def find(self, query, projection=None):
        class _Cursor(list):
            def sort(self, *a):
                return self
        split = query.get("split", {}).get("$eq")
        return _Cursor(d for d in self.docs if d.get("split") == split)


class FakeDB:
    def __init__(self, articles, objects):
        self.articles = FakeCollection(articles)
        self.objects = FakeCollection(objects)


def _mk_article():
    ner = lambda text, label: {"text": text, "label": label}
    return {
        "_id": "a1",
        "split": "train",
        "headline": {"main": "Big News Story"},
        "image_positions": [2],
        "parsed_section": [
            {"type": "paragraph", "text": "First paragraph about Alice Smith.",
             "named_entities": [ner("Alice Smith", "PERSON")]},
            {"type": "paragraph", "text": "Second paragraph mentions Acme Corp.",
             "named_entities": [ner("Acme Corp", "ORG")]},
            {"type": "caption", "text": "Alice Smith stands in Paris",
             "hash": "img1",
             "named_entities": [ner("Alice Smith", "PERSON"), ner("Paris", "GPE")],
             "facenet_details": {
                 "n_faces": 3,
                 "embeddings": [[0.1] * 4, [0.2] * 4, [0.3] * 4],
                 "detect_probs": [0.5, 0.9, 0.7],
             }},
            {"type": "paragraph", "text": "Third paragraph about France.",
             "named_entities": [ner("France", "GPE")]},
        ],
    }


def test_get_ner_by_type():
    sec = _mk_article()["parsed_section"][2]
    names, orgs, gpes = get_ner_by_type(sec)
    assert names == {"Alice Smith"} and gpes == {"Paris"} and orgs == set()


def test_top_k_faces():
    emb, probs = top_k_faces(
        {"embeddings": [[1], [2], [3]], "detect_probs": [0.5, 0.9, 0.7]}, 2
    )
    assert sorted(probs) == [0.7, 0.9]
    assert emb.shape == (2, 1)


def test_build_context(tok):
    art = _mk_article()
    ctx, named, names, orgs, gpes = build_context(
        art["parsed_section"], 2, art["headline"], tok
    )
    assert ctx.startswith("Big News Story")
    assert "First paragraph" in ctx
    assert "Alice Smith" in names
    assert "Acme Corp" in orgs or "France" in gpes


def test_extract_article(tok):
    db = FakeDB([_mk_article()], [{"_id": "img1", "object_features": [[0.5] * 8]}])
    out = extract_article(db, "a1", tok, max_n_faces=2)
    assert "img1" in out
    rec = out["img1"]
    assert rec["caption"] == "Alice Smith stands in Paris"
    assert rec["name_cap"] == ["Alice Smith"]  # NYTimes key spelling
    assert isinstance(rec["name_art"], list)  # NYTimes key spelling
    assert rec["face_emb"].shape == (2, 4)  # top-2 of 3 faces
    assert rec["obj_emb"].shape == (1, 8)
    assert "Paris" in rec["ner_cap"]
