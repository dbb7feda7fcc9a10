"""Caption/entity metric tests: hand-computed BLEU cases, identity properties
(perfect captions → ROUGE-L 1.0, CIDEr 10.0), and entity P/R counting on
constructed examples."""

import math

import numpy as np

from vacnic_tpu.eval.caption_metrics import (
    BleuScorer,
    CiderScorer,
    compute_caption_metrics,
    rouge_l,
    score_tokenize,
)
from vacnic_tpu.eval.entity_eval import HeuristicNER, evaluate_entity, evaluate_entity_by_gtent
from vacnic_tpu.eval.face_groups import score_face_groups, split_by_face_group


def test_score_tokenize_strips_punct():
    assert score_tokenize("Hello, world! It's me.") == ["Hello", "world", "Its", "me"]


def test_bleu_hand_computed():
    b = BleuScorer(4)
    b.append("the cat sat", ["the cat sat"])
    scores = b.compute()
    for s in scores[:3]:
        assert abs(s - 1.0) < 1e-6
    # 4-gram: guess=0 → tiny/small ratio ≈ 1e-6, geometric mean keeps it tiny
    assert scores[3] < 0.1


def test_bleu_partial_overlap():
    b = BleuScorer(2)
    b.append("the cat", ["the dog"])
    s = b.compute()
    # unigram: 1/2 correct; bigram: 0/1
    assert abs(s[0] - 0.5) < 1e-6
    assert s[1] < 0.01


def test_bleu_brevity_penalty():
    b = BleuScorer(1)
    b.append("the", ["the cat sat on the mat"])
    s = b.compute()
    assert abs(s[0] - math.exp(1 - 6 / 1)) < 1e-4  # bp = exp(1 - r/c)


def test_rouge_identity_and_orthogonal():
    assert abs(rouge_l("a b c d", ["a b c d"]) - 1.0) < 1e-9
    assert rouge_l("a b", ["c d"]) == 0.0


def test_cider_identity_is_ten():
    c = CiderScorer()
    pairs = [("a red car parked", "a red car parked"),
             ("dogs play in parks", "dogs play in parks"),
             ("the sun rises east", "the sun rises east")]
    for g, r in pairs:
        c.append(g, [r])
    assert abs(c.compute() - 10.0) < 1e-6


def test_compute_caption_metrics_shape():
    m = compute_caption_metrics([("a man walks", "a man walks"), ("a dog", "a cat")])
    assert set(m["bleu"]) == {"bleu1", "bleu2", "bleu3", "bleu4"}
    assert "rouge" in m["other metrics"] and "cider" in m["other metrics"]
    # no jar in this image → the meteor-1.5 python scorer fills in, tagged
    assert 0.0 < m["other metrics"]["meteor"] <= 1.0
    assert m["other metrics"]["meteor_scorer"] == "meteor15_py(exact+stem)"


def test_meteor_sees_punct_stripped_text():
    # The reference strips punctuation before EVERY scorer incl. the meteor
    # jar (utils/test_mmbart_clip_ddp.py:161-162); the punctuated and the
    # pre-stripped pair must therefore score identically
    punct = compute_caption_metrics([("A man, walking!", "A man walking.")])
    clean = compute_caption_metrics([("A man walking", "A man walking")])
    assert abs(punct["other metrics"]["meteor"]
               - clean["other metrics"]["meteor"]) < 1e-12
    assert abs(punct["other metrics"]["meteor"] - 1.0) < 1e-9


def test_heuristic_ner_basics():
    ner = HeuristicNER()
    ents, propn = ner("President Barack Obama visited Paris in July 2009 with the World Bank Group")
    texts = {e["text"]: e["label"] for e in ents}
    assert texts.get("barack obama") == "PERSON" or "president barack obama" in texts
    assert any(l == "DATE" for l in texts.values())
    assert any(l == "ORG" for l in texts.values())
    assert "obama" in propn


def test_evaluate_entity_counting():
    out = {
        0: {"gt": "Barack Obama met Angela Merkel", "gen": "Barack Obama met John Smith"},
    }
    res = evaluate_entity(out, HeuristicNER())
    rec = res["Entity person (by full name) - recall"]
    prec = res["Entity person (by full name) - precision"]
    assert rec["count"] == 1 and rec["total"] == 2  # Obama found, Merkel missed
    assert prec["count"] == 1 and prec["total"] == 2  # Smith is a hallucination
    assert res["ner_engine"] == "heuristic"


def test_evaluate_entity_by_gtent():
    out = {0: {"gt": "x", "gen": "Barack Obama in Paris"}}
    gtent = {"h1": {"ner_cap": ["barack obama", "london"],
                    "names_cap": ["barack obama"], "org_cap": [], "gpe_cap": ["london"]}}
    res = evaluate_entity_by_gtent(out, gtent, HeuristicNER())
    assert res["Entity all - recall"]["count"] == 1
    assert res["Entity all - recall"]["total"] == 2


def test_face_groups_split():
    # face_emb_dir is a str path when faces exist, a list ([]) otherwise —
    # the reference splits on `type(face_dir) is list` (evaluate_entity.py:391)
    out = {i: {"gt": f"cap {i}", "gen": f"cap {i}"} for i in range(4)}
    data = {
        "a": {"face_emb_dir": "faces/a.npy", "names": ["N"]},
        "b": {"face_emb_dir": "faces/b.npy", "names": []},
        "c": {"face_emb_dir": [], "names": ["N"]},
        "d": {"face_emb_dir": [], "names": []},
    }
    groups = split_by_face_group(out, data)
    assert all(len(g) == 1 for g in groups.values())
    scored = score_face_groups(out, data, with_entities=False)
    assert scored["face_name"]["count"] == 1
    assert abs(scored["face_name"]["other metrics"]["rouge"] - 1.0) < 1e-9


def test_face_groups_split_nytimes_keys():
    # NYTimes dicts spell the caption-name key "name_cap"
    # (evaluate_entity.py:386-390); before the alias fix every NYTimes sample
    # silently landed in the *_noname groups
    out = {i: {"gt": "c", "gen": "c"} for i in range(2)}
    data = {
        "a": {"face_emb_dir": "faces/a.npy", "name_cap": ["N"]},
        "b": {"face_emb_dir": [], "name_cap": []},
    }
    groups = split_by_face_group(out, data)
    assert len(groups["face_name"]) == 1
    assert len(groups["noface_noname"]) == 1
    assert not groups["face_noname"] and not groups["noface_name"]


def test_gtent_alignment_guard():
    # positional alignment must fail loudly on count mismatch (VERDICT weak #7)
    import pytest

    out = {0: {"gt": "x", "gen": "a"}, 1: {"gt": "y", "gen": "b"}}
    gtent = {"h1": {"ner_cap": [], "names_cap": [], "org_cap": [], "gpe_cap": []}}
    with pytest.raises(ValueError, match="positional alignment"):
        evaluate_entity_by_gtent(out, gtent, HeuristicNER())


def test_face_group_alignment_guard():
    import pytest

    out = {0: {"gt": "x", "gen": "a"}}
    data = {"a": {"face_emb_dir": [], "names": []},
            "b": {"face_emb_dir": [], "names": []}}
    with pytest.raises(ValueError, match="positional alignment"):
        split_by_face_group(out, data)
