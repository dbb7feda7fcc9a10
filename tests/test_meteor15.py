"""meteor-1.5 scorer: hand-computed formula cases (en rank-task parameters
α=.85 β=.2 γ=.6 δ=.75, exact w=1.0 / stem w=0.6), aligner chunk
minimization, corpus micro-aggregation, and the jar stdio-protocol driver
against a stub executable."""

import os
import sys
import textwrap

import numpy as np
import pytest

from vacnic_tpu.eval.meteor15 import (
    ALPHA, BETA, GAMMA,
    JarMeteor,
    SegmentStats,
    meteor15_corpus,
    meteor15_sentence,
)


def test_identical_sentence_scores_one():
    # full coverage in one chunk → fragmentation waived → Fmean = P = R = 1
    assert meteor15_sentence("the cat sat on the mat",
                             ["the cat sat on the mat"]) == pytest.approx(1.0)


def test_prefix_hypothesis_hand_computed():
    # hyp = "the cat sat", ref = "the cat sat on the mat"
    # content δ=.75: cat/sat/mat; function .25: the/on.
    # P = 1; R = 1.75/3; Fmean = P*R/(.85P+.15R); chunks=1, m=3.
    R = 1.75 / 3
    fmean = (1 * R) / (ALPHA * 1 + (1 - ALPHA) * R)
    pen = GAMMA * (1 / 3) ** BETA
    want = fmean * (1 - pen)
    got = meteor15_sentence("the cat sat", ["the cat sat on the mat"])
    assert got == pytest.approx(want, rel=1e-9)


def test_stem_stage_weight():
    # "cats running" vs "cat runs": both words align via Porter stems at
    # w=0.6 → P = R = 0.6, full single-chunk coverage → no penalty.
    got = meteor15_sentence("cats running", ["cat runs"])
    fmean = (0.6 * 0.6) / (ALPHA * 0.6 + (1 - ALPHA) * 0.6)
    assert got == pytest.approx(fmean, rel=1e-9)


def test_aligner_minimizes_chunks():
    # "on the mat sat the cat" vs "the cat sat on the mat": 6 matches can be
    # arranged as 3 contiguous chunks ([on the mat] [sat] [the cat]); a
    # greedy left-to-right aligner finds more.
    s = SegmentStats("on the mat sat the cat", "the cat sat on the mat")
    assert s.m_raw == 6
    assert s.chunks == 3
    pen = GAMMA * (3 / 6) ** BETA
    assert meteor15_sentence("on the mat sat the cat",
                             ["the cat sat on the mat"]) == pytest.approx(1 - pen)


def test_no_match_zero_and_empty():
    assert meteor15_sentence("xyzzy plugh", ["hello world"]) == 0.0
    assert meteor15_sentence("", ["hello"]) == 0.0
    assert meteor15_corpus([], []) == 0.0


def test_best_reference_selected():
    one = meteor15_sentence("the cat sat", ["dogs bark loudly",
                                            "the cat sat"])
    assert one == pytest.approx(1.0)


def test_corpus_micro_aggregation():
    hyps = ["the cat sat", "a dog ran fast"]
    refs = [["the cat sat"], ["a dog ran fast"]]
    # both perfect single-chunk → aggregated stats still P=R=1, chunks 0
    assert meteor15_corpus(hyps, refs) == pytest.approx(1.0)
    # micro ≠ macro: mixing a perfect and an imperfect segment
    hyps = ["the cat sat", "xyzzy"]
    refs = [["the cat sat"], ["hello there world"]]
    micro = meteor15_corpus(hyps, refs)
    macro = np.mean([meteor15_sentence(h, r) for h, r in zip(hyps, refs)])
    assert 0 < micro < 1 and micro != pytest.approx(float(macro))


def test_normalization_tokenizes_punctuation():
    s = SegmentStats("Hello, world!", "hello world")
    # "," and "!" become function-weighted?? no — they are tokens not in the
    # function list → content weight; they simply don't match. m_raw = 2.
    assert s.m_raw == 2
    assert s.hyp_len == 4 and s.ref_len == 2


def test_caption_metrics_meteor_non_null():
    from vacnic_tpu.eval.caption_metrics import compute_caption_metrics

    out = compute_caption_metrics([("the cat sat on the mat",
                                    "the cat sat on the mat")])
    om = out["other metrics"]
    assert om["meteor"] is not None and om["meteor"] == pytest.approx(1.0)
    assert "meteor" in om["meteor_scorer"]


def test_jar_protocol_driver(tmp_path):
    """Drive JarMeteor against a stub that speaks the meteor -stdio protocol
    and logs what it received — validates the exact SCORE/EVAL line format
    the reference's monkey-patched _stat emits (train...match.py:543-580)."""
    log = tmp_path / "lines.txt"
    stub = tmp_path / "stub.py"
    stub.write_text(textwrap.dedent(f"""
        import sys
        log = open({str(log)!r}, "a")
        n_scores = 0
        for line in sys.stdin:
            log.write(line); log.flush()
            if line.startswith("SCORE"):
                n_scores += 1
                print("1 2 3"); sys.stdout.flush()
            elif line.startswith("EVAL"):
                for i in range(n_scores):
                    print(0.25 * (i + 1)); sys.stdout.flush()
                print(0.5); sys.stdout.flush()
    """))
    jar = JarMeteor(cmd=[sys.executable, str(stub)])
    try:
        final, scores = jar.compute_score(
            ["hyp one", "hyp ||| two"], [["ref a"], ["ref b", "ref c"]])
    finally:
        jar.close()
    assert final == 0.5 and scores == [0.25, 0.5]
    lines = log.read_text().splitlines()
    assert lines[0] == "SCORE ||| ref a ||| hyp one"
    # ||| is stripped from hypotheses exactly as the reference _stat does
    assert lines[1] == "SCORE ||| ref b ||| ref c ||| hyp two"
    assert lines[2] == "EVAL ||| 1 2 3 ||| 1 2 3"
