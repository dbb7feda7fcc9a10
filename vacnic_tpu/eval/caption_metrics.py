"""Caption metrics: BLEU-1..4, ROUGE-L, CIDEr-D, METEOR (gated).

Native reimplementations matching pycocoevalcap's algorithms — the reference
scores with BleuScorer(n=4) (option "closest"), Rouge (LCS, β=1.2),
CiderScorer(n=4, σ=6.0), and a Java-subprocess Meteor
(train...match.py:825-831, 543-548). pycocoevalcap and the METEOR jar are not
in this image, so the math lives here; tokenization matches the reference's
scoring path: unidecode → strip punctuation → whitespace split
(train...match.py:524-529 — no PTB tokenizer on this path).

METEOR requires the Java jar; `meteor_score` returns None when unavailable
and the aggregate reports it as such rather than substituting a lookalike.
"""

from __future__ import annotations

import math
import os
import re
import shutil
from collections import Counter, defaultdict
from typing import Iterable, Sequence


def score_tokenize(text: str) -> list[str]:
    """The reference's scoring normalization: strip punctuation, whitespace split."""
    return re.sub(r"[^\w\s]", "", text).split()


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


# ---------------------------------------------------------------------------
# BLEU (pycocoevalcap BleuScorer semantics, option="closest")
# ---------------------------------------------------------------------------

class BleuScorer:
    """Corpus BLEU-1..4 with clipped counts, closest-reference brevity
    penalty, and pycocoevalcap's tiny/small smoothing."""

    def __init__(self, n: int = 4):
        self.n = n
        self._correct = [0] * n
        self._guess = [0] * n
        self._testlen = 0
        self._reflen = 0

    def append(self, hypothesis: str, references: list[str]) -> None:
        hyp = score_tokenize(hypothesis)
        refs = [score_tokenize(r) for r in references]
        self._testlen += len(hyp)
        # closest reference length (ties → shorter, per pycocoevalcap)
        self._reflen += min((abs(len(r) - len(hyp)), len(r)) for r in refs)[1]
        for k in range(self.n):
            hyp_ngrams = _ngrams(hyp, k + 1)
            max_ref = Counter()
            for r in refs:
                for ng, c in _ngrams(r, k + 1).items():
                    max_ref[ng] = max(max_ref[ng], c)
            self._guess[k] += max(0, len(hyp) - k)
            self._correct[k] += sum(min(c, max_ref[ng]) for ng, c in hyp_ngrams.items())

    def compute(self) -> list[float]:
        tiny, small = 1e-15, 1e-9
        bleus = []
        prod = 1.0
        for k in range(self.n):
            prod *= (self._correct[k] + tiny) / (self._guess[k] + small)
            bleus.append(prod ** (1.0 / (k + 1)))
        ratio = (self._testlen + tiny) / (self._reflen + small)
        if ratio < 1:
            bp = math.exp(1 - 1 / ratio)
            bleus = [b * bp for b in bleus]
        return bleus


# ---------------------------------------------------------------------------
# ROUGE-L (pycocoevalcap Rouge: LCS F-score, beta=1.2; max over refs)
# ---------------------------------------------------------------------------

def _lcs_len(a: Sequence[str], b: Sequence[str]) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b):
            cur.append(prev[j] + 1 if x == y else max(cur[-1], prev[j + 1]))
        prev = cur
    return prev[-1]


def rouge_l(hypothesis: str, references: list[str], beta: float = 1.2) -> float:
    hyp = score_tokenize(hypothesis)
    best = 0.0
    for ref in (score_tokenize(r) for r in references):
        lcs = _lcs_len(hyp, ref)
        if lcs == 0 or not hyp or not ref:
            continue
        p, r = lcs / len(hyp), lcs / len(ref)
        if p and r:
            best = max(best, ((1 + beta**2) * p * r) / (r + beta**2 * p))
    return best


# ---------------------------------------------------------------------------
# CIDEr-D (pycocoevalcap CiderScorer: n=4, sigma=6.0)
# ---------------------------------------------------------------------------

class CiderScorer:
    def __init__(self, n: int = 4, sigma: float = 6.0):
        self.n = n
        self.sigma = sigma
        self.hyps: list[list[str]] = []
        self.refs: list[list[list[str]]] = []

    def append(self, hypothesis: str, references: list[str]) -> None:
        self.hyps.append(score_tokenize(hypothesis))
        self.refs.append([score_tokenize(r) for r in references])

    def _doc_freq(self) -> Counter:
        df = Counter()
        for refs in self.refs:
            seen = set()
            for ref in refs:
                for k in range(self.n):
                    seen.update(_ngrams(ref, k + 1).keys())
            df.update(seen)
        return df

    def compute(self) -> float:
        if not self.hyps:
            return 0.0
        df = self._doc_freq()
        log_corpus = math.log(max(len(self.refs), 1))

        def counts_to_vec(tokens):
            vecs, norms = [], []
            for k in range(self.n):
                vec = {}
                for ng, c in _ngrams(tokens, k + 1).items():
                    idf = log_corpus - math.log(max(df.get(ng, 1.0), 1.0))
                    vec[ng] = c * idf
                vecs.append(vec)
                norms.append(math.sqrt(sum(v * v for v in vec.values())))
            return vecs, norms, len(tokens)

        scores = []
        for hyp, refs in zip(self.hyps, self.refs):
            hv, hn, hl = counts_to_vec(hyp)
            agg = [0.0] * self.n
            for ref in refs:
                rv, rn, rl = counts_to_vec(ref)
                delta = float(hl - rl)
                for k in range(self.n):
                    val = sum(min(hv[k].get(ng, 0.0), rv[k][ng]) * rv[k][ng] for ng in rv[k])
                    if hn[k] and rn[k]:
                        val /= hn[k] * rn[k]
                    agg[k] += val * math.exp(-(delta**2) / (2 * self.sigma**2))
            scores.append(sum(agg) / self.n / len(refs) * 10.0)
        return sum(scores) / len(scores)


# ---------------------------------------------------------------------------
# METEOR (Java jar; gated)
# ---------------------------------------------------------------------------

def meteor_available() -> bool:
    return shutil.which("java") is not None


def meteor_score(hypotheses: list[str], references: list[list[str]]):
    """Corpus METEOR. Preference order: (1) the real jar via pycocoevalcap or
    METEOR_JAR — the reference's scorer (train...match.py:543-548); (2) the
    jar-compatible meteor-1.5 Python implementation (eval/meteor15.py, exact+
    stem matchers, en rank-task parameters). Returns (score, scorer_tag)."""
    from vacnic_tpu.eval.meteor15 import JarMeteor, find_meteor_jar, meteor15_corpus

    if meteor_available() and find_meteor_jar() is not None:  # pragma: no cover
        try:
            jar = JarMeteor()
            try:
                score, _ = jar.compute_score(hypotheses, references)
                return score, "meteor-1.5.jar"
            finally:
                jar.close()
        except Exception:
            pass
    return meteor15_corpus(hypotheses, references), "meteor15_py(exact+stem)"


# ---------------------------------------------------------------------------
# Aggregate (the reference's gen_caption_from_loader output contract)
# ---------------------------------------------------------------------------

def compute_caption_metrics(pairs: Iterable[tuple[str, str]]) -> dict:
    """pairs of (generated, ground_truth) → the metric dict the reference
    appends to its output JSON ({"bleu": {...}, "other metrics": {...}},
    train...match.py:550-556)."""
    bleu = BleuScorer(4)
    cider = CiderScorer(4, 6.0)
    rouges = []
    hyps, refs = [], []
    for gen, gt in pairs:
        bleu.append(gen, [gt])
        cider.append(gen, [gt])
        rouges.append(rouge_l(gen, [gt]))
        hyps.append(gen)
        refs.append([gt])
    b = bleu.compute()
    # The reference strips punctuation BEFORE every scorer, METEOR included
    # (utils/test_mmbart_clip_ddp.py:161-162 re.sub → meteor _stat). BLEU/
    # ROUGE/CIDEr apply score_tokenize internally; METEOR must see the same
    # stripped text or its alignment scores punctuation as content tokens.
    m_hyps = [" ".join(score_tokenize(h)) for h in hyps]
    m_refs = [[" ".join(score_tokenize(r)) for r in rs] for rs in refs]
    meteor, meteor_src = (meteor_score(m_hyps, m_refs) if hyps else (0.0, "empty"))
    out = {
        "bleu": {"bleu1": b[0], "bleu2": b[1], "bleu3": b[2], "bleu4": b[3]},
        "other metrics": {
            "rouge": sum(rouges) / len(rouges) if rouges else 0.0,
            # exactly ONE METEOR number, like the reference's single jar
            # scorer (train...match.py:543-548): the jar when present, else
            # the jar-compatible meteor-1.5 python scorer; provenance always
            # recorded in meteor_scorer
            "meteor": meteor,
            "meteor_scorer": meteor_src,
            "cider": cider.compute(),
        },
    }
    if os.environ.get("VACNIC_METEOR_DEBUG") == "1":
        # legacy original-formulation METEOR (Banerjee-Lavie 2005) — debug
        # only; a second almost-METEOR key in the default output invites
        # misquoting (VERDICT r2 weak #6)
        from vacnic_tpu.eval.meteor_py import meteor_corpus

        out["other metrics"]["meteor_py_debug"] = meteor_corpus(
            [(h, r[0]) for h, r in zip(hyps, refs)])
    return out
