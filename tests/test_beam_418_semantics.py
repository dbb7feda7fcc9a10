"""transformers-4.18 beam-search semantics, pinned with hand-built logits.

The reference inherits `generate` from transformers **4.18** (SURVEY §2.6,
vacnic.yml); the installed transformers is 4.57, whose vectorized beam search
differs in two places. This file enumerates every divergence candidate
between 4.18 `BeamSearchScorer` (src/transformers/generation_beam_search.py)
+ `GenerationMixin.beam_search` (src/transformers/generation_utils.py) and
the modern path (src/transformers/generation/utils.py), and pins which
behavior `cfg.hf_compat` selects:

| # | behavior | 4.18 | modern (4.57) | differ? |
|---|---|---|---|---|
| 1 | eos-hyp normalization | `sum/len(hyp)**lp`, hyp incl. start excl. eos (BeamHypotheses.add) | `sum/(cur_len+1-decoder_prompt_len)**lp` (_update_finished_beams) | NO — +start/−eos cancel |
| 2 | max-length finalize | all K running beams added at `sum/max_length**lp` (finalize) | running beams folded at `sum/(max_length-1)**lp` | YES |
| 3 | early_stopping=False heuristic numerator | `next_scores.max()` = best of ALL 2K candidates incl. eos (is_done) | best RUNNING beam (_check_early_stop_heuristic `running_beam_scores[:,:1]`) | YES |
| 4 | heuristic denominator | `cur_len**lp`, incl. start | `(cur_len-decoder_prompt_len)**lp` at the post-append length | NO — same value |
| 5 | eos-rank rule | eos admitted only at rank < K (`beam_token_rank >= group_size` → skip) | identical (`top_num_beam_mask`) | NO |
| 6 | early_stopping=True | done at K hyps | done at K hyps | NO |
| 7 | add() ties | keep old on equal score (strict `>` in add) | merged top-k keeps first=old | NO |
| 8 | finalize tie-break | stable sort picks newest on exact ties | top_k picks oldest | YES, measure-zero in fp32 |

Under the released VACNIC decode config — bart-large model defaults
early_stopping=True + forced_eos_token_id=2 (README.md:8) — rows 2 and 3
never fire, so "4.18" and "modern" produce identical tokens; that is why the
token-identical parity tests against the installed transformers
(tests/test_beam_parity.py) also validate the 4.18 default.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vacnic_tpu.core.config import DecodeConfig
from vacnic_tpu.infer.beam_search import beam_search

V, EOS, PAD, START = 256, 2, 1, 2


def row(pairs):
    """Log-probs: named tokens get the given probabilities, the rest share
    the remainder uniformly (so junk continuations decay by ~log(1/V))."""
    p = np.zeros(V)
    fill = [t for t in range(V) if t not in pairs]
    p[fill] = (1.0 - sum(pairs.values())) / len(fill)
    for t, pr in pairs.items():
        p[t] = pr
    return np.log(np.maximum(p, 1e-300))


def run(table, cfg):
    """Beam search over scripted logits: logits[t] = table[pos, last_token]."""
    tbl = jnp.asarray(table, jnp.float32)

    def step_fn(tok, cache, pos):
        return tbl[pos, tok[:, 0]], cache

    seqs, scores = jax.jit(lambda: beam_search(
        step_fn, {}, 1, cfg=cfg, eos_token_id=EOS, pad_token_id=PAD,
        decoder_start_token_id=START, forced_bos_token_id=None, vocab_size=V))()
    return np.asarray(seqs)[0].tolist(), float(scores[0])


def make_table(L, rows):
    T = np.zeros((L, V, V))
    for pos in range(L):
        for lt in range(V):
            T[pos, lt] = row({})
    for (pos, lt), pairs in rows.items():
        T[pos, lt] = row(pairs)
    return T


BASE = dict(num_beams=2, max_length=6, length_penalty=1.0, early_stopping=False,
            min_length=0, no_repeat_ngram_size=0, forced_eos=False)


def test_heuristic_numerator_418_continues_modern_stops():
    """Divergence #3. At step cur=2 the argmax candidate is an eos whose
    normalized score beats the worst kept hypothesis, while the best RUNNING
    candidate does not: 4.18 (`next_scores.max()`) keeps searching and finds
    a better longer hypothesis; modern (best running beam) stops early."""
    T = make_table(6, {
        (0, START): {4: .8, 2: .122, 3: .030},  # hyp0=[2,eos] @ log.122; runs: [2,4],[2,3]
        (1, 3): {2: .55, 5: .43},               # eos argmax from [2,3]; 5 continues
        (2, 5): {2: .95},                       # the better, longer hypothesis
    })
    seq_418, score_418 = run(T, DecodeConfig(**BASE, hf_compat="4.18"))
    seq_mod, score_mod = run(T, DecodeConfig(**BASE, hf_compat="modern"))
    # modern froze at the 2-token hypothesis [2,3,</s>]
    assert seq_mod[:3] == [START, 3, EOS]
    np.testing.assert_allclose(score_mod, (np.log(.030) + np.log(.55)) / 2, rtol=1e-5)
    # 4.18 kept going and returns the longer [2,3,5,</s>]
    assert seq_418[:4] == [START, 3, 5, EOS]
    np.testing.assert_allclose(
        score_418, (np.log(.030) + np.log(.43) + np.log(.95)) / 3, rtol=1e-5)
    assert score_418 > score_mod  # the hypothesis modern missed is strictly better


def test_early_stopping_true_stops_at_k_hyps_in_both_modes():
    """Row #6: early_stopping=True = done once K hypotheses exist (4.18
    BeamHypotheses.is_done `len(self) >= num_beams`); the better longer
    hypothesis of the previous test is NOT found in either mode."""
    T = make_table(6, {
        (0, START): {4: .8, 2: .122, 3: .030},
        (1, 3): {2: .55, 5: .43},
        (2, 5): {2: .95},
    })
    results = {c: run(T, DecodeConfig(**{**BASE, "early_stopping": True}, hf_compat=c))
               for c in ("4.18", "modern")}
    assert results["4.18"] == results["modern"]
    assert results["4.18"][0][:3] == [START, 3, EOS]


def test_finalize_denominator_418_full_length_modern_generated():
    """Divergence #2. No eos ever fires; at max_length the running beams are
    finalized. 4.18 finalize scores them `sum/max_length**lp` (len incl. the
    decoder start); modern uses the generated length `max_length-1`. Same
    tokens, different normalization."""
    L = 4
    T = make_table(L, {
        (0, START): {3: .9},
        (1, 3): {5: .9},
        (2, 5): {6: .9},
    })
    cum = np.log(.9) * 3
    cfg = DecodeConfig(**{**BASE, "max_length": L, "length_penalty": 2.0})
    seq_418, score_418 = run(T, dataclasses.replace(cfg, hf_compat="4.18"))
    seq_mod, score_mod = run(T, dataclasses.replace(cfg, hf_compat="modern"))
    assert seq_418 == seq_mod == [START, 3, 5, 6]
    np.testing.assert_allclose(score_418, cum / L**2, rtol=1e-5)
    np.testing.assert_allclose(score_mod, cum / (L - 1) ** 2, rtol=1e-5)


def test_eos_denominator_includes_start_excludes_eos():
    """Row #1 (the coincidence): an eos hypothesis formed at step t is scored
    `sum/t**lp` in BOTH modes — 4.18 divides by len(hyp)=t (incl. decoder
    start, excl. eos); modern divides by the generated length incl. eos,
    also t."""
    T = make_table(4, {(0, START): {3: .6, 2: .3}})
    for compat in ("4.18", "modern"):
        cfg = DecodeConfig(**{**BASE, "max_length": 4}, hf_compat=compat)
        seq, score = run(T, cfg)
        if seq[:2] == [START, EOS]:
            np.testing.assert_allclose(score, np.log(.3) / 1.0, rtol=1e-5)


def test_eos_rank_rule_drops_rank_ge_k():
    """Row #5 (both modes): an eos candidate ranked >= K never becomes a
    hypothesis (4.18 process `beam_token_rank >= self.group_size` → skip).
    Here eos is rank 1 with num_beams=1: the 1-token hypothesis [2,</s>]
    (score log .45) would beat everything later, but is dropped."""
    T = make_table(3, {
        (0, START): {3: .5, 2: .45},
        (1, 3): {2: .02, 5: .9},
    })
    for compat in ("4.18", "modern"):
        cfg = DecodeConfig(**{**BASE, "num_beams": 1, "max_length": 3}, hf_compat=compat)
        seq, score = run(T, cfg)
        assert seq[1] == 3, f"{compat}: rank>=K eos was admitted: {seq}"


def test_released_config_modes_identical():
    """Under the released decode config (early_stopping=True via the
    bart-large model defaults + forced_eos, README.md:8) rows 2 and 3 never
    fire: both compat modes emit identical tokens AND scores. This is the
    bridge that lets parity tests against the installed transformers
    validate the 4.18 default."""
    rng = np.random.RandomState(0)
    for trial in range(3):
        T = rng.standard_normal((10, V, V)) * 2.0
        cfg = DecodeConfig(num_beams=5, max_length=10, length_penalty=2.0,
                           early_stopping=True, min_length=3,
                           no_repeat_ngram_size=3, forced_eos=True)
        out = {c: run(T, dataclasses.replace(cfg, hf_compat=c))
               for c in ("4.18", "modern")}
        assert out["4.18"][0] == out["modern"][0], f"trial {trial}"
        np.testing.assert_allclose(out["4.18"][1], out["modern"][1], rtol=1e-6)


def test_chunked_top_k_matches_single_call():
    """chunked_top_k is exact: identical scores to lax.top_k on wide rows
    with duplicates and -inf padding interactions."""
    from vacnic_tpu.infer.beam_search import chunked_top_k

    rng = np.random.RandomState(0)
    for n, chunk in ((251335, 4096), (10000, 1024), (100, 32), (64, 64)):
        x = jnp.asarray(rng.randn(4, n).astype(np.float32))
        # plant duplicates and extremes
        x = x.at[0, : 20].set(7.5)
        x = x.at[1, n - 1].set(99.0)
        s_ref, i_ref = jax.lax.top_k(x, 10)
        s_chk, i_chk = chunked_top_k(x, 10, chunk=chunk)
        np.testing.assert_array_equal(np.asarray(s_chk), np.asarray(s_ref))
        # indices must point at equal values (ties may order differently
        # between implementations at equal scores — values are the contract
        # used by beam_search only via score ranking plus stable candidate
        # identity; check gathered values)
        np.testing.assert_array_equal(
            np.take_along_axis(np.asarray(x), np.asarray(i_chk), axis=1),
            np.asarray(s_ref))


def test_chunked_top_k_banned_rows_below_neg_inf():
    """Rows where every candidate sits BELOW NEG_INF (banned_total =
    running_score + NEG_INF at a forced-token step) must still return
    in-range indices — the chunk padding has to rank below banned values,
    not at NEG_INF (regression: pad leaked out-of-range flat indices)."""
    from vacnic_tpu.infer.beam_search import NEG_INF, chunked_top_k

    n, chunk = 10000, 4096  # pad = 2288 dead lanes
    x = jnp.full((2, n), NEG_INF - 5.0, jnp.float32)  # all banned
    x = x.at[0, 7].set(NEG_INF - 1.0)   # "forced" candidate: least banned
    x = x.at[1, n - 2].set(NEG_INF - 1.0)
    s, i = chunked_top_k(x, 10, chunk=chunk)
    assert int(np.asarray(i).max()) < n  # never a pad index
    assert int(np.asarray(i)[0, 0]) == 7
    assert int(np.asarray(i)[1, 0]) == n - 2
