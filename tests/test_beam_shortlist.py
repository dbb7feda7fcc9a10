"""Shortlist beam-logic exactness: final outputs identical to the full-width
candidate pipeline.

The shortlist path (beam_search._candidates_shortlist) replaces the
[B, K·V] materialize-process-topk pipeline with a per-row top-C on raw
logits plus candidate-set processors. Its exactness argument
(shortlist_width margin, forced-step junk columns) is validated here by
brute-force comparison against the full-width path over random models and
every processor/stopping configuration, including the pathological
forced-step junk admissions (an eos junk candidate at rank < K becomes a
NEG_INF hypothesis in both paths — reference semantics inherited from HF
4.18 GenerationMixin, SURVEY §2.6)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vacnic_tpu.core.config import DecodeConfig
from vacnic_tpu.infer import beam_search as BS

V = 256  # small vocab; shortlist forced via env so the auto gate is bypassed
B, K = 3, 5


def make_step_fn(seed: int, vocab: int = V):
    """Logits depend on (last token, position) via a fixed random table, so
    beam choices cascade — any selection divergence amplifies."""
    table = jax.random.normal(jax.random.PRNGKey(seed), (64, vocab)) * 4.0
    ptab = jax.random.normal(jax.random.PRNGKey(seed + 1), (64, vocab))

    def step_fn(tok, cache, pos):
        logits = jnp.take(table, tok[:, 0] % 64, axis=0)
        logits = logits + jnp.take(ptab, pos % 64, axis=0)[None, :]
        return logits, cache + 1

    return step_fn


def run(cfg: DecodeConfig, seed: int, mode: str, monkeypatch,
        forced_bos: int | None = 0, vocab: int = V):
    monkeypatch.setenv("VACNIC_BEAM_LOGIC", mode)
    seqs, scores = BS.beam_search(
        make_step_fn(seed, vocab), jnp.int32(0), B, cfg=cfg,
        eos_token_id=2, pad_token_id=1, decoder_start_token_id=2,
        forced_bos_token_id=forced_bos, vocab_size=vocab,
        reorder_cache_fn=lambda c, sel: c)
    return np.asarray(seqs), np.asarray(scores)


CFGS = [
    # released decode shape: forced_bos + forced_eos + ngram3 + early stop
    dict(cfg=DecodeConfig(num_beams=K, max_length=12, length_penalty=2.0,
                          early_stopping=True, no_repeat_ngram_size=3,
                          forced_eos=True), forced_bos=0),
    # min_length active (eos ban margin slot)
    dict(cfg=DecodeConfig(num_beams=K, max_length=12, length_penalty=1.0,
                          early_stopping=True, min_length=8,
                          no_repeat_ngram_size=3, forced_eos=True),
         forced_bos=0),
    # no forced processors at all (no extra columns)
    dict(cfg=DecodeConfig(num_beams=K, max_length=10, length_penalty=2.0,
                          early_stopping=True, no_repeat_ngram_size=2,
                          forced_eos=False), forced_bos=None),
    # junk-admission stress: forced_bos only, eos free to fire early,
    # early_stopping=True counts junk hypotheses toward done
    dict(cfg=DecodeConfig(num_beams=K, max_length=12, length_penalty=2.0,
                          early_stopping=True, no_repeat_ngram_size=0,
                          forced_eos=False), forced_bos=0),
    # early_stopping=False legacy heuristic (best of all 2K candidates)
    dict(cfg=DecodeConfig(num_beams=K, max_length=10, length_penalty=2.0,
                          early_stopping=False, no_repeat_ngram_size=3,
                          forced_eos=True, hf_compat="4.18"), forced_bos=0),
    # modern-mode heuristic + finalize denominators
    dict(cfg=DecodeConfig(num_beams=K, max_length=10, length_penalty=2.0,
                          early_stopping=False, no_repeat_ngram_size=3,
                          forced_eos=True, hf_compat="modern"), forced_bos=0),
]


@pytest.mark.parametrize("mode", ["shortlist", "opt"])
@pytest.mark.parametrize("case", range(len(CFGS)))
def test_fast_modes_match_full(case, mode, monkeypatch):
    spec = CFGS[case]
    for seed in range(4):
        s_full, sc_full = run(spec["cfg"], seed, "full", monkeypatch,
                              spec["forced_bos"])
        s_sl, sc_sl = run(spec["cfg"], seed, mode, monkeypatch,
                          spec["forced_bos"])
        np.testing.assert_array_equal(
            s_full, s_sl,
            err_msg=f"case={case} seed={seed} mode={mode} sequences differ")
        np.testing.assert_allclose(
            sc_full, sc_sl, rtol=0, atol=0,
            err_msg=f"case={case} seed={seed} mode={mode} scores differ")


def test_opt_certificate_fallback(monkeypatch):
    """Shrink the optimistic window so ban counts exceed the tolerance and
    the lax.cond fallback to the full-width path actually fires; outputs
    must stay identical."""
    monkeypatch.setattr(BS, "OPT_WINDOW", 2 * K + 2)  # tolerance = 2 bans
    cfg = DecodeConfig(num_beams=K, max_length=14, length_penalty=1.0,
                       early_stopping=True, no_repeat_ngram_size=2,
                       forced_eos=True)
    for seed in (3, 7):
        table = jax.random.normal(jax.random.PRNGKey(seed), (64, V))
        table = table.at[:, :6].add(10.0)  # few dominant tokens -> many bans

        def step_fn(tok, cache, pos):
            return jnp.take(table, tok[:, 0] % 64, axis=0), cache

        outs = []
        for mode in ("full", "opt"):
            monkeypatch.setenv("VACNIC_BEAM_LOGIC", mode)
            seqs, scores = BS.beam_search(
                step_fn, jnp.int32(0), B, cfg=cfg, eos_token_id=2,
                pad_token_id=1, decoder_start_token_id=2,
                forced_bos_token_id=0, vocab_size=V,
                reorder_cache_fn=lambda c, sel: c)
            outs.append((np.asarray(seqs), np.asarray(scores)))
        np.testing.assert_array_equal(outs[0][0], outs[1][0])
        np.testing.assert_array_equal(outs[0][1], outs[1][1])


def test_shortlist_auto_gate():
    """Auto mode: on for the real 50k vocab, off for tiny test vocabs."""
    cfg = DecodeConfig()
    assert 50267 >= 8 * (BS.shortlist_width(cfg) + 2)
    assert V < 8 * (BS.shortlist_width(cfg) + 2)


def test_shortlist_width_margin():
    """C must cover top-2K plus the worst-case ban count."""
    cfg = DecodeConfig(num_beams=5, max_length=50, no_repeat_ngram_size=3,
                       min_length=1)
    # bans: <= L-n+1 distinct ngram-banned tokens + 1 eos
    assert BS.shortlist_width(cfg) >= 2 * 5 + (50 - 3 + 1) + 1


def test_shortlist_eos_dominant_row(monkeypatch):
    """A row whose top candidates are nearly all ngram-banned still selects
    the correct survivors (margin exercise): force heavy repetition by a
    near-deterministic table so ngram bans fire often."""
    cfg = DecodeConfig(num_beams=K, max_length=14, length_penalty=1.0,
                       early_stopping=True, no_repeat_ngram_size=2,
                       forced_eos=True)
    for seed in (11, 12):
        table = jax.random.normal(jax.random.PRNGKey(seed), (64, V))
        # sharpen: make a handful of tokens dominate every distribution so
        # sequences repeat and the ngram processor bans the dominant tokens
        table = table.at[:, :8].add(8.0)

        def step_fn(tok, cache, pos):
            return jnp.take(table, tok[:, 0] % 64, axis=0), cache

        outs = []
        for flag in ("full", "shortlist"):
            monkeypatch.setenv("VACNIC_BEAM_LOGIC", flag)
            seqs, scores = BS.beam_search(
                step_fn, jnp.int32(0), B, cfg=cfg, eos_token_id=2,
                pad_token_id=1, decoder_start_token_id=2,
                forced_bos_token_id=0, vocab_size=V,
                reorder_cache_fn=lambda c, sel: c)
            outs.append((np.asarray(seqs), np.asarray(scores)))
        np.testing.assert_array_equal(outs[0][0], outs[1][0])
        np.testing.assert_array_equal(outs[0][1], outs[1][1])


def test_row_topk_blockmax_exact():
    """Blockmax row top-k ≡ lax.top_k (values AND indices, incl. the
    lowest-index tie-break) on wide rows with duplicates."""
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (7, 50267))
    # inject ties: duplicate some values across blocks
    x = x.at[:, 40000:40016].set(x[:, :16])
    cv0, ci0 = jax.lax.top_k(x, 16)
    cv1, ci1 = BS.row_topk_blockmax(x, 16)
    np.testing.assert_array_equal(np.asarray(cv0), np.asarray(cv1))
    np.testing.assert_array_equal(np.asarray(ci0), np.asarray(ci1))


@pytest.mark.parametrize("env", ["blockmax", None])
def test_shortlist_blockmax_mode(monkeypatch, env):
    """End-to-end shortlist with the blockmax row top-k matches full — both
    env-forced and as the r4 DEFAULT (env unset; paired e2e 175.2 vs 158.6
    cps at b256, scripts/logs_r4/bench_queue9.log)."""
    if env is None:
        monkeypatch.delenv("VACNIC_BEAM_TOPK", raising=False)
    else:
        monkeypatch.setenv("VACNIC_BEAM_TOPK", env)
    spec = CFGS[0]
    for seed in (0, 1):
        s_full, sc_full = run(spec["cfg"], seed, "full", monkeypatch,
                              spec["forced_bos"], vocab=64 * 128)
        s_sl, sc_sl = run(spec["cfg"], seed, "shortlist", monkeypatch,
                          spec["forced_bos"], vocab=64 * 128)
        np.testing.assert_array_equal(s_full, s_sl)
        np.testing.assert_array_equal(sc_full, sc_sl)


def test_forced_bos_and_eos_same_step(monkeypatch):
    """max_length=2: forced_bos and forced_eos hit the same step; the full
    path applies forced_eos LAST (HF processor order), so eos must win in
    the analytic forced branch too (review finding r3)."""
    cfg = DecodeConfig(num_beams=K, max_length=2, length_penalty=1.0,
                       early_stopping=True, no_repeat_ngram_size=0,
                       forced_eos=True)
    for mode in ("full", "shortlist", "opt"):
        monkeypatch.setenv("VACNIC_BEAM_LOGIC", mode)
        seqs, scores = BS.beam_search(
            make_step_fn(0), jnp.int32(0), B, cfg=cfg, eos_token_id=2,
            pad_token_id=1, decoder_start_token_id=2, forced_bos_token_id=0,
            vocab_size=V, reorder_cache_fn=lambda c, sel: c)
        np.testing.assert_array_equal(
            np.asarray(seqs)[:, 1], np.full(B, 2),
            err_msg=f"mode={mode}: forced_eos must win the max_length=2 step")


def test_opt_wide_beams(monkeypatch):
    """opt must not crash (and must match full) when 2K exceeds the static
    OPT_WINDOW (review finding r3: top_k k=34 over a 32-wide window)."""
    cfg = DecodeConfig(num_beams=17, max_length=8, length_penalty=1.0,
                       early_stopping=True, no_repeat_ngram_size=2,
                       forced_eos=True)
    outs = []
    for mode in ("full", "opt"):
        monkeypatch.setenv("VACNIC_BEAM_LOGIC", mode)
        seqs, scores = BS.beam_search(
            make_step_fn(1), jnp.int32(0), 2, cfg=cfg, eos_token_id=2,
            pad_token_id=1, decoder_start_token_id=2, forced_bos_token_id=0,
            vocab_size=V, reorder_cache_fn=lambda c, sel: c)
        outs.append((np.asarray(seqs), np.asarray(scores)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])


def test_block_lse_mode(monkeypatch):
    """VACNIC_BLOCK_LSE=1 (fused block pass for shortlist + lse) emits the
    same sequences as the default shortlist AND the full path; scores agree
    to f32 summation-order tolerance (the block-decomposed lse reorders the
    exp sum — a per-row constant shift, so ranking semantics hold)."""
    # a stray VACNIC_BEAM_TOPK=plain would disable use_block_lse and make
    # this test compare the shortlist against itself (vacuous-test trap)
    monkeypatch.delenv("VACNIC_BEAM_TOPK", raising=False)
    spec = CFGS[0]
    for seed in (0, 1):
        monkeypatch.delenv("VACNIC_BLOCK_LSE", raising=False)
        s_full, sc_full = run(spec["cfg"], seed, "full", monkeypatch,
                              spec["forced_bos"], vocab=64 * 128)
        s_sl, sc_sl = run(spec["cfg"], seed, "shortlist", monkeypatch,
                          spec["forced_bos"], vocab=64 * 128)
        monkeypatch.setenv("VACNIC_BLOCK_LSE", "1")
        s_bl, sc_bl = run(spec["cfg"], seed, "shortlist", monkeypatch,
                          spec["forced_bos"], vocab=64 * 128)
        monkeypatch.delenv("VACNIC_BLOCK_LSE")
        np.testing.assert_array_equal(s_bl, s_sl)
        np.testing.assert_array_equal(s_bl, s_full)
        np.testing.assert_allclose(sc_bl, sc_sl, atol=2e-5, rtol=0)


def test_block_lse_matches_logsumexp():
    """block_lse on a padded block view equals jax's logsumexp to f32
    tolerance, including rows whose pad block is all -inf."""
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (16, 50267), jnp.float32) * 5
    r3, bm = BS._block_view(x)
    got = BS.block_lse(r3, bm)
    want = jax.scipy.special.logsumexp(x, axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=0)
    assert np.isfinite(np.asarray(got)).all()


def test_blockmax_gate_small_vocab(monkeypatch):
    """blockmax needs >= C blocks; with a vocab too small for the widened C
    the gate must fall back to the plain row top-k instead of crashing
    (review finding r3: C=34 > nb=32 at vocab 4096)."""
    monkeypatch.setenv("VACNIC_BEAM_TOPK", "blockmax")
    cfg = DecodeConfig(num_beams=14, max_length=8, length_penalty=1.0,
                       early_stopping=True, no_repeat_ngram_size=2,
                       forced_eos=True)
    outs = []
    for mode in ("full", "shortlist"):
        monkeypatch.setenv("VACNIC_BEAM_LOGIC", mode)
        seqs, scores = BS.beam_search(
            make_step_fn(2, 4096), jnp.int32(0), 2, cfg=cfg, eos_token_id=2,
            pad_token_id=1, decoder_start_token_id=2, forced_bos_token_id=0,
            vocab_size=4096, reorder_cache_fn=lambda c, sel: c)
        outs.append((np.asarray(seqs), np.asarray(scores)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])


def test_shortlist_certificate_fallback_direct(monkeypatch):
    """Direct certificate-failure construction for the shortlist: a row
    whose engineered ngram bans exceed the C-2K tolerance must fall back to
    (and exactly match) the full-width path."""
    monkeypatch.delenv("VACNIC_BEAM_TOPK", raising=False)
    k, vb = 2, 600
    cfg = DecodeConfig(num_beams=k, max_length=16, length_penalty=1.0,
                       early_stopping=True, no_repeat_ngram_size=2,
                       forced_eos=False)
    # generated prefix ends in token 5; earlier "5 x" bigrams ban x=6..11
    seq = [2, 5, 6, 5, 7, 5, 8, 5, 9, 5, 10, 5, 11, 5, 1, 1]
    seqs = jnp.array([[seq, seq]], jnp.int32)  # [1, K, L]
    cur = jnp.int32(14)  # last generated token = seqs[..., 13] = 5
    logits = jax.random.normal(jax.random.PRNGKey(0), (k, vb))
    # the six banned tokens get the TOP logits -> 6 hits in the top-C
    logits = logits.at[:, 6:12].add(30.0)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    state = BS.BeamState(
        cur_len=cur, running_seqs=seqs,
        running_scores=jnp.array([[0.0, -1.0]], jnp.float32),
        finished_seqs=seqs,
        finished_scores=jnp.full((1, k), BS.NEG_INF, jnp.float32),
        finished_flags=jnp.zeros((1, k), bool),
        done=jnp.zeros((1,), bool), cache=None)

    def full_fn(lg, ls, st, cu):
        return BS.candidates_full(lg, ls, st, cu, cfg=cfg, b=1, k=k,
                                  vocab_size=vb, eos_token_id=2,
                                  forced_bos_token_id=None)

    got = BS._candidates_shortlist(
        logits, lse, state, cur, cfg=cfg, b=1, k=k, vocab_size=vb,
        eos_token_id=2, forced_bos_token_id=None, full_fn=full_fn,
        C=2 * k + 1)  # tolerance 1 < 6 bans -> certificate MUST fail
    want = full_fn(logits, lse, state, cur)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_randomized_config_sweep(monkeypatch):
    """Property-style sweep: random decode configs (beams incl. > 8, lengths,
    penalties, processors, vocab sizes, hf_compat modes) must keep the fast
    candidate modes final-output-identical to the full-width path. Catches
    interactions the hand-picked CFGS matrix misses."""
    rng = np.random.RandomState(20260819)
    for trial in range(12):
        k = int(rng.choice([2, 3, 5, 9, 16]))
        vocab = int(rng.choice([128, 256, 512]))
        max_len = int(rng.randint(6, 14))
        cfg = DecodeConfig(
            num_beams=k,
            max_length=max_len,
            min_length=int(rng.choice([0, max(2, max_len // 2)])),
            length_penalty=float(rng.choice([0.0, 1.0, 2.0, -0.5])),
            early_stopping=bool(rng.randint(2)),
            no_repeat_ngram_size=int(rng.choice([0, 2, 3])),
            forced_eos=bool(rng.randint(2)),
            hf_compat=str(rng.choice(["4.18", "modern"])),
        )
        forced_bos = 0 if rng.randint(2) else None
        seed = int(rng.randint(10_000))
        s_full, sc_full = run(cfg, seed, "full", monkeypatch, forced_bos, vocab)
        for mode in ("shortlist", "opt"):
            s_m, sc_m = run(cfg, seed, mode, monkeypatch, forced_bos, vocab)
            ctx = f"trial={trial} mode={mode} cfg={cfg} vocab={vocab} seed={seed}"
            np.testing.assert_array_equal(s_full, s_m, err_msg=ctx)
            np.testing.assert_allclose(sc_full, sc_m, rtol=0, atol=0, err_msg=ctx)
