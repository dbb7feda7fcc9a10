"""Fused Pallas decode-stack kernel: per-step logit parity against the
reference XLA path (infer/decode_fast.decode_step) in interpret mode, plus
multi-step cache-evolution parity. TPU-legal shapes (d mult 128, T mult 16,
S mult 128) at small scale."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vacnic_tpu.core.config import VacnicConfig
from vacnic_tpu.infer import decode_fast as DF
from vacnic_tpu.kernels.decode_layer import ChunkPlan
from vacnic_tpu.models import bart as B

BATCH, BEAMS, MAX_LEN, S = 4, 2, 14, 128  # cache pads 14 -> 16
PLAN = ChunkPlan(n_self=2, n_cross=2, n_ffn=2)


@pytest.fixture(scope="module")
def setup():
    cfg = VacnicConfig.tiny().bart
    cfg = dataclasses.replace(
        cfg, d_model=128, decoder_attention_heads=2, encoder_attention_heads=2,
        decoder_ffn_dim=256, encoder_ffn_dim=256, decoder_layers=2,
        encoder_layers=2)
    key = jax.random.PRNGKey(0)
    params = B.bart_init(key, cfg)
    dp = DF.build_decode_params(params)
    enc_out = jax.random.normal(jax.random.fold_in(key, 1),
                                (BATCH, S, cfg.d_model), jnp.bfloat16)
    # a few padded encoder positions exercise the cross bias
    bias = jnp.where(jnp.arange(S) < S - 8, 0.0, jnp.finfo(jnp.float32).min)
    enc_bias = jnp.broadcast_to(bias[None, None, None, :], (BATCH, 1, 1, S))
    # f32 throughout: XLA CPU's eager/thunk dot lacks bf16xbf16=f32 at these
    # shapes (the REFERENCE path hits it; the kernel does not) — parity is
    # about math, not storage dtype
    dp = DF.build_decode_params(params, dtype=jnp.float32)
    enc_out = enc_out.astype(jnp.float32)
    cache = DF.build_decode_cache(params, enc_out, BEAMS, MAX_LEN, cfg,
                                  dtype=jnp.float32, pad_to=16)
    # pallas path uses the time-major + ancestry cache
    cache_tm = DF.build_decode_cache(params, enc_out, BEAMS, MAX_LEN, cfg,
                                     dtype=jnp.float32, pad_to=16,
                                     time_major=True)
    return cfg, params, dp, cache, cache_tm, enc_bias


def test_cache_pad_to():
    cfg = VacnicConfig.tiny().bart
    params = B.bart_init(jax.random.PRNGKey(0), cfg)
    enc = jnp.zeros((2, 16, cfg.d_model), jnp.bfloat16)
    c = DF.build_decode_cache(params, enc, 2, 14, cfg, pad_to=16)
    assert c.self_k.shape[2] == 16


def _jit_steps(cfg, dp, params, enc_bias):
    ref = jax.jit(lambda c, t, p: DF.decode_step(
        dp, params, c, t, p, enc_bias, cfg, dtype=jnp.float32))
    pal = jax.jit(lambda c, t, p: DF.decode_step_pallas(
        dp, params, c, t, p, enc_bias, cfg, dtype=jnp.float32, plan=PLAN,
        interpret=True))
    return ref, pal


def test_single_step_parity(setup):
    cfg, params, dp, cache, cache_tm, enc_bias = setup
    bk = BATCH * BEAMS
    tok = jnp.full((bk, 1), 5, jnp.int32)
    pos = jnp.int32(0)
    ref, pal = _jit_steps(cfg, dp, params, enc_bias)
    ref_logits, ref_cache = ref(cache, tok, pos)
    pal_logits, pal_cache = pal(cache_tm, tok, pos)
    np.testing.assert_allclose(np.asarray(pal_logits), np.asarray(ref_logits),
                               atol=3e-2, rtol=3e-2)
    np.testing.assert_allclose(
        np.asarray(pal_cache.self_k.transpose(0, 2, 1, 3), np.float32),
        np.asarray(ref_cache.self_k, np.float32), atol=3e-2, rtol=3e-2)


def test_multi_step_parity(setup):
    """Run 5 greedy steps through both paths: token choices and caches must
    stay in lockstep (cache evolution, t<=pos masking, beam-shared cross)."""
    cfg, params, dp, cache, cache_tm, enc_bias = setup
    bk = BATCH * BEAMS
    ref, pal = _jit_steps(cfg, dp, params, enc_bias)

    def roll(step_fn, cache):
        tok = jnp.full((bk, 1), 2, jnp.int32)
        toks = []
        for pos in range(5):
            logits, cache = step_fn(cache, tok, jnp.int32(pos))
            tok = jnp.argmax(logits, axis=-1)[:, None].astype(jnp.int32)
            toks.append(np.asarray(tok[:, 0]))
        return np.stack(toks), logits

    ref_toks, ref_logits = roll(ref, cache)
    pal_toks, pal_logits = roll(pal, cache_tm)
    np.testing.assert_array_equal(pal_toks, ref_toks)
    np.testing.assert_allclose(np.asarray(pal_logits), np.asarray(ref_logits),
                               atol=5e-2, rtol=5e-2)


def test_single_step_parity_inkernel_lm(setup):
    """The optional in-kernel LM head (ChunkPlan.n_lm > 0) must produce the
    same logits as the default XLA LM head path."""
    cfg, params, dp, cache, cache_tm, enc_bias = setup
    bk = BATCH * BEAMS
    tok = jnp.full((bk, 1), 5, jnp.int32)
    pos = jnp.int32(0)
    ref, _ = _jit_steps(cfg, dp, params, enc_bias)
    pal_lm = jax.jit(lambda c, t, p: DF.decode_step_pallas(
        dp, params, c, t, p, enc_bias, cfg, dtype=jnp.float32,
        plan=PLAN._replace(n_lm=4), interpret=True))
    ref_logits, _ = ref(cache, tok, pos)
    pal_logits, _ = pal_lm(cache_tm, tok, pos)
    np.testing.assert_allclose(np.asarray(pal_logits), np.asarray(ref_logits),
                               atol=3e-2, rtol=3e-2)


def test_inkernel_lm_pad_phases_parity(setup):
    """n_lm larger than the body phase count pads plan.phases — the FFN
    guard must not re-run its last chunk on the pad phases (regression: it
    did, re-accumulating fc2 output into acc_s on every pad phase)."""
    cfg, params, dp, cache, cache_tm, enc_bias = setup
    bk = BATCH * BEAMS
    tok = jnp.full((bk, 1), 5, jnp.int32)
    pos = jnp.int32(2)
    ref, _ = _jit_steps(cfg, dp, params, enc_bias)
    plan = PLAN._replace(n_t=1, n_lm=8)  # body phases 6 < n_lm 8
    pal = jax.jit(lambda c, t, p: DF.decode_step_pallas(
        dp, params, c, t, p, enc_bias, cfg, dtype=jnp.float32,
        plan=plan, interpret=True))
    ref_logits, _ = ref(cache, tok, pos)
    pal_logits, _ = pal(cache_tm, tok, pos)
    np.testing.assert_allclose(np.asarray(pal_logits), np.asarray(ref_logits),
                               atol=3e-2, rtol=3e-2)


def test_beam_reorder_ancestry_parity(setup):
    """Random within-group beam selections over 5 steps: the pallas path's
    ancestry recompose (reorder_anc — no cache gather) must produce logits
    identical to the XLA path's physical cache gather."""
    cfg, params, dp, cache, cache_tm, enc_bias = setup
    bk = BATCH * BEAMS
    ref, pal = _jit_steps(cfg, dp, params, enc_bias)
    rng = np.random.RandomState(0)
    tok = jnp.full((bk, 1), 2, jnp.int32)

    for pos in range(5):
        ref_logits, cache = ref(cache, tok, jnp.int32(pos))
        pal_logits, cache_tm = pal(cache_tm, tok, jnp.int32(pos))
        np.testing.assert_allclose(np.asarray(pal_logits), np.asarray(ref_logits),
                                   atol=5e-2, rtol=5e-2)
        # random beam selection within each batch item's group
        sel = np.arange(bk).reshape(BATCH, BEAMS)
        sel = np.stack([g[rng.randint(0, BEAMS, BEAMS)] for g in sel]).reshape(-1)
        flat_sel = jnp.asarray(sel, jnp.int32)
        cache = cache._replace(
            self_k=jnp.take(cache.self_k, flat_sel, axis=1),
            self_v=jnp.take(cache.self_v, flat_sel, axis=1))
        cache_tm = DF.reorder_anc(cache_tm, flat_sel)
        tok = jnp.take(jnp.argmax(ref_logits, axis=-1).astype(jnp.int32),
                       flat_sel, axis=0)[:, None]


def test_gather_v2_matches_legacy(setup):
    """The deep-K ancestry formulation (ChunkPlan.gather_v2, r3) must equal
    the legacy batched one-hot gather — including after beam reorders."""
    cfg, params, dp, cache, cache_tm, enc_bias = setup
    bk = BATCH * BEAMS
    rng = np.random.RandomState(3)
    legacy = jax.jit(lambda c, t, p: DF.decode_step_pallas(
        dp, params, c, t, p, enc_bias, cfg, dtype=jnp.float32,
        plan=PLAN._replace(gather_v2=0), interpret=True))
    v2 = jax.jit(lambda c, t, p: DF.decode_step_pallas(
        dp, params, c, t, p, enc_bias, cfg, dtype=jnp.float32,
        plan=PLAN._replace(gather_v2=1), interpret=True))
    c_a = c_b = cache_tm
    tok = jnp.full((bk, 1), 2, jnp.int32)
    for pos in range(5):
        la, c_a = legacy(c_a, tok, jnp.int32(pos))
        lb, c_b = v2(c_b, tok, jnp.int32(pos))
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                   atol=2e-3, rtol=2e-3)
        sel = np.arange(bk).reshape(BATCH, BEAMS)
        sel = np.stack([g[rng.randint(0, BEAMS, BEAMS)] for g in sel]).reshape(-1)
        flat_sel = jnp.asarray(sel, jnp.int32)
        c_a = DF.reorder_anc(c_a, flat_sel)
        c_b = DF.reorder_anc(c_b, flat_sel)
        tok = jnp.take(jnp.argmax(la, axis=-1).astype(jnp.int32),
                       flat_sel, axis=0)[:, None]


def test_crosskv_int8_exact_when_representable(setup):
    """With cross K/V values that are exact int8 multiples of their scale,
    the int8 path must reproduce the bf16-path logits (the scale folds —
    q-side for K, output-side for V — are algebraically exact)."""
    cfg, params, dp, cache, cache_tm, enc_bias = setup
    bk = BATCH * BEAMS
    tok = jnp.full((bk, 1), 5, jnp.int32)
    pos = jnp.int32(0)

    # force exactly-representable cross K/V: ints in [-127, 127] times a
    # per-(L,B,H,hd) scale
    rng = np.random.RandomState(1)
    shp = cache_tm.cross_k.shape  # [L, B, H, hd, S]
    ints_k = rng.randint(-127, 128, shp).astype(np.float32)
    ints_v = rng.randint(-127, 128, shp).astype(np.float32)
    # pin the per-row max to 127 so quantize recovers the exact grid (the
    # computed scale equals the construction scale)
    ints_k[..., 0] = 127.0
    ints_v[..., 0] = 127.0
    sk = rng.uniform(0.005, 0.02, shp[:-1]).astype(np.float32)
    sv = rng.uniform(0.005, 0.02, shp[:-1]).astype(np.float32)
    ck = jnp.asarray(ints_k * sk[..., None])
    cv = jnp.asarray(ints_v * sv[..., None])

    base = cache_tm._replace(cross_k=ck, cross_v=cv)
    ck8, sk8 = DF.quantize_cross_kv(ck)
    cv8, sv8 = DF.quantize_cross_kv(cv)
    quant = cache_tm._replace(cross_k=ck8, cross_v=cv8,
                              cross_k_scale=sk8, cross_v_scale=sv8)
    # quantization must recover the exact int grid
    np.testing.assert_array_equal(np.asarray(ck8, np.int32),
                                  ints_k.astype(np.int32))

    pal = jax.jit(lambda c, t, p: DF.decode_step_pallas(
        dp, params, c, t, p, enc_bias, cfg, dtype=jnp.float32, plan=PLAN,
        interpret=True))
    base_logits, _ = pal(base, tok, pos)
    quant_logits, _ = pal(quant, tok, pos)
    np.testing.assert_allclose(np.asarray(quant_logits), np.asarray(base_logits),
                               atol=2e-3, rtol=2e-3)


def test_crosskv_int8_quality_proxy(setup):
    """Real (non-grid) cross K/V: int8 must track the bf16 path to small
    logit error and identical greedy tokens over multi-step decode — the
    CPU half of the on-chip quality gate (scripts/ab_crosskv_int8.py)."""
    cfg, params, dp, cache, cache_tm, enc_bias = setup
    bk = BATCH * BEAMS
    ck8, sk8 = DF.quantize_cross_kv(cache_tm.cross_k)
    cv8, sv8 = DF.quantize_cross_kv(cache_tm.cross_v)
    quant = cache_tm._replace(cross_k=ck8, cross_v=cv8,
                              cross_k_scale=sk8, cross_v_scale=sv8)
    pal = jax.jit(lambda c, t, p: DF.decode_step_pallas(
        dp, params, c, t, p, enc_bias, cfg, dtype=jnp.float32, plan=PLAN,
        interpret=True))

    def roll(cache):
        tok = jnp.full((bk, 1), 2, jnp.int32)
        toks = []
        for pos in range(5):
            logits, cache = pal(cache, tok, jnp.int32(pos))
            tok = jnp.argmax(logits, axis=-1)[:, None].astype(jnp.int32)
            toks.append(np.asarray(tok[:, 0]))
        return np.stack(toks), np.asarray(logits)

    ref_toks, ref_logits = roll(cache_tm)
    q_toks, q_logits = roll(quant)
    np.testing.assert_array_equal(q_toks, ref_toks)
    assert np.max(np.abs(q_logits - ref_logits)) < 0.15


def test_selfkv_fp8_exact_when_representable(setup):
    """fp8 (e4m3) self-cache: with past rows already on the fp8 grid, the
    step's logits are BIT-IDENTICAL to the full-precision-cache path — the
    step never reads its own new row from the cache (mask-merged from VMEM),
    so storage quantization only touches rows < pos, here exactly
    representable."""
    cfg, params, dp, cache, cache_tm, enc_bias = setup
    bk = BATCH * BEAMS
    fp8 = jnp.float8_e4m3fn
    rng = np.random.RandomState(3)
    t_dim = cache_tm.self_k.shape[1]
    pos = jnp.int32(3)
    grid_k = jnp.asarray(rng.randn(*cache_tm.self_k.shape).astype(np.float32)
                         ).astype(fp8).astype(jnp.float32)
    grid_v = jnp.asarray(rng.randn(*cache_tm.self_v.shape).astype(np.float32)
                         ).astype(fp8).astype(jnp.float32)
    # rows >= pos stay zero (kernel invariant: written only after the step)
    tmask = (jnp.arange(t_dim) < 3)[None, :, None, None]
    grid_k = jnp.where(tmask, grid_k, 0.0)
    grid_v = jnp.where(tmask, grid_v, 0.0)
    base = cache_tm._replace(self_k=grid_k, self_v=grid_v)
    quant = cache_tm._replace(self_k=grid_k.astype(fp8),
                              self_v=grid_v.astype(fp8))
    tok = jnp.full((bk, 1), 7, jnp.int32)
    pal = jax.jit(lambda c, t, p: DF.decode_step_pallas(
        dp, params, c, t, p, enc_bias, cfg, dtype=jnp.float32, plan=PLAN,
        interpret=True))
    base_logits, base_cache = pal(base, tok, pos)
    q_logits, q_cache = pal(quant, tok, pos)
    np.testing.assert_array_equal(np.asarray(q_logits), np.asarray(base_logits))
    # past rows round-trip untouched; the new row is clamp+fp8 of the base's
    past = np.asarray(q_cache.self_k.astype(jnp.float32))[:, :3]
    np.testing.assert_array_equal(past, np.asarray(base_cache.self_k)[:, :3])
    new_q = np.asarray(q_cache.self_k.astype(jnp.float32))[:, 3]
    new_b = np.asarray(base_cache.self_k)[:, 3]
    np.testing.assert_array_equal(
        new_q, np.asarray(jnp.asarray(np.clip(new_b, -448, 448)
                                      ).astype(fp8).astype(jnp.float32)))


def test_selfkv_fp8_quality_proxy(setup):
    """Real (non-grid) self K/V accumulated over a multi-step decode: the
    fp8 cache must track the full-precision path to small logit error and
    identical greedy tokens (mirrors the int8 cross-KV proxy)."""
    cfg, params, dp, cache, cache_tm, enc_bias = setup
    bk = BATCH * BEAMS
    fp8 = jnp.float8_e4m3fn
    quant = cache_tm._replace(self_k=cache_tm.self_k.astype(fp8),
                              self_v=cache_tm.self_v.astype(fp8))
    pal = jax.jit(lambda c, t, p: DF.decode_step_pallas(
        dp, params, c, t, p, enc_bias, cfg, dtype=jnp.float32, plan=PLAN,
        interpret=True))

    def roll(cache):
        tok = jnp.full((bk, 1), 2, jnp.int32)
        toks = []
        for pos in range(5):
            logits, cache = pal(cache, tok, jnp.int32(pos))
            tok = jnp.argmax(logits, axis=-1)[:, None].astype(jnp.int32)
            toks.append(np.asarray(tok[:, 0]))
        return np.stack(toks), np.asarray(logits)

    ref_toks, ref_logits = roll(cache_tm)
    q_toks, q_logits = roll(quant)
    np.testing.assert_array_equal(q_toks, ref_toks)
    assert np.max(np.abs(q_logits - ref_logits)) < 0.3


def test_selfkv_int8_exact_on_pow2_scales(setup):
    """int8 self-cache: with past rows on the int8 grid and POWER-OF-TWO
    per-(L, t, row, H) scales, the step's logits are BIT-IDENTICAL to a
    full-precision cache holding the dequantized values — multiplying by a
    power of two is exact, the in-kernel scale gather (one-hot matmul in
    f32) is an exact selection, and both commute with every f32 rounding in
    the score (scale × Σ q·k) and value (Σ (p·scale)·v) folds, so any
    difference would be a plumbing bug (block specs, ancestry alignment,
    mask interaction, pap handling)."""
    cfg, params, dp, cache, cache_tm, enc_bias = setup
    bk = BATCH * BEAMS
    H = cfg.decoder_attention_heads
    hd = cfg.d_model // H
    L, T = cache_tm.self_k.shape[0], cache_tm.self_k.shape[1]
    rng = np.random.RandomState(5)
    pos = jnp.int32(3)
    ints_k = rng.randint(-127, 128, cache_tm.self_k.shape).astype(np.float32)
    ints_v = rng.randint(-127, 128, cache_tm.self_v.shape).astype(np.float32)
    # rows >= pos stay zero (kernel invariant: written only after the step)
    tmask = (np.arange(T) < 3)[None, :, None, None]
    ints_k *= tmask
    ints_v *= tmask
    sk = 2.0 ** rng.randint(-3, 3, (L, T, bk, H)).astype(np.float32)
    sv = 2.0 ** rng.randint(-3, 3, (L, T, bk, H)).astype(np.float32)
    deq_k = (ints_k.reshape(L, T, bk, H, hd)
             * sk[:, :, :, :, None]).reshape(ints_k.shape)
    deq_v = (ints_v.reshape(L, T, bk, H, hd)
             * sv[:, :, :, :, None]).reshape(ints_v.shape)
    base = cache_tm._replace(self_k=jnp.asarray(deq_k),
                             self_v=jnp.asarray(deq_v))
    quant = cache_tm._replace(self_k=jnp.asarray(ints_k).astype(jnp.int8),
                              self_v=jnp.asarray(ints_v).astype(jnp.int8),
                              self_k_scale=jnp.asarray(sk),
                              self_v_scale=jnp.asarray(sv))
    tok = jnp.full((bk, 1), 7, jnp.int32)
    pal = jax.jit(lambda c, t, p: DF.decode_step_pallas(
        dp, params, c, t, p, enc_bias, cfg, dtype=jnp.float32, plan=PLAN,
        interpret=True))
    base_logits, _ = pal(base, tok, pos)
    q_logits, q_cache = pal(quant, tok, pos)
    np.testing.assert_array_equal(np.asarray(q_logits), np.asarray(base_logits))
    # past rows and their scales round-trip untouched; the step's scale row
    # lands at pos
    np.testing.assert_array_equal(
        np.asarray(q_cache.self_k, np.int32)[:, :3],
        ints_k[:, :3].astype(np.int32))
    assert np.all(np.asarray(q_cache.self_k_scale)[:, 3] > 0)


def test_selfkv_int8_pow2_exact_after_reorder(setup):
    """Per-row int8 scales under a NONTRIVIAL ancestry: after a random
    within-group beam selection (reorder_anc), the kernel must gather each
    row's scale through the same one-hot as its K/V data — with pow2 scales
    the logits stay BIT-IDENTICAL to the pre-dequantized cache under the
    same ancestry. The identity-ancestry pow2 test cannot catch a scale
    gather that forgets beam alignment; this one does."""
    cfg, params, dp, cache, cache_tm, enc_bias = setup
    bk = BATCH * BEAMS
    H = cfg.decoder_attention_heads
    hd = cfg.d_model // H
    L, T = cache_tm.self_k.shape[0], cache_tm.self_k.shape[1]
    rng = np.random.RandomState(11)
    ints_k = rng.randint(-127, 128, cache_tm.self_k.shape).astype(np.float32)
    ints_v = rng.randint(-127, 128, cache_tm.self_v.shape).astype(np.float32)
    tmask = (np.arange(T) < 3)[None, :, None, None]
    ints_k *= tmask
    ints_v *= tmask
    sk = 2.0 ** rng.randint(-3, 3, (L, T, bk, H)).astype(np.float32)
    sv = 2.0 ** rng.randint(-3, 3, (L, T, bk, H)).astype(np.float32)
    deq_k = (ints_k.reshape(L, T, bk, H, hd)
             * sk[:, :, :, :, None]).reshape(ints_k.shape)
    deq_v = (ints_v.reshape(L, T, bk, H, hd)
             * sv[:, :, :, :, None]).reshape(ints_v.shape)
    base = cache_tm._replace(self_k=jnp.asarray(deq_k),
                             self_v=jnp.asarray(deq_v),
                             pos=jnp.int32(2))
    quant = cache_tm._replace(self_k=jnp.asarray(ints_k).astype(jnp.int8),
                              self_v=jnp.asarray(ints_v).astype(jnp.int8),
                              self_k_scale=jnp.asarray(sk),
                              self_v_scale=jnp.asarray(sv),
                              pos=jnp.int32(2))
    # two rounds of random within-group selection compose a non-identity
    # ancestry over rows 0..2; both caches get the SAME ancestry
    for seed in (0, 1):
        r2 = np.random.RandomState(seed)
        sel = np.arange(bk).reshape(BATCH, BEAMS)
        sel = np.stack([g[r2.randint(0, BEAMS, BEAMS)] for g in sel]).reshape(-1)
        flat_sel = jnp.asarray(sel, jnp.int32)
        base = DF.reorder_anc(base, flat_sel)
        quant = DF.reorder_anc(quant, flat_sel)
    assert not np.array_equal(np.asarray(quant.anc[:3]),
                              np.asarray(cache_tm.anc[:3]))
    tok = jnp.full((bk, 1), 7, jnp.int32)
    pal = jax.jit(lambda c, t, p: DF.decode_step_pallas(
        dp, params, c, t, p, enc_bias, cfg, dtype=jnp.float32, plan=PLAN,
        interpret=True))
    base_logits, _ = pal(base, tok, jnp.int32(3))
    q_logits, _ = pal(quant, tok, jnp.int32(3))
    np.testing.assert_array_equal(np.asarray(q_logits), np.asarray(base_logits))


def test_selfkv_int8_quality_proxy(setup):
    """Real int8 self cache through the REAL write path (decode_step_pallas
    quantizes the kernel's new rows via quantize_self_rows): greedy tokens
    identical to the full-precision roll and small final-logit error —
    the CPU half of the on-chip gate (scripts/gate_selfkv_int8_cpu.py)."""
    cfg, params, dp, cache, cache_tm, enc_bias = setup
    bk = BATCH * BEAMS
    quant = DF.build_decode_cache(
        params,
        jax.random.normal(jax.random.PRNGKey(1),
                          (BATCH, S, cfg.d_model), jnp.float32),
        BEAMS, MAX_LEN, cfg, dtype=jnp.float32, pad_to=16, time_major=True,
        self_kv_int8=True)
    # same cross K/V as the baseline cache so ONLY the self path differs
    quant = quant._replace(cross_k=cache_tm.cross_k, cross_v=cache_tm.cross_v)
    assert quant.self_k.dtype == jnp.int8
    assert quant.self_k_scale.shape == (cfg.decoder_layers,
                                        quant.self_k.shape[1],
                                        bk,
                                        cfg.decoder_attention_heads)
    pal = jax.jit(lambda c, t, p: DF.decode_step_pallas(
        dp, params, c, t, p, enc_bias, cfg, dtype=jnp.float32, plan=PLAN,
        interpret=True))

    def roll(cache):
        tok = jnp.full((bk, 1), 2, jnp.int32)
        toks = []
        for pos in range(5):
            logits, cache = pal(cache, tok, jnp.int32(pos))
            tok = jnp.argmax(logits, axis=-1)[:, None].astype(jnp.int32)
            toks.append(np.asarray(tok[:, 0]))
        return np.stack(toks), np.asarray(logits)

    ref_toks, ref_logits = roll(cache_tm)
    q_toks, q_logits = roll(quant)
    np.testing.assert_array_equal(q_toks, ref_toks)
    assert np.max(np.abs(q_logits - ref_logits)) < 0.3


def test_quantize_self_rows_roundtrip():
    """Per-(L, row, H) symmetric quantization: scale shapes, the ≤ scale/2
    round-trip bound, and the zero-rows guard (scale floor, no NaN)."""
    rng = np.random.RandomState(7)
    rows = jnp.asarray(rng.randn(3, 8, 32).astype(np.float32))
    q, s = DF.quantize_self_rows(rows, n_heads=4)
    assert q.shape == rows.shape and q.dtype == jnp.int8
    assert s.shape == (3, 8, 4)
    deq = (np.asarray(q, np.float32).reshape(3, 8, 4, 8)
           * np.asarray(s)[:, :, :, None]).reshape(3, 8, 32)
    err = np.abs(deq - np.asarray(rows))
    bound = np.asarray(s)[:, :, :, None] * 0.5 + 1e-7
    assert np.all(err.reshape(3, 8, 4, 8) <= bound)
    qz, sz = DF.quantize_self_rows(jnp.zeros((2, 4, 16)), n_heads=2)
    assert np.all(np.asarray(sz) == 1e-12) and not np.any(np.asarray(qz))


def test_choose_plan_int8_chunking(monkeypatch):
    """VACNIC_SELFKV_INT8=1 constrains self row chunks to (32,128)-tileable
    widths unless VACNIC_INT8_SUB8=1 relaxes to the probed 8-alignment."""
    monkeypatch.setenv("VACNIC_SELFKV_INT8", "1")
    plan = DF.choose_plan(1280, 256, 64, 4096)
    assert (1280 // plan.n_self) % 32 == 0
    monkeypatch.setenv("VACNIC_INT8_SUB8", "1")
    plan = DF.choose_plan(1280, 256, 64, 4096)
    assert (1280 // plan.n_self) % 8 == 0
    monkeypatch.delenv("VACNIC_SELFKV_INT8")
    monkeypatch.delenv("VACNIC_INT8_SUB8")


def test_generate_mm_selfkv_int8_engaged(monkeypatch):
    """VACNIC_SELFKV_INT8=1 (+SUB8 relaxation) routes generate_mm through an
    int8 self cache end-to-end on kernel-eligible shapes. The engagement is
    asserted by interposing build_decode_cache (vacuous-test trap: an env
    knob that silently gates itself off would otherwise still 'pass'), and
    the decode must produce in-vocab sequences with finite scores."""
    import dataclasses

    from vacnic_tpu.core.config import VacnicConfig
    from vacnic_tpu.data.synthetic import synthetic_batch
    from vacnic_tpu.infer.generate import generate_mm
    from vacnic_tpu.models import fusion as F
    from vacnic_tpu.train.train_step import create_mask, face_mask_from_emb

    cfg = VacnicConfig.tiny()
    params = F.multimodal_bart_init(jax.random.PRNGKey(0), cfg.bart, cfg.fusion)
    # bk = 4*2 = 8: one 8-row chunk — legal under the SUB8 relaxation
    batch = synthetic_batch(cfg, batch_size=4, seed=0)
    dcfg = dataclasses.replace(cfg.decode, num_beams=2, max_length=8)
    monkeypatch.setenv("VACNIC_PALLAS_DECODE", "1")
    monkeypatch.setenv("VACNIC_SELFKV_INT8", "1")
    monkeypatch.setenv("VACNIC_INT8_SUB8", "1")

    seen = {}
    orig = DF.build_decode_cache

    def spy(*args, **kwargs):
        cache = orig(*args, **kwargs)
        seen["self_kv_int8"] = kwargs.get("self_kv_int8", False)
        seen["dtype"] = cache.self_k.dtype
        return cache

    monkeypatch.setattr(DF, "build_decode_cache", spy)
    seqs, scores = generate_mm(
        params, batch["article_ids"], create_mask(batch["article_ids"]),
        batch["image_cls"], cfg.bart, cfg.fusion, dcfg,
        face_features=batch["face_emb"],
        face_mask=face_mask_from_emb(batch["face_emb"]),
        name_ids=batch["names_art_ids"],
        name_mask=create_mask(batch["names_art_ids"]),
        dtype=jnp.float32)
    assert seen["self_kv_int8"] is True and seen["dtype"] == jnp.int8
    assert np.all(np.isfinite(np.asarray(scores)))
    s = np.asarray(seqs)
    assert s.shape[0] == 4 and np.all(s >= 0) and np.all(s < cfg.bart.vocab_size)


def test_choose_plan_fp8_chunking(monkeypatch):
    """VACNIC_SELFKV_FP8=1 constrains self row chunks to (32,128)-tileable
    widths (bkc % 32, on top of beams- and 8-alignment); shapes with no
    legal fp8 chunking fall back to bf16 legality."""
    monkeypatch.setenv("VACNIC_SELFKV_FP8", "1")
    plan = DF.choose_plan(1280, 256, 64, 4096)  # b256: bkc 160, not 80
    assert (1280 // plan.n_self) % 32 == 0
    assert (1280 // plan.n_self) % 5 == 0
    plan = DF.choose_plan(40, 8, 16, 256)  # tiny: no bkc % 32 option
    assert (40 // plan.n_self) % 8 == 0
    monkeypatch.delenv("VACNIC_SELFKV_FP8")


def test_generate_mm_cache_pad4_token_parity(monkeypatch):
    """T=4-aligned cache padding (VACNIC_CACHE_PAD_PALLAS=4; the b512 HBM
    unlock) is token- and score-identical to the proven pad-16 layout —
    pad rows past max_length are inert (attention masks t <= pos)."""
    import dataclasses

    from vacnic_tpu.core.config import VacnicConfig
    from vacnic_tpu.data.synthetic import synthetic_batch
    from vacnic_tpu.infer.generate import generate_mm
    from vacnic_tpu.models import fusion as F
    from vacnic_tpu.train.train_step import create_mask, face_mask_from_emb

    cfg = VacnicConfig.tiny()
    params = F.multimodal_bart_init(jax.random.PRNGKey(0), cfg.bart, cfg.fusion)
    batch = synthetic_batch(cfg, batch_size=2, seed=0)
    # max_length 10 -> T=16 at pad 16, T=12 at pad 4 (tb=3 with n_t=4
    # after the divisor clamp) — exercises a non-multiple-of-16 T
    dcfg = dataclasses.replace(cfg.decode, num_beams=2, max_length=10)

    def run():
        seqs, scores = generate_mm(
            params, batch["article_ids"], create_mask(batch["article_ids"]),
            batch["image_cls"], cfg.bart, cfg.fusion, dcfg,
            face_features=batch["face_emb"],
            face_mask=face_mask_from_emb(batch["face_emb"]),
            name_ids=batch["names_art_ids"],
            name_mask=create_mask(batch["names_art_ids"]),
            dtype=jnp.float32)
        return np.asarray(seqs), np.asarray(scores)

    monkeypatch.setenv("VACNIC_PALLAS_DECODE", "1")
    monkeypatch.delenv("VACNIC_CACHE_PAD_PALLAS", raising=False)
    s16, sc16 = run()
    monkeypatch.setenv("VACNIC_CACHE_PAD_PALLAS", "4")
    s4, sc4 = run()
    np.testing.assert_array_equal(s4, s16)
    np.testing.assert_allclose(sc4, sc16, atol=1e-5, rtol=0)


def test_generate_mm_selfkv_fp8_gate(monkeypatch):
    """The VACNIC_SELFKV_FP8 knob must actually reach build_decode_cache —
    ON at fp8-eligible shapes (bkc % 32 == 0), OFF at tiny shapes — guarding
    against the r4 vacuous-knob trap (a knob that never activates 'passes'
    every A/B). The spy aborts before the expensive decode."""
    import dataclasses

    from vacnic_tpu.core.config import VacnicConfig
    from vacnic_tpu.infer.generate import generate_mm
    from vacnic_tpu.models import fusion as F
    from vacnic_tpu.data.synthetic import synthetic_batch
    from vacnic_tpu.train.train_step import create_mask, face_mask_from_emb

    cfg = VacnicConfig.tiny()
    params = F.multimodal_bart_init(jax.random.PRNGKey(0), cfg.bart, cfg.fusion)

    class Stop(Exception):
        pass

    captured = {}
    orig = DF.build_decode_cache

    def spy(*a, **kw):
        captured.update(kw)
        raise Stop()

    monkeypatch.setattr(DF, "build_decode_cache", spy)
    monkeypatch.setenv("VACNIC_PALLAS_DECODE", "1")
    monkeypatch.setenv("VACNIC_SELFKV_FP8", "1")

    def run(batch_size, beams):
        batch = synthetic_batch(cfg, batch_size=batch_size, seed=0)
        dcfg = dataclasses.replace(cfg.decode, num_beams=beams, max_length=8)
        with pytest.raises(Exception) as ei:
            generate_mm(
                params, batch["article_ids"], create_mask(batch["article_ids"]),
                batch["image_cls"], cfg.bart, cfg.fusion, dcfg,
                face_features=batch["face_emb"],
                face_mask=face_mask_from_emb(batch["face_emb"]),
                name_ids=batch["names_art_ids"],
                name_mask=create_mask(batch["names_art_ids"]),
                dtype=jnp.float32)
        assert "Stop" in str(ei.type) or "Stop" in str(ei.value)
        return captured.pop("self_kv_fp8")

    assert run(32, 5) is True   # bk=160 -> n_self=1, bkc=160 (32-aligned)
    assert run(2, 2) is False   # bk=4: no fp8-legal chunking
    monkeypatch.setattr(DF, "build_decode_cache", orig)


def test_generate_mm_pallas_flag_token_parity(monkeypatch):
    """End-to-end beam search through generate_mm with VACNIC_PALLAS_DECODE=1
    (auto-interpret on CPU): token-identical to the XLA path."""
    import dataclasses

    from vacnic_tpu.core.config import VacnicConfig
    from vacnic_tpu.data.synthetic import synthetic_batch
    from vacnic_tpu.infer.generate import generate_mm
    from vacnic_tpu.models import fusion as F
    from vacnic_tpu.train.train_step import create_mask, face_mask_from_emb

    cfg = VacnicConfig.tiny()
    key = jax.random.PRNGKey(0)
    params = F.multimodal_bart_init(key, cfg.bart, cfg.fusion)
    batch = synthetic_batch(cfg, batch_size=2, seed=0)
    dcfg = dataclasses.replace(cfg.decode, num_beams=2, max_length=8)

    def run():
        generate_mm._clear_cache() if hasattr(generate_mm, "_clear_cache") else None
        seqs, scores = generate_mm(
            params, batch["article_ids"], create_mask(batch["article_ids"]),
            batch["image_cls"], cfg.bart, cfg.fusion, dcfg,
            face_features=batch["face_emb"],
            face_mask=face_mask_from_emb(batch["face_emb"]),
            name_ids=batch["names_art_ids"],
            name_mask=create_mask(batch["names_art_ids"]),
        )
        return np.asarray(seqs), np.asarray(scores)

    monkeypatch.delenv("VACNIC_PALLAS_DECODE", raising=False)
    ref_seqs, ref_scores = run()
    monkeypatch.setenv("VACNIC_PALLAS_DECODE", "1")
    jax.clear_caches()  # the env flag is read at trace time
    pal_seqs, pal_scores = run()
    np.testing.assert_array_equal(pal_seqs, ref_seqs)
    np.testing.assert_allclose(pal_scores, ref_scores, rtol=2e-3, atol=2e-3)


def test_padded_beam_groups_token_parity(monkeypatch):
    """Shapes with no legal kernel plan (batch 1 × beam 5) run with padded
    beam groups (kp=8 rows per item): tokens must match the XLA path
    exactly — dummy rows are sliced off and never selected."""
    import dataclasses

    from vacnic_tpu.core.config import VacnicConfig
    from vacnic_tpu.data.synthetic import synthetic_batch
    from vacnic_tpu.infer import decode_fast as DFm
    from vacnic_tpu.infer.generate import generate_mm
    from vacnic_tpu.models import fusion as F
    from vacnic_tpu.train.train_step import create_mask, face_mask_from_emb

    cfg = VacnicConfig.tiny()
    key = jax.random.PRNGKey(1)
    params = F.multimodal_bart_init(key, cfg.bart, cfg.fusion)
    batch = synthetic_batch(cfg, batch_size=1, seed=1)
    dcfg = dataclasses.replace(cfg.decode, num_beams=5, max_length=8)

    def run():
        seqs, scores = generate_mm(
            params, batch["article_ids"], create_mask(batch["article_ids"]),
            batch["image_cls"], cfg.bart, cfg.fusion, dcfg,
            face_features=batch["face_emb"],
            face_mask=face_mask_from_emb(batch["face_emb"]),
            name_ids=batch["names_art_ids"],
            name_mask=create_mask(batch["names_art_ids"]),
        )
        return np.asarray(seqs), np.asarray(scores)

    monkeypatch.delenv("VACNIC_PALLAS_DECODE", raising=False)
    ref_seqs, ref_scores = run()
    # force the padding decision on CPU: base plan "illegal", kp=8 legal
    # (padded groups are opt-in since the b1 A/B — batch26.log)
    monkeypatch.setenv("VACNIC_PALLAS_DECODE", "1")
    monkeypatch.setenv("VACNIC_PAD_BEAMGROUPS", "1")
    monkeypatch.setattr(DFm, "pallas_plan_exists", lambda b, k: k % 8 == 0)
    jax.clear_caches()
    assert DFm.padded_beams(1, 5) == 8
    pal_seqs, pal_scores = run()
    np.testing.assert_array_equal(pal_seqs, ref_seqs)
    np.testing.assert_allclose(pal_scores, ref_scores, rtol=2e-3, atol=2e-3)


def test_wide_beam_parity(setup):
    """num_beams > 8 crosses the kernel's 8-aligned beam-pad boundary
    (kp = ceil8(beams)); regression for the hardcoded kp=8 that silently
    zeroed cross-attention for beams 8..K-1."""
    cfg, params, dp, _, _, enc_bias = setup
    wide_beams = 11  # > 8 and deliberately non-8-aligned
    key = jax.random.fold_in(jax.random.PRNGKey(0), 9)
    # amplified encoder output: at random init the step-0 cross-attn
    # contribution is ~0.005 in logits and a zeroed-cross regression slips
    # under any sane tolerance; x100 makes losing cross-attention read ~1.8
    enc_out = jax.random.normal(key, (BATCH, S, cfg.d_model), jnp.float32) * 100.0
    bias = jnp.where(jnp.arange(S) < S - 8, 0.0, jnp.finfo(jnp.float32).min)
    enc_bias_w = jnp.broadcast_to(bias[None, None, None, :], (BATCH, 1, 1, S))
    cache = DF.build_decode_cache(params, enc_out, wide_beams, MAX_LEN, cfg,
                                  dtype=jnp.float32, pad_to=16)
    cache_tm = DF.build_decode_cache(params, enc_out, wide_beams, MAX_LEN, cfg,
                                     dtype=jnp.float32, pad_to=16,
                                     time_major=True)
    plan = ChunkPlan(n_self=2, n_cross=2, n_ffn=2)  # bkc=22, whole beam groups
    ref = jax.jit(lambda c, t, p: DF.decode_step(
        dp, params, c, t, p, enc_bias_w, cfg, dtype=jnp.float32))
    pal = jax.jit(lambda c, t, p: DF.decode_step_pallas(
        dp, params, c, t, p, enc_bias_w, cfg, dtype=jnp.float32, plan=plan,
        interpret=True))
    bk = BATCH * wide_beams
    tok = jnp.full((bk, 1), 5, jnp.int32)
    ref_logits, _ = ref(cache, tok, jnp.int32(0))
    pal_logits, _ = pal(cache_tm, tok, jnp.int32(0))
    # beams past the old kp=8 boundary must carry real cross-attention signal,
    # not the zeroed rows of the regression (which read max|d| ~1.8 here)
    per_beam = np.asarray(pal_logits).reshape(BATCH, wide_beams, -1)
    ref_beam = np.asarray(ref_logits).reshape(BATCH, wide_beams, -1)
    np.testing.assert_allclose(per_beam, ref_beam, atol=5e-2, rtol=5e-2)
    assert np.abs(per_beam[:, 8:] - ref_beam[:, 8:]).max() < 5e-2


def test_online_softmax_rescale_across_chunks(setup):
    """The kernel's online-softmax rescale (alpha = exp(m_old - m_new),
    applied to l_s/att_s/pap_s when a LATER time chunk raises the running
    max) is invisible to the standard rolls: fresh-model caches never raise
    the max after chunk 0, so a broken rescale (alpha := 1) passes them —
    found by mutation. Inject cache K rows whose magnitude GROWS with t so
    every later chunk raises the per-(row, head) max, and compare a
    chunk-spanning step (pos=9 -> 3 time chunks at n_t=4) to the reference
    path."""
    cfg, params, dp, _, _, enc_bias = setup
    key = jax.random.fold_in(jax.random.PRNGKey(0), 31)
    enc_out = jax.random.normal(key, (BATCH, S, cfg.d_model), jnp.float32)
    cache = DF.build_decode_cache(params, enc_out, BEAMS, MAX_LEN, cfg,
                                  dtype=jnp.float32, pad_to=16)
    cache_tm = DF.build_decode_cache(params, enc_out, BEAMS, MAX_LEN, cfg,
                                     dtype=jnp.float32, pad_to=16,
                                     time_major=True)
    L, bk, T, D = cache.self_k.shape
    pos = 9
    kkey, vkey = jax.random.split(jax.random.fold_in(key, 1))
    base_k = jax.random.normal(kkey, (L, bk, T, D), jnp.float32)
    base_v = jax.random.normal(vkey, (L, bk, T, D), jnp.float32)
    # magnitude grows with t: chunk 1's rows dominate chunk 0's, chunk 2's
    # dominate chunk 1's -> the running max increases at every chunk switch
    mag = (1.0 + 0.25 * jnp.arange(T, dtype=jnp.float32))[None, None, :, None]
    live = (jnp.arange(T) < pos)[None, None, :, None]
    k_rows = jnp.where(live, base_k * mag, 0.0)
    v_rows = jnp.where(live, base_v, 0.0)
    cache = cache._replace(self_k=k_rows, self_v=v_rows)
    cache_tm = cache_tm._replace(self_k=k_rows.transpose(0, 2, 1, 3),
                                 self_v=v_rows.transpose(0, 2, 1, 3))

    ref, pal = _jit_steps(cfg, dp, params, enc_bias)
    tok = jnp.full((bk, 1), 7, jnp.int32)
    ref_logits, _ = ref(cache, tok, jnp.int32(pos))
    pal_logits, _ = pal(cache_tm, tok, jnp.int32(pos))
    # tolerance calibrated against the mutation: correct kernel reads
    # max|d| ~0.002 here, the alpha:=1 mutant ~0.039 — 0.01 splits them 5x
    # each way (looser tolerances let the mutant slip through)
    np.testing.assert_allclose(np.asarray(pal_logits), np.asarray(ref_logits),
                               atol=1e-2, rtol=0)


@pytest.mark.parametrize("n_ffn", [2, 1])
def test_ffn_shadow_parity(setup, n_ffn):
    """FFN-in-fetch-shadow (r5 overlap lever): the shadow-scheduled FFN jobs
    (computed inside the cross/tail phases) must match the XLA reference
    exactly — single step and 5-step cache evolution, both n_ffn=2 (stride 1)
    and n_ffn=1 (stride 2)."""
    cfg, params, dp, cache, cache_tm, enc_bias = setup
    bk = BATCH * BEAMS
    plan = ChunkPlan(n_self=2, n_cross=2, n_ffn=n_ffn, ffn_shadow=1)
    ref = jax.jit(lambda c, t, p: DF.decode_step(
        dp, params, c, t, p, enc_bias, cfg, dtype=jnp.float32))
    pal = jax.jit(lambda c, t, p: DF.decode_step_pallas(
        dp, params, c, t, p, enc_bias, cfg, dtype=jnp.float32, plan=plan,
        interpret=True))

    def roll(step_fn, cache):
        tok = jnp.full((bk, 1), 2, jnp.int32)
        toks = []
        for pos in range(5):
            logits, cache = step_fn(cache, tok, jnp.int32(pos))
            tok = jnp.argmax(logits, axis=-1)[:, None].astype(jnp.int32)
            toks.append(np.asarray(tok[:, 0]))
        return np.stack(toks), logits

    ref_toks, ref_logits = roll(ref, cache)
    pal_toks, pal_logits = roll(pal, cache_tm)
    np.testing.assert_array_equal(pal_toks, ref_toks)
    np.testing.assert_allclose(np.asarray(pal_logits), np.asarray(ref_logits),
                               atol=5e-2, rtol=5e-2)


def test_ffn_shadow_schedule_rejects_bad_geometry(setup):
    """A plan whose shadow schedule would read x1 rows before the producing
    cross phase must be rejected loudly (assert), not decode garbage."""
    cfg, params, dp, cache, cache_tm, enc_bias = setup
    bk = BATCH * BEAMS
    # n_self=1, n_cross=2: chunk 0 spans ALL rows, produced only after cross
    # phase 1, but job 0 runs at phase 2... that passes; use n_self=2,
    # n_cross=4 (rows_per_cross=2): chunk 0 ready after phase 1, job at 2 ok;
    # chunk 1 ready after phase 3, job at phase 4 ok -> need a real violator:
    # n_self=4, n_cross=8 with n_ffn=1 -> bkc=2, rows_per_cross=1... keep it
    # simple: directly check choose_plan's guard instead.
    import logging

    from vacnic_tpu.infer.decode_fast import choose_plan

    # geometry where n_cross/n_self > 2*n_ffn: chunk 1 of n_self=2 spans
    # rows produced by cross phase 7 (m_prod=4c+3) but its job would run at
    # phase 2c+2=4 — violation, guard must auto-disable. (All values are
    # legal for choose_plan's clamps: bkc=160 is 5- and 8-aligned, bc=8.)
    import os
    os.environ["VACNIC_PLAN_FFNSHADOW"] = "1"
    os.environ["VACNIC_PLAN_NSELF"] = "2"
    os.environ["VACNIC_PLAN_NCROSS"] = "8"
    os.environ["VACNIC_PLAN_NFFN"] = "1"
    try:
        plan = choose_plan(bk=320, b=64, t_max=64, ffn_cols=4096)
        assert plan.ffn_shadow == 0  # guard auto-disabled it
    finally:
        for k in ("VACNIC_PLAN_FFNSHADOW", "VACNIC_PLAN_NSELF",
                  "VACNIC_PLAN_NCROSS", "VACNIC_PLAN_NFFN"):
            os.environ.pop(k, None)


def test_t_fuse_parity(setup):
    """Time-chunk phase fusion (t_fuse=2): two time chunks per grid step via
    even/odd window operands. Exact parity vs the XLA reference across
    decode positions that exercise last_tc = 0 (odd operand fetched but
    unused), odd, and even last chunks. Uses n_t=4 so fusion is non-trivial
    (T=16, tb=4)."""
    cfg, params, dp, cache, cache_tm, enc_bias = setup
    bk = BATCH * BEAMS
    plan = ChunkPlan(n_self=2, n_cross=2, n_ffn=2, n_t=4, t_fuse=2)
    ref = jax.jit(lambda c, t, p: DF.decode_step(
        dp, params, c, t, p, enc_bias, cfg, dtype=jnp.float32))
    pal = jax.jit(lambda c, t, p: DF.decode_step_pallas(
        dp, params, c, t, p, enc_bias, cfg, dtype=jnp.float32, plan=plan,
        interpret=True))

    def roll(step_fn, cache, n=13):
        tok = jnp.full((bk, 1), 2, jnp.int32)
        toks = []
        for pos in range(n):  # crosses tb=4 boundaries: last_tc 0,1,2,3
            logits, cache = step_fn(cache, tok, jnp.int32(pos))
            tok = jnp.argmax(logits, axis=-1)[:, None].astype(jnp.int32)
            toks.append(np.asarray(tok[:, 0]))
        return np.stack(toks), logits

    ref_toks, ref_logits = roll(ref, cache)
    pal_toks, pal_logits = roll(pal, cache_tm)
    np.testing.assert_array_equal(pal_toks, ref_toks)
    np.testing.assert_allclose(np.asarray(pal_logits), np.asarray(ref_logits),
                               atol=5e-2, rtol=5e-2)


def test_t_fuse_with_ffn_shadow_parity(setup):
    """The two r5 phase-restructuring variants compose: t_fuse=2 +
    ffn_shadow=1 must still match the XLA reference exactly."""
    cfg, params, dp, cache, cache_tm, enc_bias = setup
    bk = BATCH * BEAMS
    plan = ChunkPlan(n_self=2, n_cross=2, n_ffn=2, n_t=4, t_fuse=2,
                     ffn_shadow=1)
    ref = jax.jit(lambda c, t, p: DF.decode_step(
        dp, params, c, t, p, enc_bias, cfg, dtype=jnp.float32))
    pal = jax.jit(lambda c, t, p: DF.decode_step_pallas(
        dp, params, c, t, p, enc_bias, cfg, dtype=jnp.float32, plan=plan,
        interpret=True))
    tok = jnp.full((bk, 1), 2, jnp.int32)
    c_r, c_p = cache, cache_tm
    for pos in range(6):
        rl, c_r = ref(c_r, tok, jnp.int32(pos))
        pl_, c_p = pal(c_p, tok, jnp.int32(pos))
        np.testing.assert_allclose(np.asarray(pl_), np.asarray(rl),
                                   atol=5e-2, rtol=5e-2)
        tok = jnp.argmax(rl, axis=-1)[:, None].astype(jnp.int32)
