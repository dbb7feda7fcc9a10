"""Fast decode path numerics: per-step logits must match the general
models/bart cached decoder exactly (fp32)."""

import numpy as np
import jax
import jax.numpy as jnp

from vacnic_tpu.core.config import BartConfig
from vacnic_tpu.infer import decode_fast as DF
from vacnic_tpu.models import bart as B
from vacnic_tpu.models.layers import expand_mask

TINY = BartConfig.tiny()


def test_decode_fast_matches_reference_path(rng):
    params = B.bart_init(jax.random.PRNGKey(3), TINY)
    bsz, src, tgt = 3, 11, 6
    src_ids = rng.randint(4, TINY.vocab_size, size=(bsz, src))
    src_ids[0, -2:] = 1
    mask = jnp.asarray((src_ids != 1).astype(np.int32))
    tgt_ids = rng.randint(4, TINY.vocab_size, size=(bsz, tgt)).astype(np.int32)

    enc = B.encoder_fwd(params, jnp.asarray(src_ids), mask, TINY)

    # reference: general cached path
    ref_cache = B.init_cache(params, bsz, tgt, enc, TINY)
    ref_logits = []
    for t in range(tgt):
        dec_h, ref_cache = B.decoder_fwd(
            params, jnp.asarray(tgt_ids[:, t : t + 1]), enc, mask, TINY,
            cache=ref_cache, cache_index=jnp.int32(t),
        )
        ref_logits.append(np.asarray(B.lm_logits(params, dec_h)[:, 0]))

    # fast path (fp32 to compare exactly; num_beams=1 → B·K == B)
    dp = DF.build_decode_params(params, jnp.float32)
    cache = DF.build_decode_cache(params, enc, 1, tgt, TINY, jnp.float32)
    enc_bias = expand_mask(mask, 1)
    for t in range(tgt):
        logits, cache = DF.decode_step(
            dp, params, cache, jnp.asarray(tgt_ids[:, t : t + 1]), jnp.int32(t),
            enc_bias, TINY, jnp.float32,
        )
        np.testing.assert_allclose(
            np.asarray(logits), ref_logits[t], atol=2e-4, rtol=2e-4,
            err_msg=f"step {t}",
        )


def test_pallas_plan_exists_gate(monkeypatch):
    """The default-on Pallas gate must reject batches with no Mosaic-legal
    chunking (8-aligned row chunks of whole batch items) on accelerators and
    always pass on CPU (interpret mode has no such constraints)."""
    import jax

    from vacnic_tpu.infer.decode_fast import pallas_plan_exists

    # CPU: always true
    assert pallas_plan_exists(3, 5)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # bench shapes: fine
    assert pallas_plan_exists(32, 5)
    assert pallas_plan_exists(64, 5)
    assert pallas_plan_exists(128, 5)
    assert pallas_plan_exists(8, 2)     # n=1 -> bkc=16, 8-aligned
    # odd tails with no 8-aligned whole-item chunking: rejected
    assert not pallas_plan_exists(3, 5)   # bk=15
    assert not pallas_plan_exists(11, 5)  # bk=55
    assert not pallas_plan_exists(1, 4)   # bk=4


def test_choose_plan_clamps_env_chunking(monkeypatch):
    """Env-swept plan knobs must never produce Mosaic-illegal blocks:
    n_cross keeps enc_bias row blocks 8-aligned (b512 + NCROSS=128 failed
    to lower, scripts/logs_r4/bench_queue6.log); n_ffn falls back on
    non-divisors."""
    # b512 + NCROSS=128 -> 4-row enc_bias blocks: clamp to 64 (8 rows)
    monkeypatch.setenv("VACNIC_PLAN_NCROSS", "128")
    plan = DF.choose_plan(2560, 512, 64, 4096)
    assert plan.n_cross == 64
    monkeypatch.delenv("VACNIC_PLAN_NCROSS")
    # default picks are already legal at the bench shapes
    for b in (32, 64, 128, 256, 512):
        plan = DF.choose_plan(5 * b, b, 64, 4096)
        assert b % plan.n_cross == 0
        bc = b // plan.n_cross
        assert bc == b or bc % 8 == 0
    # env n_self must keep bkc beam-aligned AND 8-aligned: b512 + NSELF=40
    # gave bkc=64 (not a multiple of beams=5) and decode_stack asserted
    # (scripts/logs_r4/bench_queue8.log) — clamp to the largest legal value
    monkeypatch.setenv("VACNIC_PLAN_NSELF", "40")
    plan = DF.choose_plan(2560, 512, 64, 4096)
    assert plan.n_self == 32 and (2560 // plan.n_self) % 5 == 0
    # NSELF=64 -> bkc=40: legal (beams 5, 8-aligned), honored
    monkeypatch.setenv("VACNIC_PLAN_NSELF", "64")
    plan = DF.choose_plan(2560, 512, 64, 4096)
    assert plan.n_self == 64
    monkeypatch.delenv("VACNIC_PLAN_NSELF")
    # n_ffn non-divisor falls back to the default
    monkeypatch.setenv("VACNIC_PLAN_NFFN", "3")
    plan = DF.choose_plan(160, 32, 64, 4096)
    assert plan.n_ffn == 2
    monkeypatch.delenv("VACNIC_PLAN_NFFN")
    # NFFN=4 divides 4096: honored
    monkeypatch.setenv("VACNIC_PLAN_NFFN", "4")
    plan = DF.choose_plan(2560, 512, 64, 4096)
    assert plan.n_ffn == 4
    # NFFN=0 must fall back, not ZeroDivisionError (review finding)
    monkeypatch.setenv("VACNIC_PLAN_NFFN", "0")
    plan = DF.choose_plan(160, 32, 64, 4096)
    assert plan.n_ffn == 2
    monkeypatch.delenv("VACNIC_PLAN_NFFN")
    # NCROSS env at b < 8 must clamp to 1, not StopIteration (review finding)
    monkeypatch.setenv("VACNIC_PLAN_NCROSS", "2")
    plan = DF.choose_plan(20, 4, 16, 256)
    assert plan.n_cross == 1
    monkeypatch.delenv("VACNIC_PLAN_NCROSS")
    # NT=0 must fall back to the default, not ZeroDivisionError; negatives
    # must not StopIteration (review finding)
    for bad in ("0", "-4"):
        monkeypatch.setenv("VACNIC_PLAN_NT", bad)
        plan = DF.choose_plan(160, 32, 64, 4096)
        assert plan.n_t >= 1 and 64 % plan.n_t == 0
    monkeypatch.delenv("VACNIC_PLAN_NT")


def test_decode_fast_distinct_decoder_head_count(rng):
    """Configs where encoder and decoder head counts differ must decode
    through the fast path (it previously paired cfg.head_dim — an ENCODER
    quantity — with decoder_attention_heads and crashed on the reshape)."""
    import dataclasses

    cfg = dataclasses.replace(TINY, encoder_attention_heads=4,
                              decoder_attention_heads=2)
    params = B.bart_init(jax.random.PRNGKey(5), cfg)
    bsz, src, tgt = 2, 9, 4
    src_ids = rng.randint(4, cfg.vocab_size, size=(bsz, src))
    mask = jnp.asarray((src_ids != 1).astype(np.int32))
    tgt_ids = rng.randint(4, cfg.vocab_size, size=(bsz, tgt)).astype(np.int32)

    enc = B.encoder_fwd(params, jnp.asarray(src_ids), mask, cfg)
    ref_cache = B.init_cache(params, bsz, tgt, enc, cfg)
    dp = DF.build_decode_params(params, jnp.float32)
    cache = DF.build_decode_cache(params, enc, 1, tgt, cfg, jnp.float32)
    enc_bias = expand_mask(mask, 1)
    for t in range(tgt):
        dec_h, ref_cache = B.decoder_fwd(
            params, jnp.asarray(tgt_ids[:, t : t + 1]), enc, mask, cfg,
            cache=ref_cache, cache_index=jnp.int32(t),
        )
        ref = np.asarray(B.lm_logits(params, dec_h)[:, 0])
        logits, cache = DF.decode_step(
            dp, params, cache, jnp.asarray(tgt_ids[:, t : t + 1]), jnp.int32(t),
            enc_bias, cfg, jnp.float32,
        )
        np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=2e-4,
                                   err_msg=f"step {t}")


def test_plan_regime_stale_warning(monkeypatch, caplog):
    """Plan-provenance guard (VERDICT r4 #6): choose_plan warns (once) when
    the active knob regime differs from the one its per-batch defaults were
    measured under, and stays silent on the measured-basis defaults."""
    import logging

    from vacnic_tpu.infer import decode_fast as DF

    # default regime -> no warning
    for knob in ("VACNIC_BEAM_LOGIC", "VACNIC_BEAM_SHORTLIST",
                 "VACNIC_BEAM_TOPK", "VACNIC_CROSSKV_INT8",
                 "VACNIC_SELFKV_FP8", "VACNIC_SELFKV_INT8"):
        monkeypatch.delenv(knob, raising=False)
    monkeypatch.setattr(DF, "_plan_regime_warned", False)
    with caplog.at_level(logging.WARNING, logger="vacnic_tpu.infer.decode_fast"):
        DF.choose_plan(160, 32, 64, 4096)
    assert not [r for r in caplog.records if "regime" in r.message]

    # a knob flip off the measured basis -> exactly one warning naming it
    monkeypatch.setenv("VACNIC_BEAM_TOPK", "plain")
    monkeypatch.setattr(DF, "_plan_regime_warned", False)
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="vacnic_tpu.infer.decode_fast"):
        DF.choose_plan(160, 32, 64, 4096)
        DF.choose_plan(320, 64, 64, 4096)  # warn-once: second call silent
    warns = [r for r in caplog.records if "beam_topk" in r.getMessage()]
    assert len(warns) == 1, [r.getMessage() for r in caplog.records]


def test_shadow_auto_disable_restores_nffn(monkeypatch):
    """When the DEFAULT shadow plan fails the geometry check, the shadow-only
    n_ffn=1 override must revert to the plain default (a non-shadow plan
    with full-width fc windows at the 121 MB cap is an unmeasured VMEM
    regime — review finding)."""
    from vacnic_tpu.infer import decode_fast as DF

    for k in ("VACNIC_PLAN_FFNSHADOW", "VACNIC_PLAN_NFFN", "VACNIC_PLAN_VMEM"):
        monkeypatch.delenv(k, raising=False)
    # violating geometry: n_cross/n_self = 4 > 2 -> x1 dependency fails
    monkeypatch.setenv("VACNIC_PLAN_NSELF", "2")
    monkeypatch.setenv("VACNIC_PLAN_NCROSS", "8")
    plan = DF.choose_plan(320, 64, 64, 4096)
    assert plan.ffn_shadow == 0
    assert plan.n_ffn == 2  # restored, not the shadow-only 1
    # default geometry: shadow on with n_ffn=1 + vmem 127
    monkeypatch.delenv("VACNIC_PLAN_NSELF")
    monkeypatch.delenv("VACNIC_PLAN_NCROSS")
    plan = DF.choose_plan(1280, 256, 64, 4096)
    assert plan.ffn_shadow == 1 and plan.n_ffn == 1 and plan.vmem_mb == 127
