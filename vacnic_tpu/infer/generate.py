"""Generation entry points: encoder-once + KV-cached jitted beam search.

Mirrors the reference decode path (gen_caption_from_loader_bart*,
train...match.py:480-559; utils/test_mmbart_clip_ddp.py:758-1001): the
encoder consumes the multimodal kwargs once, then the decoder steps under
beam search with cached KV. Unlike the reference's per-step Python loop
through HF `generate`, the whole search compiles to a single XLA program.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from vacnic_tpu.core.config import BartConfig, DecodeConfig, FusionConfig
from vacnic_tpu.models import bart as B
from vacnic_tpu.models import fusion as F
from vacnic_tpu.infer.beam_search import beam_search, flatten_beam_dim


def _expand_to_beams(x: jax.Array, k: int) -> jax.Array:
    """[B, ...] → [B*K, ...] (HF `_expand_inputs_for_generation`)."""
    return jnp.repeat(x, k, axis=0)


def _env_fingerprint() -> tuple:
    """Snapshot of every env knob the decode trace reads (VACNIC_*, ENC_*).

    The knobs are consulted at TRACE time inside jitted generate paths, so
    without this in the jit cache key an in-process flip (an A/B sweep)
    would silently reuse the previously compiled arm (ADVICE r3 #2). Passed
    as a static argument: a changed knob forces a retrace."""
    import os

    return tuple(sorted(
        (k, v) for k, v in os.environ.items()
        if k.startswith("VACNIC_") or k.startswith("ENC_")))


def _decode_from_encoder(
    params, enc_hidden, attention_mask, cfg: BartConfig, dcfg: DecodeConfig, dtype,
    decode_plan=None,
):
    import os

    from vacnic_tpu.infer import decode_fast as DF
    from vacnic_tpu.models.layers import expand_mask

    bsz = enc_hidden.shape[0]
    k = dcfg.num_beams

    # fused Pallas decode-stack kernel (kernels/decode_layer): default ON for
    # accelerator backends (on-chip parity: argmax agreement 1.0000, beam
    # tokens identical — tests/test_decode_kernel.py); opt out with
    # VACNIC_PALLAS_DECODE=0. On CPU the kernel only exists in interpret mode
    # (slow), so it stays opt-in there.
    env = os.environ.get("VACNIC_PALLAS_DECODE")
    if env is None:
        use_pallas = jax.default_backend() != "cpu"
    else:
        use_pallas = env == "1"
    # the kernel needs a Mosaic-legal chunking (8-aligned row chunks holding
    # whole beam groups); shapes with no legal plan (batch 1 × beam 5, odd
    # loader tails) default to the XLA step — MEASURED at b1 beam-5 the
    # padded-beam-group kernel path reads 8.7 cps vs 11.0 for the XLA step
    # (scripts/logs_r3/batch26.log: bk=8 rows leave the kernel overhead-bound
    # and the 5→8 padding adds 60% dead compute). VACNIC_PAD_BEAMGROUPS=1
    # opts back into the padded kernel path (kp rows per item, the dummies
    # sliced off before the beam logic).
    kp = k
    if use_pallas and not DF.pallas_plan_exists(bsz, k):
        kp_cand = (DF.padded_beams(bsz, k)
                   if os.environ.get("VACNIC_PAD_BEAMGROUPS") == "1" else None)
        if kp_cand is None:
            use_pallas = False
        else:
            kp = kp_cand
    # kernel path: T must split into n_t whole chunks (any multiple of 4
    # works since the decode_stack T-assert relaxation); 16 stays the
    # proven default, 4 pads max_length 50 to T=52 instead of 64 (−19%
    # self-cache HBM — the b512 unlock)
    pad_to = (int(os.environ.get("VACNIC_CACHE_PAD_PALLAS", 16)) if use_pallas
              else int(os.environ.get("VACNIC_CACHE_PAD", 1)))
    plan = None
    if use_pallas:
        if decode_plan is not None:
            plan = decode_plan
        else:
            t_max = -(-dcfg.max_length // pad_to) * pad_to
            ffn_cols = params["decoder"]["layers"][0]["fc1"]["kernel"].shape[1]
            plan = DF.choose_plan(bsz * kp, bsz, t_max, ffn_cols)
    # the padded-vocab LM head duplicate (~104 MB bf16) is only materialized
    # when the in-kernel LM head is actually selected
    dp = DF.build_decode_params(params, dtype,
                                with_lm_head=plan is not None and plan.n_lm > 0)
    # int8 cross-KV (kernel path only): halves the decode-step HBM floor
    # (model step 11.08 → 9.23 ms at b128). DEFAULT ON for the kernel path;
    # VACNIC_CROSSKV_INT8=0 opts out. Quality posture (r3, documented in
    # PARITY.md): the random-weight proxy gate reads 0.748 token agreement
    # vs bf16 with max|dscore| < 0.001 — but the CONTROL (bf16 vs f32, the
    # precision this path has always used) reads 0.796 on the same proxy:
    # random-init logits are near-degenerate and the proxy saturates, so
    # int8 adds no more token instability than the accepted bf16 default.
    # Final word needs real weights (env-blocked; converter + eval ready).
    # (CPU default off: the interpret-mode path exists for exact parity
    # tests against the XLA step)
    int8_default = "1" if jax.default_backend() != "cpu" else "0"
    cross_int8 = use_pallas and os.environ.get("VACNIC_CROSSKV_INT8",
                                               int8_default) == "1"
    # fp8 (e4m3) SELF cache (kernel path only, opt-in VACNIC_SELFKV_FP8=1):
    # halves the other big per-step fetch. No scale machinery (the kernel
    # clamps to ±448 on store); requires bkc % 32 == 0 ((32,128) fp8 tiling)
    # which choose_plan enforces when the knob is set.
    fp8_sub = 8 if os.environ.get("VACNIC_FP8_SUB8") == "1" else 32
    self_fp8 = (use_pallas and plan is not None
                and os.environ.get("VACNIC_SELFKV_FP8") == "1"
                and (bsz * kp) % (plan.n_self * fp8_sub) == 0)
    # int8 SELF cache (kernel path, opt-in VACNIC_SELFKV_INT8=1): halves the
    # self-cache fetch term (~2 GB/step at b256) with per-(L, t, row, H)
    # scales quantized at the row write. Unlike fp8, int8 converts NATIVELY on v5e
    # (r4 dtype ladder: int8 fetches ~840 GB/s); the v2 gather formulation
    # is excluded (decode_stack asserts — measured-slower inventory).
    int8_sub = 8 if os.environ.get("VACNIC_INT8_SUB8") == "1" else 32
    self_int8 = (use_pallas and plan is not None and not self_fp8
                 and not plan.gather_v2
                 and os.environ.get("VACNIC_SELFKV_INT8") == "1"
                 and (bsz * kp) % (plan.n_self * int8_sub) == 0)
    # cross K/V stays at batch level (beam-invariant); only q sees the beams
    cache = DF.build_decode_cache(params, enc_hidden, kp, dcfg.max_length, cfg, dtype,
                                  pad_to=pad_to, time_major=use_pallas,
                                  cross_kv_int8=cross_int8,
                                  self_kv_fp8=self_fp8,
                                  self_kv_int8=self_int8)
    enc_bias = expand_mask(attention_mask, 1)  # [B, 1, 1, S]

    if use_pallas and kp != k:
        # padded beam groups: expand tok rows k→kp per item for the kernel,
        # slice the dummy rows' logits off before the beam logic
        def step_fn(tok, cache, pos):
            tok8 = jnp.pad(tok.reshape(bsz, k), ((0, 0), (0, kp - k))
                           ).reshape(bsz * kp, 1)
            logits8, cache = DF.decode_step_pallas(dp, params, cache, tok8, pos,
                                                   enc_bias, cfg, dtype, plan=plan)
            logits = logits8.reshape(bsz, kp, -1)[:, :k].reshape(bsz * k, -1)
            return logits, cache
    elif use_pallas:
        def step_fn(tok, cache, pos):
            return DF.decode_step_pallas(dp, params, cache, tok, pos, enc_bias,
                                         cfg, dtype, plan=plan)
    else:
        def step_fn(tok, cache, pos):
            return DF.decode_step(dp, params, cache, tok, pos, enc_bias, cfg, dtype)

    # fused LM-stats head (kernels/lm_stats): computes the beam shortlist's
    # per-row top-C and logsumexp inside the LM matmul's epilogue, removing
    # the two full-width [BK, 50k] passes from the beam logic. Opt-in until
    # measured on chip (VACNIC_LM_STATS=1); shortlist-path only, exclusive
    # with the in-kernel LM head.
    step_stats_fn = None
    from vacnic_tpu.infer.beam_search import shortlist_c_width
    shortlist_c = shortlist_c_width(k)
    if os.environ.get("VACNIC_LM_STATS") == "1":
        from vacnic_tpu.kernels.lm_stats import VBLOCK

        from vacnic_tpu.infer.beam_search import resolve_cand_mode

        vp = -(-params["shared"]["weight"].shape[0] // 4096) * 4096
        eligible = (use_pallas and kp == k and plan is not None
                    and plan.n_lm == 0 and shortlist_c <= vp // VBLOCK
                    and resolve_cand_mode(
                        dcfg, params["shared"]["weight"].shape[0])
                    == "shortlist")
        if eligible:
            dp = DF.ensure_lm_head(dp, params, dtype)

            def step_stats_fn(tok, cache, pos):
                return DF.decode_step_pallas_stats(
                    dp, params, cache, tok, pos, enc_bias, cfg, dtype,
                    plan=plan, shortlist_c=shortlist_c)
        else:
            # say so: a bench with VACNIC_LM_STATS=1 but e.g. an in-kernel
            # LM plan (n_lm>0) or a forced non-shortlist beam mode would
            # otherwise silently record a knob the run never used
            import sys as _sys

            print("vacnic: VACNIC_LM_STATS=1 ignored (pallas="
                  f"{use_pallas}, padded_beams={kp != k}, "
                  f"n_lm={getattr(plan, 'n_lm', None)}, "
                  "mode!=shortlist or vocab blocks < C)", file=_sys.stderr)

    def reorder_cache_fn(cache, flat_sel):
        # Pallas path: beam select recomposes the [T, BK] ancestry matrix —
        # the raw self cache is write-once per row and never gathered.
        if cache.anc is not None:
            if kp != k:
                # map the k-space selection into the kp-padded row space;
                # dummy rows select themselves (identity)
                item = jnp.arange(bsz * k, dtype=flat_sel.dtype) // k
                sel_p = item * kp + (flat_sel - item * k)  # [b·k]
                base = jnp.arange(bsz * kp, dtype=flat_sel.dtype)
                j8 = base % kp
                gather_idx = jnp.clip(base // kp * k + j8, 0, bsz * k - 1)
                flat_sel = jnp.where(j8 < k, jnp.take(sel_p, gather_idx), base)
            return DF.reorder_anc(cache, flat_sel)
        # XLA path: stacked-layer cache, one gather per tensor on the
        # batch·beam axis; cross K/V is beam-invariant (HF `_reorder_cache`
        # reorders self only).
        return cache._replace(
            self_k=jnp.take(cache.self_k, flat_sel, axis=1),
            self_v=jnp.take(cache.self_v, flat_sel, axis=1),
        )

    return beam_search(
        step_fn,
        cache,
        bsz,
        cfg=dcfg,
        eos_token_id=cfg.eos_token_id,
        pad_token_id=cfg.pad_token_id,
        decoder_start_token_id=cfg.decoder_start_token_id,
        forced_bos_token_id=cfg.forced_bos_token_id,
        vocab_size=params["shared"]["weight"].shape[0],
        reorder_cache_fn=reorder_cache_fn,
        step_stats_fn=step_stats_fn,
    )


@partial(jax.jit, static_argnames=("cfg", "dcfg", "dtype", "env_fp"))
def _generate_text_bart_jit(
    params, input_ids, attention_mask, cfg: BartConfig, dcfg: DecodeConfig,
    dtype=jnp.float32, env_fp=(),
):
    del env_fp  # cache-key only: the trace below re-reads the env knobs
    enc = B.encoder_fwd(params, input_ids, attention_mask, cfg, dtype=dtype)
    return _decode_from_encoder(params, enc, attention_mask, cfg, dcfg, dtype)


def generate_text_bart(
    params, input_ids, attention_mask, cfg: BartConfig, dcfg: DecodeConfig, dtype=jnp.float32
):
    """Text-only BART beam generation (CoLaM-teacher-style model; parity target
    for tests/test_beam_parity.py)."""
    return _generate_text_bart_jit(params, input_ids, attention_mask, cfg, dcfg,
                                   dtype, env_fp=_env_fingerprint())


def greedy_search(params, input_ids, attention_mask, cfg: BartConfig,
                  dcfg: DecodeConfig, dtype=jnp.float32):
    """Greedy decoding (the absent `src.utils.generation_utils.greedy_search`,
    SURVEY §0.1) — beam search with num_beams=1 is exactly argmax decoding."""
    import dataclasses

    return generate_text_bart(
        params, input_ids, attention_mask, cfg,
        dataclasses.replace(dcfg, num_beams=1, length_penalty=1.0), dtype,
    )


@partial(jax.jit, static_argnames=("cfg", "dtype"))
def get_prob(params, input_ids, attention_mask, decoder_input_ids, labels,
             cfg: BartConfig, dtype=jnp.float32):
    """Per-sequence log-probability of `labels` under teacher forcing (the
    absent `generation_utils.get_prob`): sum of token logprobs, pad-masked."""
    out = B.bart_forward(params, input_ids, attention_mask, decoder_input_ids,
                         cfg, dtype=dtype)
    logp = jax.nn.log_softmax(out["logits"].astype(jnp.float32), axis=-1)
    tok_lp = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    valid = (labels != cfg.pad_token_id).astype(jnp.float32)
    return jnp.sum(tok_lp * valid, axis=-1)


@partial(jax.jit, static_argnames=("cfg", "fcfg", "dcfg", "add_ner_ffn", "dtype",
                                   "decode_plan", "env_fp"))
def _generate_mm_jit(
    params,
    input_ids,
    attention_mask,
    image_features,
    cfg: BartConfig,
    fcfg: FusionConfig,
    dcfg: DecodeConfig,
    *,
    face_features=None,
    face_mask=None,
    name_ids=None,
    name_mask=None,
    add_ner_ffn: bool = True,
    dtype=jnp.float32,
    decode_plan=None,
    env_fp=(),
):
    del env_fp  # cache-key only: the trace below re-reads the env knobs
    enc = _mm_encode(
        params, input_ids, attention_mask, image_features, cfg, fcfg,
        face_features=face_features, face_mask=face_mask,
        name_ids=name_ids, name_mask=name_mask, add_ner_ffn=add_ner_ffn,
        dtype=dtype,
    )
    return _decode_from_encoder(params, enc["last_hidden"], attention_mask, cfg,
                                dcfg, dtype, decode_plan=decode_plan)


def generate_mm(
    params,
    input_ids,
    attention_mask,
    image_features,
    cfg: BartConfig,
    fcfg: FusionConfig,
    dcfg: DecodeConfig,
    **kw,
):
    """Multimodal caption generation — `model.generate(...)` equivalent
    (train...match.py:513-520 call signature). `decode_plan` overrides the
    auto ChunkPlan for the fused decode kernel (static; hashable NamedTuple).
    Jitted with the VACNIC_*/ENC_* env-knob snapshot in the cache key."""
    return _generate_mm_jit(params, input_ids, attention_mask, image_features,
                            cfg, fcfg, dcfg, env_fp=_env_fingerprint(), **kw)


def _plan_probe_key(bsz, dcfg, cfg):
    return (bsz, dcfg.num_beams, dcfg.max_length, cfg.d_model)


_LM_PLAN_OK: dict = {}  # probe result per shape: does the n_lm plan compile?


def generate_mm_robust(params, input_ids, attention_mask, image_features,
                       cfg, fcfg, dcfg, **kw):
    """generate_mm with the in-kernel LM head attempted first and degraded to
    the XLA head if Mosaic rejects it (VERDICT r2 #2).

    The in-kernel LM head measures faster at large batch (115.3 vs 113.1 cps
    at b128) but leaves <2 MB of VMEM-stack slack and the compiler's scoped
    -stack accounting drifts a few MB between otherwise-identical compiles —
    so n_lm>0 cannot be an unconditional default. Here: compile the full
    search with the n_lm plan once per shape; on a Mosaic VMEM/allocation
    failure fall back to n_lm=0 and remember the outcome. The successful
    executable is cached by jit, so the probe is never paid twice and a
    probe-pass can never diverge from the run (same compiled program)."""
    import os as _os

    from vacnic_tpu.infer import decode_fast as DF

    bsz, k = input_ids.shape[0], dcfg.num_beams
    # honor an explicit caller plan (generate_mm's documented override) —
    # probing would both crash on the duplicate kwarg and ignore the
    # caller's intent
    if kw.get("decode_plan") is not None:
        return generate_mm(params, input_ids, attention_mask, image_features,
                           cfg, fcfg, dcfg, **kw)
    kw.pop("decode_plan", None)
    env = _os.environ.get("VACNIC_PALLAS_DECODE")
    use_pallas = (jax.default_backend() != "cpu" if env is None else env == "1")
    if not use_pallas or not DF.pallas_plan_exists(bsz, k):
        return generate_mm(params, input_ids, attention_mask, image_features,
                           cfg, fcfg, dcfg, **kw)

    # same T padding rule as _decode_from_encoder's kernel path — an env
    # VACNIC_CACHE_PAD_PALLAS=4 (the b512 setting) must see the same t_max
    # here, or the probed plan is validated against a T that never runs
    t_pad = int(_os.environ.get("VACNIC_CACHE_PAD_PALLAS", 16))
    t_max = -(-dcfg.max_length // t_pad) * t_pad
    ffn_cols = params["decoder"]["layers"][0]["fc1"]["kernel"].shape[1]
    plan = DF.choose_plan(bsz * k, bsz, t_max, ffn_cols)
    # in-kernel LM head only when the plan (i.e. an explicit
    # VACNIC_PLAN_NLM) requests it: the r2-era "bk >= 320 measured faster"
    # auto-enable INVERTED under the r4 blockmax beam logic (paired b64:
    # XLA head 140.0 vs n_lm=32 131.7, scripts/logs_r4/bench_queue18.log),
    # so auto-probing would now actively pick the slower path. The probe
    # machinery stays: an env-requested n_lm is still compile-probed and
    # falls back on the Mosaic VMEM flake (bkc<=48 was the proven-fit
    # regime; at bkc=80 the program compiles but spills, 20.1 vs 8.0
    # ms/step r3 — a compile-probe cannot catch compile-success-but-slow).
    key = _plan_probe_key(bsz, dcfg, cfg)
    # risky plan features that can hit the Mosaic VMEM/scoped-stack flake:
    # the in-kernel LM head (<2 MB slack at bart-large) and the shadow-FFN
    # default (full-width fc windows at vmem 127). Probe once per shape and
    # degrade to the safe plan on the kernel's own rejection.
    risky = plan.n_lm > 0 or plan.ffn_shadow
    if risky and _LM_PLAN_OK.get(key, True):
        try:
            out = generate_mm(params, input_ids, attention_mask, image_features,
                              cfg, fcfg, dcfg, decode_plan=plan, **kw)
            _LM_PLAN_OK[key] = True
            return out
        except Exception as e:  # Mosaic VMEM / scoped-stack rejection
            # Only the kernel's own VMEM/scoped-stack rejection selects the
            # fallback: a whole-program HBM OOM ("memory space hbm") is not
            # the risky plan's fault — retrying the safe plan would OOM
            # again with a less informative error and poison the probe
            # cache (ADVICE r3 #4). Mosaic messages name "vmem"/"scoped"/
            # "mosaic"; XLA HBM OOMs name "hbm".
            msg = str(e).lower()
            is_plan_flake = ("hbm" not in msg and any(
                s in msg for s in ("vmem", "scoped", "mosaic")))
            if not is_plan_flake:
                raise
            _LM_PLAN_OK[key] = False
            import sys as _sys

            print(f"generate_mm_robust: risky decode plan rejected "
                  f"({type(e).__name__}); falling back to the safe plan "
                  f"(XLA LM head, dedicated FFN phases)", file=_sys.stderr)
    if not risky:
        # nothing to degrade: run the plan exactly as chosen (an explicit
        # env sweep like VACNIC_PLAN_VMEM=127 must not be silently clamped
        # — review finding)
        return generate_mm(params, input_ids, attention_mask, image_features,
                           cfg, fcfg, dcfg, decode_plan=plan, **kw)
    # fallback: undo ONLY the risky features. Explicit env overrides are
    # preserved (a VACNIC_PLAN_NFFN=4 b512 sweep must not retry at the
    # n_ffn=2 window size measured to OOM there); the shadow default's
    # n_ffn=1 / vmem=127 side effects are reverted to the plain defaults.
    env_nffn = "VACNIC_PLAN_NFFN" in _os.environ
    env_vmem = "VACNIC_PLAN_VMEM" in _os.environ
    safe_nffn = plan.n_ffn
    if plan.ffn_shadow and not env_nffn:
        safe_nffn = 2 if ffn_cols % 2 == 0 else 1
    from vacnic_tpu.kernels.decode_layer import ChunkPlan as _CP

    safe_vmem = plan.vmem_mb
    if plan.ffn_shadow and not env_vmem:
        safe_vmem = _CP._field_defaults["vmem_mb"]
    safe = plan._replace(n_lm=0, ffn_shadow=0, n_ffn=safe_nffn,
                         vmem_mb=safe_vmem)
    return generate_mm(params, input_ids, attention_mask, image_features,
                       cfg, fcfg, dcfg, decode_plan=safe, **kw)


def _mm_encode(params, input_ids, attention_mask, image_features, cfg, fcfg,
               *, face_features, face_mask, name_ids, name_mask, add_ner_ffn,
               dtype):
    """Encoder forward with the fused-Pallas gating shared by the single-chip
    and sharded generate paths (the sharded body previously ran the XLA
    encoder unconditionally — ADVICE r2 #1).

    Fused Pallas encoder stack (kernels/encoder_stack): default ON for
    accelerator backends on eligible configs — measured 90.1 ms vs
    105.8-109.2 XLA at batch 32 and 121.1 vs 112-115 cps end-to-end at
    batch 128; VACNIC_PALLAS_ENCODER=0 opts out. Parity pinned in
    tests/test_encoder_stack.py (exact at f32; bf16-tolerance on chip)."""
    import os as _os

    enc_env = _os.environ.get("VACNIC_PALLAS_ENCODER")
    use_fused_enc = (jax.default_backend() != "cpu" if enc_env is None
                     else enc_env == "1")
    fwd = (F.mm_encoder_fwd_fused
           if use_fused_enc and F.fused_encoder_eligible(fcfg, cfg, add_ner_ffn, None)
           else F.mm_encoder_fwd)
    return fwd(
        params, input_ids, attention_mask, image_features, cfg, fcfg,
        face_features=face_features, face_mask=face_mask,
        name_ids=name_ids, name_mask=name_mask, add_ner_ffn=add_ner_ffn,
        dtype=dtype,
    )


def generate_mm_sharded(
    mesh,
    params,
    input_ids,
    attention_mask,
    image_features,
    cfg: BartConfig,
    fcfg: FusionConfig,
    dcfg: DecodeConfig,
    *,
    face_features=None,
    face_mask=None,
    name_ids=None,
    name_mask=None,
    add_ner_ffn: bool = True,
    dtype=jnp.float32,
    data_axis: str = "data",
):
    """Multi-chip beam decode: shard_map over the mesh's data axis.

    Decoding is embarrassingly parallel over the batch (the reference's DDP
    inference, utils/test_mmbart_clip_ddp.py:1078-1079, splits the test set
    per rank the same way). The plain `generate_mm` under jit auto-shards the
    XLA path, but the fused Pallas decode kernel (VACNIC_PALLAS_DECODE=1) is
    a per-chip program — shard_map makes each chip run the whole search on
    its batch shard with replicated params, no cross-chip traffic after the
    batch scatter. The data-axis size must divide the batch."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map as _smap  # jax >= 0.7 top-level export

        def smap(f, in_specs, out_specs):
            return _smap(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                         check_vma=False)
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as _smap_old

        def smap(f, in_specs, out_specs):
            return _smap_old(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_rep=False)

    b = P(data_axis)
    r = P()

    def body(params, input_ids, attention_mask, image_features,
             face_features, face_mask, name_ids, name_mask):
        # same fused-encoder gating as the single-chip path, so --sharded
        # keeps the kernel speedup and identical numerics per shard
        enc = _mm_encode(
            params, input_ids, attention_mask, image_features, cfg, fcfg,
            face_features=face_features, face_mask=face_mask,
            name_ids=name_ids, name_mask=name_mask,
            add_ner_ffn=add_ner_ffn, dtype=dtype,
        )
        return _decode_from_encoder(params, enc["last_hidden"], attention_mask,
                                    cfg, dcfg, dtype)

    mm = (face_features, face_mask, name_ids, name_mask)
    in_specs = (r, b, b, b) + tuple(r if x is None else b for x in mm)
    # fresh jit-of-shard_map objects miss jax's identity-keyed cache, so a
    # per-call construction would re-trace + remote-compile the whole search
    # every batch — cache the compiled fn on the static configuration
    key = (mesh, cfg, fcfg, dcfg, add_ner_ffn, jnp.dtype(dtype).name,
           data_axis, tuple(x is None for x in mm), _env_fingerprint())
    fn = _SHARDED_FNS.get(key)
    if fn is None:
        fn = jax.jit(smap(body, in_specs=in_specs, out_specs=(b, b)))
        # bounded LRU: compiled shard_map programs hold Mesh + executable
        # references; evict the oldest past a small cap (ADVICE r2 #3)
        while len(_SHARDED_FNS) >= _SHARDED_FNS_MAX:
            _SHARDED_FNS.pop(next(iter(_SHARDED_FNS)))
        _SHARDED_FNS[key] = fn
    else:
        _SHARDED_FNS[key] = _SHARDED_FNS.pop(key)  # refresh LRU order
    return fn(params, input_ids, attention_mask, image_features, *mm)


_SHARDED_FNS: dict = {}
_SHARDED_FNS_MAX = 8
