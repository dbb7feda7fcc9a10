"""Fast decode path: the per-step decoder specialized for generation.

The general models/bart.decoder_fwd is built for training readability; at
decode time its step is bandwidth-catastrophic on TPU:

  * cross-attention K/V were expanded across beams — 5× redundant HBM traffic
    (the KV is identical for all beams of a batch item);
  * K/V cached as [..., S, head_dim=64] — the TPU (8,128) tile pads the
    64-wide last dim to 128, doubling every cache read (observed "2.0x
    expansion" in XLA's allocation dump);
  * 24 separate per-layer cache gathers per beam reorder and 3 separate
    q/k/v matmuls per layer.

This module restructures the step for the hardware:

  * cross K/V stored once per batch item as [L, B, S, D] (D = H·hd = 1024,
    lane-aligned); beams enter via a reshape of q — per-step cross reads drop
    from ~8 GB to ~0.8 GB for batch 32 / beam 5 / S 512;
  * self cache as [L, B·K, T, D] (lane-aligned, no tile padding), ONE gather
    per tensor on beam reorder;
  * fused [d, 3d] QKV matmul; `lax.scan` over stacked layers; LM head on
    [B·K, d].

Numerics are identical to the reference path (tests/test_decode_fast.py pins
per-step logits against models/bart.decoder_fwd).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import os

import jax
import jax.numpy as jnp

from vacnic_tpu.core.config import BartConfig
from vacnic_tpu.models.bart import POS_OFFSET
from vacnic_tpu.models.layers import ACT2FN, Params, layernorm


class DecodeParams(NamedTuple):
    """Stacked per-layer decoder weights [n_layers, ...]."""

    w_qkv: jax.Array  # [L, d, 3d]
    b_qkv: jax.Array  # [L, 3d]
    w_self_out: jax.Array  # [L, d, d]
    b_self_out: jax.Array  # [L, d]
    ln_self: jax.Array  # [L, 2, d] (scale, bias)
    w_cross_q: jax.Array  # [L, d, d]
    b_cross_q: jax.Array  # [L, d]
    w_cross_out: jax.Array  # [L, d, d]
    b_cross_out: jax.Array  # [L, d]
    ln_cross: jax.Array  # [L, 2, d]
    w_fc1: jax.Array  # [L, d, ffn]
    b_fc1: jax.Array  # [L, ffn]
    w_fc2: jax.Array  # [L, ffn, d]
    b_fc2: jax.Array  # [L, d]
    ln_final: jax.Array  # [L, 2, d]
    # tied LM head with the vocab padded to a 4096 multiple (so the kernel's
    # vocab chunks stay 128-lane aligned for n_lm up to 32); pad bias entries
    # are -1e9 so a padded id can never win top-k even unsliced. None unless
    # the in-kernel LM head is selected (plan.n_lm > 0): the padded duplicate
    # of the tied embedding is ~104 MB bf16 of otherwise-dead HBM.
    w_lm: jax.Array | None  # [Vp, d]
    b_lm: jax.Array | None  # [1, Vp] f32


class DecodeCache(NamedTuple):
    # XLA path: [L, B·K, T, D]; Pallas path (time_major): [L, T, B·K, D].
    self_k: jax.Array
    self_v: jax.Array
    # Cross K/V in [L, B, H, hd, S]: both attention contractions (over hd for
    # scores, over S for values) hit the native (sublane, lane) = (hd, S) tile
    # with zero padding — the [..., S, hd=64] layout pads 2× and forces a
    # relayout copy per layer per step.
    cross_k: jax.Array  # [L, B, H, hd, S] — beam-invariant, never reordered
    cross_v: jax.Array  # [L, B, H, hd, S]
    # Pallas path: the self cache is NEVER gathered on beam select. Each step
    # writes its new K/V row at time `pos` in its OWN row slot; `anc[t, c]`
    # records which physical row holds beam c's step-t entry, and the kernel
    # beam-aligns rows on the fly (kernels/decode_layer). Replaces a
    # ~1 GB/step HBM gather with a [T, BK] int32 recompose.
    anc: jax.Array | None = None  # [T, B·K] int32 ancestry matrix
    pos: jax.Array | None = None  # scalar int32 — last written time row
    # int8 cross-KV (kernel path): per-(L, B, H, hd) symmetric scales. The
    # cross cache is the decode-step HBM floor (~3.2 GB/step at b128);
    # int8 halves it. Scales fold into q (K side) and the head output
    # (V side) — zero extra matmul cost (kernels/decode_layer._cross_attn).
    cross_k_scale: jax.Array | None = None  # [L, B, H, hd] f32
    cross_v_scale: jax.Array | None = None  # [L, B, H, hd] f32
    # int8 SELF cache (kernel path): per-(L, t, ROW, H) symmetric scales,
    # one per written cache row. A cache row is a write-once physical slot,
    # so per-row scales are still ANCESTRY-INVARIANT: beam reorders
    # recompose only the ancestry matrix, never the scales — the kernel
    # beam-aligns the scales with the SAME chunk-local one-hot matmul it
    # uses for the K/V rows (an exact selection in f32). Per-row replaced
    # the original per-(L, t, H) group scale after that granularity failed
    # the trained quality gate (0.9115 < control 0.9583, queue20).
    # K scale multiplies the score block, V scale folds into the softmax
    # probabilities before the value sum (kernels/decode_layer._kernel).
    self_k_scale: jax.Array | None = None  # [L, T, BK, H] f32
    self_v_scale: jax.Array | None = None  # [L, T, BK, H] f32


def pallas_plan_exists(b: int, beams: int) -> bool:
    """True iff the auto ChunkPlan can chunk batch·beams legally for Mosaic:
    some row-chunk count n with whole batch items per chunk (b % n == 0,
    which also keeps beam groups whole) and 8-aligned chunk rows. On CPU the
    kernel runs in interpret mode with no Mosaic constraints."""
    if jax.default_backend() == "cpu":
        return True
    bk = b * beams
    return any(b % n == 0 and (bk // n) % 8 == 0
               for n in (max(1, bk // 40), 8, 4, 2, 1))


def padded_beams(b: int, beams: int) -> int | None:
    """Beam-group row padding that makes the fused kernel legal for small /
    odd shapes (e.g. batch 1 × beam 5 → groups of 8): the smallest kp >= k
    with a legal plan. The dummy rows decode garbage that is sliced off
    before the beam logic and never selected by the ancestry. MEASURED at
    b1 beam-5 this path LOSES to the XLA step (8.7 vs 11.0 cps,
    scripts/logs_r3/batch26.log) — bk=8 rows are overhead-bound and the 5→8
    pad is 60% dead compute — so it is opt-in (VACNIC_PAD_BEAMGROUPS=1).
    None if no padding helps."""
    kp8 = -(-beams // 8) * 8
    for kp in (kp8, kp8 + 8):
        if kp > beams and pallas_plan_exists(b, kp):
            return kp
    return None


def reorder_anc(cache: DecodeCache, flat_sel: jax.Array) -> DecodeCache:
    """Beam 'reorder' for the pallas path: compose the ancestry with the beam
    selection instead of gathering cache data. Rows after `pos` reset to
    identity so the next step's row write (row r holds beam r's new K/V)
    composes correctly on the following select."""
    t_len, bk = cache.anc.shape
    anc = jnp.take(cache.anc, flat_sel, axis=1)
    t_ids = jnp.arange(t_len)[:, None]
    anc = jnp.where(t_ids <= cache.pos, anc, jnp.arange(bk, dtype=anc.dtype)[None, :])
    return cache._replace(anc=anc)


def _stack(layers, *path):
    def leaf(p):
        x = p
        for key in path:
            x = x[key]
        return x

    return jnp.stack([leaf(p) for p in layers])


def build_lm_head(params: Params, dtype=jnp.bfloat16) -> tuple[jax.Array, jax.Array]:
    """Vocab-padded tied LM head for the in-kernel LM variant (ChunkPlan.n_lm)."""
    w_shared = params["shared"]["weight"]
    v, d_model = w_shared.shape
    # pad so vp/n_lm stays 128-lane-divisible for any n_lm in {8, 16, 32}
    vp = -(-v // 4096) * 4096
    w_lm = jnp.zeros((vp, d_model), dtype).at[:v].set(w_shared.astype(dtype))
    b_lm = jnp.full((1, vp), -1e9, jnp.float32).at[0, :v].set(
        params["final_logits_bias"].astype(jnp.float32))
    return w_lm, b_lm


def ensure_lm_head(dp: "DecodeParams", params: Params,
                   dtype=jnp.bfloat16) -> "DecodeParams":
    """dp with w_lm/b_lm materialized (lazy — the ~104 MB padded duplicate
    is only built when an LM-consuming path is actually selected)."""
    if dp.w_lm is None:
        dp = dp._replace(**dict(zip(("w_lm", "b_lm"),
                                    build_lm_head(params, dtype))))
    return dp


def build_decode_params(params: Params, dtype=jnp.bfloat16,
                        with_lm_head: bool = True) -> DecodeParams:
    layers = params["decoder"]["layers"]

    def ln(name):
        return jnp.stack(
            [jnp.stack([p[name]["scale"], p[name]["bias"]]) for p in layers]
        ).astype(jnp.float32)

    w_qkv = jnp.concatenate(
        [
            _stack(layers, "self_attn", "q_proj", "kernel"),
            _stack(layers, "self_attn", "k_proj", "kernel"),
            _stack(layers, "self_attn", "v_proj", "kernel"),
        ],
        axis=-1,
    ).astype(dtype)
    b_qkv = jnp.concatenate(
        [
            _stack(layers, "self_attn", "q_proj", "bias"),
            _stack(layers, "self_attn", "k_proj", "bias"),
            _stack(layers, "self_attn", "v_proj", "bias"),
        ],
        axis=-1,
    ).astype(jnp.float32)
    w_lm, b_lm = build_lm_head(params, dtype) if with_lm_head else (None, None)
    return DecodeParams(
        w_qkv=w_qkv,
        b_qkv=b_qkv,
        w_self_out=_stack(layers, "self_attn", "out_proj", "kernel").astype(dtype),
        b_self_out=_stack(layers, "self_attn", "out_proj", "bias").astype(jnp.float32),
        ln_self=ln("self_attn_layer_norm"),
        w_cross_q=_stack(layers, "encoder_attn", "q_proj", "kernel").astype(dtype),
        b_cross_q=_stack(layers, "encoder_attn", "q_proj", "bias").astype(jnp.float32),
        w_cross_out=_stack(layers, "encoder_attn", "out_proj", "kernel").astype(dtype),
        b_cross_out=_stack(layers, "encoder_attn", "out_proj", "bias").astype(jnp.float32),
        ln_cross=ln("encoder_attn_layer_norm"),
        w_fc1=_stack(layers, "fc1", "kernel").astype(dtype),
        b_fc1=_stack(layers, "fc1", "bias").astype(jnp.float32),
        w_fc2=_stack(layers, "fc2", "kernel").astype(dtype),
        b_fc2=_stack(layers, "fc2", "bias").astype(jnp.float32),
        ln_final=ln("final_layer_norm"),
        w_lm=w_lm,
        b_lm=b_lm,
    )


def build_decode_cache(
    params: Params,
    enc_out: jax.Array,  # [B, S, d] — NOT beam-expanded
    num_beams: int,
    max_len: int,
    cfg: BartConfig,
    dtype=jnp.bfloat16,
    pad_to: int = 1,
    time_major: bool = False,
    cross_kv_int8: bool = False,
    self_kv_fp8: bool = False,
    self_kv_int8: bool = False,
) -> DecodeCache:
    """Cross K/V computed once per batch item; self cache zero-initialized at
    batch·beams. `pad_to=16` rounds the T dim up to the bf16 sublane tile
    (required by the fused Pallas decode kernel; attention masks t<=pos, so
    padding rows are inert). `time_major=True` lays the self cache out
    [L, T, B·K, D] and attaches the identity ancestry matrix (pallas path).
    `cross_kv_int8=True` stores cross K/V as int8 with per-(L, B, H, hd)
    symmetric scales (kernel path only — halves the per-step HBM floor).
    `self_kv_fp8=True` stores the SELF cache as float8_e4m3fn (kernel path
    only — halves the other big per-step fetch; no scale machinery, the
    kernel clamps to ±448 on store since the e4m3 cast overflows to NaN —
    MEASURED NEGATIVE on v5e, the fp8→bf16 convert is emulated; kept for
    fp8-native generations). `self_kv_int8=True` stores the self cache as
    int8 with per-(L, t, row, H) scales quantized at the row write
    (quantize_self_rows) — int8 converts NATIVELY on v5e (the r4 dtype
    ladder measured int8 fetches at ~840 GB/s), so this halves the
    self-cache fetch term without fp8's conversion tax."""
    assert not (self_kv_fp8 and self_kv_int8)
    layers = params["decoder"]["layers"]
    b, s, d = enc_out.shape
    max_len = -(-max_len // pad_to) * pad_to

    wk = _stack(layers, "encoder_attn", "k_proj", "kernel").astype(dtype)  # [L, d, d]
    bk = _stack(layers, "encoder_attn", "k_proj", "bias").astype(jnp.float32)
    wv = _stack(layers, "encoder_attn", "v_proj", "kernel").astype(dtype)
    bv = _stack(layers, "encoder_attn", "v_proj", "bias").astype(jnp.float32)

    h = cfg.decoder_attention_heads
    hd = cfg.decoder_head_dim

    def project(w, bias):
        # per-layer lax.map: the single "bsd,lde->lbse" einsum materializes
        # a full [L, B, S, D] f32 intermediate — 12.9 GB at b512, THE HBM
        # wall that OOM'd the b512 bench (18.12G > 16G, queues 10/11); the
        # map keeps one layer's [B, S, D] f32 (~1.1 GB) live at a time
        def one(args):
            wl, bl = args
            x = (jnp.einsum("bsd,de->bse", enc_out.astype(dtype), wl,
                            preferred_element_type=jnp.float32)
                 + bl[None, None, :])
            x = x.astype(dtype).reshape(b, s, h, hd)
            return x.transpose(0, 2, 3, 1)  # [B, H, hd, S]

        return jax.lax.map(one, (w, bias))  # [L, B, H, hd, S]

    n_layers = len(layers)
    bkt = b * num_beams
    shape = ((n_layers, max_len, bkt, d) if time_major
             else (n_layers, bkt, max_len, d))
    ck_scale = cv_scale = None
    if cross_kv_int8:
        # quantize inside the per-layer map too: quantize_cross_kv's f32
        # upcast of the full [L, B, H, hd, S] would re-create the 12.9 GB
        # peak the chunked projection just removed
        def project_q(w, bias):
            def one(args):
                wl, bl = args
                x = (jnp.einsum("bsd,de->bse", enc_out.astype(dtype), wl,
                                preferred_element_type=jnp.float32)
                     + bl[None, None, :])
                x = x.astype(dtype).reshape(b, s, h, hd).transpose(0, 2, 3, 1)
                return quantize_cross_kv(x)

            return jax.lax.map(one, (w, bias))

        cross_k, ck_scale = project_q(wk, bk)
        cross_v, cv_scale = project_q(wv, bv)
    else:
        cross_k, cross_v = project(wk, bk), project(wv, bv)
    if not cross_kv_int8 and os.environ.get("VACNIC_CROSSKV_INT8_SIM") == "1":
        # quality-gate instrument (scripts/gate_crosskv_int8_cpu.py): apply
        # the kernel's int8 quantization as quantize->dequantize so the XLA
        # decode path (CPU-runnable) carries the same — slightly MORE, since
        # the dequant re-rounds to `dtype` — quantization error as the
        # kernel's folded-scale int8 math. Never active with cross_kv_int8.
        qk, sk = quantize_cross_kv(cross_k)
        qv, sv = quantize_cross_kv(cross_v)
        cross_k = (qk.astype(jnp.float32) * sk[..., None]).astype(dtype)
        cross_v = (qv.astype(jnp.float32) * sv[..., None]).astype(dtype)
    self_dtype = (jnp.float8_e4m3fn if self_kv_fp8
                  else jnp.int8 if self_kv_int8 else dtype)
    # per-row self scales: zero-init is safe — every row t < pos is written
    # (with its scale) before any step reads it, and rows >= pos are masked
    sk_scale = sv_scale = None
    if self_kv_int8:
        sk_scale = jnp.zeros((n_layers, max_len, bkt, h), jnp.float32)
        sv_scale = jnp.zeros((n_layers, max_len, bkt, h), jnp.float32)
    return DecodeCache(
        self_k=jnp.zeros(shape, self_dtype),
        self_v=jnp.zeros(shape, self_dtype),
        cross_k=cross_k,
        cross_v=cross_v,
        anc=(jnp.broadcast_to(jnp.arange(bkt, dtype=jnp.int32)[None, :],
                              (max_len, bkt)) if time_major else None),
        pos=jnp.int32(0) if time_major else None,
        cross_k_scale=ck_scale,
        cross_v_scale=cv_scale,
        self_k_scale=sk_scale,
        self_v_scale=sv_scale,
    )


def quantize_cross_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[L, B, H, hd, S] → (int8 values, f32 scales [L, B, H, hd]).

    Symmetric per-(layer, batch, head, channel) quantization over the S axis.
    Channel-wise (hd) scales are FREE in the kernel: the score contraction is
    over hd, so K's scale folds into q before the matmul; the value
    contraction is over S, so V's scale folds into the head output after."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 127.0  # [L, B, H, hd]
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_self_rows(rows: jax.Array, n_heads: int
                       ) -> tuple[jax.Array, jax.Array]:
    """[L, BK, D] new self K (or V) rows → (int8 [L, BK, D], f32 [L, BK, H]).

    Symmetric per-(layer, ROW, head) quantization over the hd channels.
    Scales are still ancestry-invariant — a cache row is a write-once
    physical slot, and its scale travels with it (the kernel gathers scales
    through the same chunk-local one-hot as the K/V rows). Per-row scales
    replaced the original per-(layer, head) group scale (shared across all
    B·K rows AND hd channels) after that granularity failed the trained
    quality gate (token agreement 0.9115 < control 0.9583 — CLAUDE.md
    queue20). Runs in XLA at the cache-row write (~16 MB/step at b256 —
    noise), so the kernel's output rows stay full precision for the in-step
    mask-merge."""
    lr, bk, d = rows.shape
    hd = d // n_heads
    xf = rows.astype(jnp.float32).reshape(lr, bk, n_heads, hd)
    scale = jnp.max(jnp.abs(xf), axis=3) / 127.0  # [L, BK, H]
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127)
    return q.astype(jnp.int8).reshape(lr, bk, d), scale


def _ln(p: jax.Array, x: jax.Array) -> jax.Array:
    return layernorm({"scale": p[0], "bias": p[1]}, x)


def decode_step(
    dp: DecodeParams,
    params: Params,
    cache: DecodeCache,
    tok: jax.Array,  # [B·K, 1] int32
    pos: jax.Array,  # scalar position index
    enc_mask_bias: jax.Array,  # additive [B, 1, 1, S]
    cfg: BartConfig,
    dtype=jnp.bfloat16,
) -> tuple[jax.Array, DecodeCache]:
    """One decoder step over all layers → (logits [B·K, V], new cache)."""
    h_heads = cfg.decoder_attention_heads
    hd = cfg.decoder_head_dim
    d = cfg.d_model
    act = ACT2FN[cfg.activation_function]
    bk_total = tok.shape[0]
    batch = cache.cross_k.shape[1]
    k_beams = bk_total // batch
    T_max = cache.self_k.shape[2]

    dec = params["decoder"]
    x = jnp.take(params["shared"]["weight"], tok[:, 0], axis=0).astype(dtype)
    scale = float(d) ** 0.5 if cfg.scale_embedding else 1.0
    x = x * scale + jnp.take(dec["embed_positions"]["weight"], pos + POS_OFFSET, axis=0).astype(dtype)
    x = layernorm(dec["layernorm_embedding"], x)  # [B·K, d]

    t_idx = jnp.arange(T_max)
    self_bias = jnp.where(t_idx <= pos, 0.0, jnp.finfo(jnp.float32).min)  # [T]
    scaling = hd**-0.5

    def layer(x, inputs):
        (w_qkv, b_qkv, w_so, b_so, ln_s, w_cq, b_cq, w_co, b_co, ln_c,
         w1, b1, w2, b2, ln_f, k_cache, v_cache, ck, cv) = inputs
        residual = x
        qkv = (jnp.dot(x, w_qkv, preferred_element_type=jnp.float32) + b_qkv).astype(dtype)
        q, k_new, v_new = jnp.split(qkv, 3, axis=-1)  # [B·K, d] each
        if os.environ.get("VACNIC_SELFKV_FP8_SIM") == "1":
            # quality-gate instrument (gate_selfkv_fp8.py): apply the fp8
            # kernel path's storage quantization (clip ±448 + e4m3
            # round-trip) to the rows the XLA path writes, so the CPU/
            # XLA-runnable gate carries the same — slightly MORE, since the
            # round-trip re-rounds to `dtype` — error as the fp8 cache.
            # NOTE: the kernel path quantizes ONCE at write and reads the
            # stored row thereafter; this sim quantizes the same write, so
            # subsequent steps read identical values.
            def _rt(v):
                return (jnp.clip(v.astype(jnp.float32), -448.0, 448.0)
                        .astype(jnp.float8_e4m3fn).astype(dtype))
            k_new, v_new = _rt(k_new), _rt(v_new)
        if os.environ.get("VACNIC_SELFKV_INT8_SIM") == "1":
            # quality-gate instrument (gate_selfkv_int8_cpu.py): apply the
            # int8 kernel path's storage quantization (per-(row, head) scale
            # over hd, quantize_self_rows) as quantize->dequantize
            # on the rows the XLA path writes — the CPU-runnable gate then
            # carries the same (slightly MORE, the dequant re-rounds to
            # `dtype`) error as the int8 cache. Write-once semantics match:
            # both paths quantize at the write and read the stored row.
            def _rt8(v):
                q, s = quantize_self_rows(v[None], h_heads)  # s: [1, BK, H]
                deq = (q[0].astype(jnp.float32).reshape(bk_total, h_heads, hd)
                       * s[0][:, :, None])
                return deq.reshape(bk_total, d).astype(dtype)
            k_new, v_new = _rt8(k_new), _rt8(v_new)
        k_cache = jax.lax.dynamic_update_slice(k_cache, k_new[:, None, :], (0, pos, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v_new[:, None, :], (0, pos, 0))
        qh = (q * scaling).reshape(bk_total, h_heads, hd)
        s = jnp.einsum("bhd,bthd->bht", qh, k_cache.reshape(bk_total, T_max, h_heads, hd),
                       preferred_element_type=jnp.float32)
        s = s + self_bias[None, None, :]
        p = jax.nn.softmax(s, axis=-1).astype(dtype)
        o = jnp.einsum("bht,bthd->bhd", p, v_cache.reshape(bk_total, T_max, h_heads, hd),
                       preferred_element_type=jnp.float32)
        o = o.astype(dtype).reshape(bk_total, d)
        o = (jnp.dot(o, w_so, preferred_element_type=jnp.float32) + b_so).astype(dtype)
        x = _ln(ln_s, residual + o)

        # cross-attention: KV is beam-invariant [B, H, hd, S]; fold beams into q
        residual = x
        q = ((jnp.dot(x, w_cq, preferred_element_type=jnp.float32) + b_cq).astype(dtype)
             * scaling)
        qh = q.reshape(batch, k_beams, h_heads, hd)
        s = jnp.einsum("bkhd,bhds->bkhs", qh, ck, preferred_element_type=jnp.float32)
        s = s + enc_mask_bias[:, 0, 0, :][:, None, None, :]  # [B,1,1,S] pad bias
        p = jax.nn.softmax(s, axis=-1).astype(dtype)
        o = jnp.einsum("bkhs,bhds->bkhd", p, cv, preferred_element_type=jnp.float32)
        o = o.astype(dtype).reshape(bk_total, d)
        o = (jnp.dot(o, w_co, preferred_element_type=jnp.float32) + b_co).astype(dtype)
        x = _ln(ln_c, residual + o)

        residual = x
        hmid = act(jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1).astype(dtype)
        o = (jnp.dot(hmid, w2, preferred_element_type=jnp.float32) + b2).astype(dtype)
        x = _ln(ln_f, residual + o)
        return x, (k_cache, v_cache)

    xs = (dp.w_qkv, dp.b_qkv, dp.w_self_out, dp.b_self_out, dp.ln_self,
          dp.w_cross_q, dp.b_cross_q, dp.w_cross_out, dp.b_cross_out, dp.ln_cross,
          dp.w_fc1, dp.b_fc1, dp.w_fc2, dp.b_fc2, dp.ln_final,
          cache.self_k, cache.self_v, cache.cross_k, cache.cross_v)
    # scan (not unroll): measured 8.25 ms/step vs 9.75 unrolled on v5e —
    # the rolled loop schedules better at t=1 shapes
    x, (new_k, new_v) = jax.lax.scan(layer, x, xs)

    w_lm = params["shared"]["weight"].astype(dtype)
    logits = jnp.dot(x, w_lm.T, preferred_element_type=jnp.float32)
    logits = logits + params["final_logits_bias"].astype(jnp.float32)
    return logits, DecodeCache(new_k, new_v, cache.cross_k, cache.cross_v)


# --- plan provenance -------------------------------------------------------
# choose_plan's per-batch defaults are MEASUREMENT SNAPSHOTS, not laws: every
# number in the default ladder (b64 140 XLA-head / b128 157 / b256 ~168-176
# cps, scripts/logs_r4/bench_queue{9,18}.log, docs/decode_budget.md) was taken
# under one specific knob regime. When an upstream default changes the regime,
# the plan defaults rot silently — the motivating bug: the r2-era "n_lm=32
# wins at b64" default inverted under the blockmax beam logic and survived two
# rounds until a vacuous A/B was investigated (queue18). choose_plan warns
# once per process when the active regime differs from the measured basis so
# a sweep log never silently mixes regimes.
_PLAN_MEASURED_REGIME = {
    # r4 final-HEAD defaults the ladder was measured under (v5e):
    "beam_logic": "shortlist",   # VACNIC_BEAM_LOGIC / resolve_cand_mode
    "beam_topk": "blockmax",     # VACNIC_BEAM_TOPK (row top-C, queue9)
    "crosskv_int8": "1",         # VACNIC_CROSSKV_INT8 (gate PASS, PARITY.md)
    "selfkv_fp8": "0",           # measured negative on v5e (queue11)
    "selfkv_int8": "0",          # fails its quality gate (queue20/21)
}
_plan_regime_warned = False


def plan_regime() -> dict[str, str]:
    """The active decode-knob regime, normalized to the keys of
    _PLAN_MEASURED_REGIME (env-only view; beam_logic defaults to the
    large-vocab resolution of resolve_cand_mode, which is what every
    bench shape uses)."""
    env = os.environ
    logic = env.get("VACNIC_BEAM_LOGIC")
    if logic is None:
        logic = {"1": "shortlist", "0": "full"}.get(
            env.get("VACNIC_BEAM_SHORTLIST", ""), "shortlist")
    return {
        "beam_logic": logic,
        "beam_topk": env.get("VACNIC_BEAM_TOPK", "blockmax"),
        "crosskv_int8": env.get("VACNIC_CROSSKV_INT8", "1"),
        "selfkv_fp8": "1" if env.get("VACNIC_SELFKV_FP8") == "1" else "0",
        "selfkv_int8": "1" if env.get("VACNIC_SELFKV_INT8") == "1" else "0",
    }


def _warn_if_plan_regime_stale() -> None:
    global _plan_regime_warned
    if _plan_regime_warned:
        return
    active = plan_regime()
    diff = {k: (active[k], _PLAN_MEASURED_REGIME[k])
            for k in _PLAN_MEASURED_REGIME if active[k] != _PLAN_MEASURED_REGIME[k]}
    if diff:
        _plan_regime_warned = True
        import logging

        logging.getLogger(__name__).warning(
            "choose_plan: active knob regime differs from the one the "
            "per-batch plan defaults were measured under — %s (active vs "
            "measured). The default ladder (docs/decode_budget.md) may be "
            "stale in this regime; re-sweep VACNIC_PLAN_* before trusting "
            "relative numbers (the b64 in-kernel-LM default inverted this "
            "way under blockmax, scripts/logs_r4/bench_queue18.log).",
            diff)


def choose_plan(bk: int, b: int, t_max: int, ffn_cols: int):
    """Auto ChunkPlan for the fused decode kernel at static shapes.

    Chunk counts scale with batch so the per-phase VMEM footprint stays at
    the proven batch-32 shape (bkc≈40 rows, bc≈8 batch items). Self chunks
    must hold whole beam groups (ancestry is chunk-local) and bkc must stay
    8-aligned (Mosaic sublane splits)."""
    from vacnic_tpu.kernels.decode_layer import ChunkPlan

    _warn_if_plan_regime_stale()

    def pick(target_chunks, valid):
        for n in (target_chunks, 8, 4, 2, 1):
            if n >= 1 and b % n == 0 and valid(n):
                return n
        return 1

    # r3 sweep at b128 (bk 640, int8+nt4): n_self=8 (bkc=80) = 7.96 ms
    # model step vs 8.86 at 16 and 15.5 at 4 — bigger row chunks halve the
    # phase count and double the gather depth; end-to-end 141.3 cps vs
    # 133.3. (bkc=80 disqualifies the in-kernel LM head — see
    # the r2-era in-kernel-LM gating, superseded in r4 — n_lm defaults 0.)
    ns_default = pick(max(1, bk // 80), lambda n: (bk // n) % 8 == 0) \
        if bk >= 640 else pick(max(1, bk // 40), lambda n: (bk // n) % 8 == 0)
    n_self = int(os.environ.get("VACNIC_PLAN_NSELF", ns_default))
    # self chunks hold whole beam groups (the ancestry one-hot is
    # chunk-local: decode_stack asserts bkc % beams == 0) and stay
    # 8-aligned; an env-swept n_self gets the largest legal value not
    # above the request (b512 + NSELF=40 → bkc 64 % beams 5 != 0 asserted,
    # scripts/logs_r4/bench_queue8.log)
    beams = bk // b
    # fp8 self-cache blocks use (32,128) tiling: the row-chunk sublane dim
    # must also be 32-divisible (with beams=5 + 8-alignment → bkc % 160).
    # VACNIC_FP8_SUB8=1 relaxes to 8-alignment — valid only if the Mosaic
    # window probe (scripts/mosaic_probe_fp8.py window80) passes on the
    # target chip; queue10 measured the 32-aligned plan (ns8 at b256) 2x
    # slower, so fp8 is only viable with this relaxation.
    sub = 8
    if (os.environ.get("VACNIC_SELFKV_FP8") == "1"
            and os.environ.get("VACNIC_FP8_SUB8") != "1"):
        sub = 32
    # int8 self-cache blocks share the 8-bit (32,128) tiling question; the
    # r4 window probe (scripts/mosaic_probe_int8win.py) validates bkc=80
    # int8 windows on the target chip before VACNIC_INT8_SUB8=1 is used
    if (os.environ.get("VACNIC_SELFKV_INT8") == "1"
            and os.environ.get("VACNIC_INT8_SUB8") != "1"):
        sub = 32
    def _ns_ok(n, s):
        return (bk % n == 0 and (bk // n) % beams == 0
                and (bk // n) % s == 0)
    if not _ns_ok(n_self, sub):
        fit = [n for n in range(min(n_self, bk), 0, -1) if _ns_ok(n, sub)]
        if not fit:  # no fp8-legal chunking at this shape (tiny configs):
            # fall back to bf16 legality — generate's fp8 gate re-checks
            # bkc % 32 and keeps the cache bf16 in that case
            fit = [n for n in range(min(n_self, bk), 0, -1) if _ns_ok(n, 8)]
        # kernel-ineligible shapes (pallas_plan_exists false) can reach here
        # with no legal chunking at all; keep the old pick() fallback of 1
        n_self = fit[0] if fit else 1
    n_cross = int(os.environ.get(
        "VACNIC_PLAN_NCROSS", pick(max(1, b // 8), lambda n: True)))
    # enc_bias blocks are [B/n_cross, S]: Mosaic needs the sublane dim
    # 8-divisible or equal to B, so an env-swept n_cross must keep
    # B/n >= 8 rows (b512 + NCROSS=128 → 4-row blocks failed to lower,
    # scripts/logs_r4/bench_queue6.log) — largest valid value not above
    # the request
    if n_cross != 1 and (b % n_cross or (b // n_cross) % 8):
        # n=1 is always legal; keep it reachable when b < 8 makes the
        # range start at 0 (StopIteration otherwise — review finding)
        n_cross = next((n for n in range(min(n_cross, b // 8), 1, -1)
                        if b % n == 0 and (b // n) % 8 == 0), 1)
    # Best measured per-batch configs on v5e (clean serial runs):
    #   b32  (bk 160): n_t=4, XLA LM head          -> ~88-91 cps
    #   b64  (bk 320): n_t=2, in-kernel LM n_lm=32 -> 107.4 cps
    #   b128 (bk 640): n_t=1, in-kernel LM n_lm=32 -> 115.3 cps
    # Rule: time chunks shrink as row chunks multiply (phase count ~16);
    # the in-kernel LM head wins once its weight stream amortizes over
    # more rows. VACNIC_PLAN_NT / VACNIC_PLAN_NLM override for sweeps.
    # in-kernel LM default only at bk≈320: at bk 640 the [BK, VB] logits
    # blocks leave <2 MB of VMEM-stack slack and the compiler's stack
    # accounting drifts a few MB between compiles — too flaky for an
    # unconditional default. (r4: n_lm defaults to 0 everywhere — the b64
    # in-kernel-LM win inverted under blockmax; generate_mm_robust probes
    # only an env-requested VACNIC_PLAN_NLM and falls back on the flake.)
    # n_t: time chunks restore the pos-scalar-prefetch elision (cache reads
    # and ancestry-gather FLOPs scale with decoded length). r3 MEASURED at
    # b128: n_t=4 beats 1 (8.86 vs 9.23 ms model step with int8); b64 kept
    # at the r2-measured 2.
    default_nt = 4 if bk >= 640 else max(1, 16 // n_self)
    n_t = int(os.environ.get("VACNIC_PLAN_NT", default_nt))
    # in-kernel LM head default OFF everywhere since r4: its r2-era b64 win
    # (107.4 vs 104.5) inverted under the blockmax beam logic — same-window
    # paired b64: XLA head 140.0 (137.0/140.8/140.0) vs n_lm=32 131.7
    # (131.7/132.8/127.6), scripts/logs_r4/bench_queue18.log. The blockmax
    # row top-C reads the XLA head's logits straight out of fusion; the
    # kernel head's separate [BK, Vp] emission no longer buys anything.
    n_lm = int(os.environ.get("VACNIC_PLAN_NLM", 0))
    if n_t < 1:  # 0 would ZeroDivisionError below, negatives StopIteration
        n_t = default_nt
    if t_max % n_t:
        # largest divisor of T not exceeding the request — decode_stack
        # would otherwise reset to 1 and corrupt sweep records
        n_t = next(n for n in range(n_t, 0, -1) if t_max % n == 0)
    # n_ffn also divides the fc1/fc2 weight WINDOWS Mosaic double-buffers:
    # at b512 the n_ffn=2 windows alone are 16 MB×2-buffered and the program
    # exceeds the 128 MB VMEM cap by 9.66M (scripts/logs_r4/bench_queue5.log)
    # — finer FFN columns trade a few grid steps for window footprint.
    nf_default = 2 if ffn_cols % 2 == 0 else 1
    n_ffn = int(os.environ.get("VACNIC_PLAN_NFFN", nf_default))
    if n_ffn < 1 or ffn_cols % n_ffn:  # 0/negative would ZeroDivisionError
        n_ffn = nf_default
    # FFN-in-fetch-shadow: schedule the FFN jobs inside the cross-phase
    # fetch stream instead of dedicated compute-only phases. DEFAULT ON
    # since r5 with n_ffn=1 (layer-constant fc windows — the n_ffn=2 job
    # schedule alternates fc columns per phase, refetching the 8 MB window
    # pair every job; that ping-pong is why the first shadow A/B lost).
    # Measured (queue37, paired same-window, int8 cross-KV): model step
    # 16.64 vs 17.32 ms; e2e b256 171.6 vs 168.1 cps. Requires the job
    # schedule to respect the x1 row dependency — auto-disabled when the
    # geometry check fails (default plans: n_cross == 2*n_self, which
    # satisfies it).
    env_shadow = os.environ.get("VACNIC_PLAN_FFNSHADOW")
    ffn_shadow = int(env_shadow) if env_shadow is not None else 1
    shadow_forced_nffn = (ffn_shadow and env_shadow is None
                          and "VACNIC_PLAN_NFFN" not in os.environ)
    if shadow_forced_nffn:
        n_ffn = 1  # full-width fc blocks, fetched once per layer
    if ffn_shadow:
        bkc = bk // n_self
        rows_per_cross = (bk // b) * (b // n_cross)  # beams * bc
        stride = 1 if n_ffn >= 2 else 2
        ok = all(
            c * n_ffn * stride + 2 > -(-(c + 1) * bkc // rows_per_cross) - 1
            for c in range(n_self))
        if not ok:
            import logging

            logging.getLogger(__name__).warning(
                "ffn_shadow (%s) disabled: the plan geometry (n_self=%d "
                "n_cross=%d n_ffn=%d) violates the shadow schedule's x1 "
                "dependency; running with dedicated FFN phases",
                "env-requested" if env_shadow is not None else "default",
                n_self, n_cross, n_ffn)
            ffn_shadow = 0
            if shadow_forced_nffn:
                # undo the shadow-only n_ffn=1 override: a non-shadow plan
                # with full-width fc windows at the 121 MB cap is a VMEM
                # regime the baseline never measured (review finding)
                n_ffn = nf_default
    # time-chunk phase fusion (r5 grid-step-overhead lever): 2 = two time
    # chunks per grid step via even/odd window operands (elision preserved;
    # ~10 MB extra VMEM for the second double-buffered window pair). Only
    # legal with the default gather path at even n_t.
    t_fuse = int(os.environ.get("VACNIC_PLAN_TFUSE", 1))
    if t_fuse not in (1, 2) or n_t % t_fuse or (t_fuse == 2 and (
            os.environ.get("VACNIC_SELFKV_INT8") == "1"
            or os.environ.get("VACNIC_SELFKV_FP8") == "1"
            or int(os.environ.get("VACNIC_GATHER_V2", 0)))):
        t_fuse = 1
    return ChunkPlan(
        n_self=n_self,
        n_cross=n_cross,
        n_ffn=n_ffn,
        n_t=n_t,
        n_lm=n_lm,
        t_fuse=t_fuse,
        # shadow default needs the 127 MB cap (full-width fc windows are
        # +16 MB over the n_ffn=2 pair; measured fitting at b256, and
        # generate_mm_robust degrades to the safe plan on a VMEM flake)
        vmem_mb=int(os.environ.get("VACNIC_PLAN_VMEM",
                                    127 if ffn_shadow
                                    else ChunkPlan._field_defaults["vmem_mb"])),
        gather_v2=int(os.environ.get("VACNIC_GATHER_V2",
                                      ChunkPlan._field_defaults["gather_v2"])),
        ffn_shadow=ffn_shadow,
    )


def decode_step_pallas(
    dp: DecodeParams,
    params: Params,
    cache: DecodeCache,
    tok: jax.Array,
    pos: jax.Array,
    enc_mask_bias: jax.Array,
    cfg: BartConfig,
    dtype=jnp.bfloat16,
    plan=None,
    interpret: bool = False,
) -> tuple[jax.Array, DecodeCache]:
    """decode_step with the layer stack fused into ONE Pallas kernel
    (kernels/decode_layer.decode_stack): activations stay VMEM-resident
    across all layers; weights and caches stream in phased blocks.
    Embedding and LM head remain XLA ops outside the kernel.

    Requires a time-major cache with ancestry
    (build_decode_cache(..., pad_to=16, time_major=True)): each step writes
    its K/V row into the raw cache at `pos`; the paired beam reorder is
    `reorder_anc` (index recompose — no cache gather)."""
    # Mosaic targets TPU; on CPU (tests, BENCH_TINY smoke) run interpreted
    interpret = interpret or jax.default_backend() == "cpu"
    x, plan = _embed_and_plan(dp, params, cache, tok, pos, cfg, dtype, plan)
    if plan.n_lm > 0:
        # direct callers (tests/benches) that built dp without the LM head
        dp = ensure_lm_head(dp, params, dtype)
    logits_p, x_out, new_cache = _stack_body(dp, params, cache, x, pos,
                                             enc_mask_bias, cfg, plan, interpret)
    if plan.n_lm > 0:
        # LM head ran in-kernel over the padded vocab; drop the pad columns
        logits = logits_p[:, :params["shared"]["weight"].shape[0]]
    else:
        w_lm = params["shared"]["weight"].astype(dtype)
        logits = jnp.dot(x_out, w_lm.T, preferred_element_type=jnp.float32)
        logits = logits + params["final_logits_bias"].astype(jnp.float32)
    return logits, new_cache


def _embed_and_plan(dp, params, cache, tok, pos, cfg, dtype, plan):
    """Shared kernel-path preamble: token+position embed + layernorm and the
    ChunkPlan resolution (used by decode_step_pallas and the stats variant,
    so the embedding path can never desynchronize between them)."""
    dec = params["decoder"]
    d = cfg.d_model
    x = jnp.take(params["shared"]["weight"], tok[:, 0], axis=0).astype(dtype)
    scale = float(d) ** 0.5 if cfg.scale_embedding else 1.0
    x = x * scale + jnp.take(dec["embed_positions"]["weight"], pos + POS_OFFSET,
                             axis=0).astype(dtype)
    x = layernorm(dec["layernorm_embedding"], x).astype(jnp.bfloat16)
    if plan is None:
        bk = tok.shape[0]
        b = cache.cross_k.shape[1]
        t_max = cache.self_k.shape[1]  # time-major cache: [L, T, BK, D]
        plan = choose_plan(bk, b, t_max, dp.w_fc1.shape[2])
    return x, plan


def _stack_body(dp, params, cache, x, pos, enc_mask_bias, cfg, plan, interpret):
    """Shared fused-stack step: kernel call + cache row write."""
    from vacnic_tpu.kernels.decode_layer import decode_stack

    bk = x.shape[0]
    bkc = bk // plan.n_self
    mm_dtype = jnp.float32 if interpret else jnp.bfloat16
    group = (jnp.arange(bk, dtype=jnp.int32) // bkc) * bkc
    anc_hot = jax.nn.one_hot(cache.anc - group[None, :], bkc, dtype=mm_dtype)
    logits_p, x_out, k_new, v_new = decode_stack(
        dp, x, pos, cache.self_k, cache.self_v, anc_hot,
        cache.cross_k, cache.cross_v,
        enc_mask_bias[:, 0, 0, :].astype(jnp.float32), dp.w_lm, dp.b_lm,
        cfg, plan=plan, interpret=interpret,
        cross_k_scale=cache.cross_k_scale, cross_v_scale=cache.cross_v_scale,
        self_k_scale=cache.self_k_scale, self_v_scale=cache.self_v_scale,
    )
    if cache.self_k.dtype == jnp.int8:
        # int8 self cache: quantize the kernel's full-precision new rows at
        # the write (per-(L, row, H) scales — ancestry-invariant because a
        # cache row is write-once, see quantize_self_rows) and record the
        # step's scale rows at pos
        h = cfg.decoder_attention_heads
        k_new, ks = quantize_self_rows(k_new, h)
        v_new, vs = quantize_self_rows(v_new, h)
        cache = cache._replace(
            self_k_scale=jax.lax.dynamic_update_slice(
                cache.self_k_scale, ks[:, None, :, :], (0, pos, 0, 0)),
            self_v_scale=jax.lax.dynamic_update_slice(
                cache.self_v_scale, vs[:, None, :, :], (0, pos, 0, 0)))
    new_k = jax.lax.dynamic_update_slice(cache.self_k, k_new[:, None, :, :],
                                         (0, pos, 0, 0))
    new_v = jax.lax.dynamic_update_slice(cache.self_v, v_new[:, None, :, :],
                                         (0, pos, 0, 0))
    return logits_p, x_out, cache._replace(self_k=new_k, self_v=new_v, pos=pos)


def decode_step_pallas_stats(
    dp: DecodeParams,
    params: Params,
    cache: DecodeCache,
    tok: jax.Array,
    pos: jax.Array,
    enc_mask_bias: jax.Array,
    cfg: BartConfig,
    dtype=jnp.bfloat16,
    plan=None,
    interpret: bool = False,
    shortlist_c: int = 16,
):
    """decode_step_pallas with the XLA LM head replaced by the fused
    lm_stats kernel (kernels/lm_stats): one pass computes the f32 logits
    PLUS the per-block max and lse partials, so the beam shortlist's
    full-width logsumexp and row top-C passes disappear.

    Returns (logits_padded [BK, Vp] f32, cand_vals [BK, C], cand_idx
    [BK, C], lse [BK], new_cache) — the beam_search `step_stats_fn`
    contract. Requires a plan with n_lm == 0 (the in-kernel LM head and the
    stats head are alternatives)."""
    from vacnic_tpu.kernels.lm_stats import lm_stats, lm_stats_topk

    interpret = interpret or jax.default_backend() == "cpu"
    x, plan = _embed_and_plan(dp, params, cache, tok, pos, cfg, dtype, plan)
    # the stats head supersedes the in-kernel LM head; an auto-resolved plan
    # may carry n_lm>0 (choose_plan's b64 default) — force it off rather
    # than asserting on a default this function controls
    plan = plan._replace(n_lm=0)
    dp = ensure_lm_head(dp, params, dtype)
    _, x_out, new_cache = _stack_body(dp, params, cache, x, pos,
                                      enc_mask_bias, cfg, plan, interpret)
    # keep the LM matmul in the decode dtype: the plain path computes
    # x_out @ w_lm in `dtype` (decode_step_pallas n_lm=0 branch), so a
    # forced bf16 downcast here would make the stats path systematically
    # diverge from it whenever dtype=f32 (the CPU parity tests)
    logits_p, m, s = lm_stats(x_out.astype(dtype), dp.w_lm, dp.b_lm,
                              interpret=interpret)
    v = params["shared"]["weight"].shape[0]
    cv, ci, lse = lm_stats_topk(logits_p, m, s, shortlist_c, v)
    return logits_p, cv, ci, lse, new_cache
