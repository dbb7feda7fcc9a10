"""Fused decode-stack Pallas kernel: all decoder layers of one generation
step in a single kernel.

Why (CLAUDE.md round-2 #1): the XLA decode step is ~8.4 ms vs a ~2 ms HBM
roofline — the per-step cost is spread across ~230 small ops inside the
scanned layer bodies (reference hot loop: utils/test_mmbart_clip_ddp.py:
758-842 steps the HF decoder layer-by-layer from Python). Fusing the whole
stack into one kernel keeps the activations [B·K, d] resident in VMEM across
layers and turns the weight/cache traffic into one continuous pipelined
stream.

Grid = (layers, phases); TPU grids are sequential, so VMEM scratch legally
carries x across grid steps. Phases within a layer:

  [0, NSELF·NT)         self-attention over B·K row chunks × T time-chunks.
                        The self cache is stored TIME-MAJOR [L, T, BK, D] and
                        is NEVER physically reordered on beam select: the
                        beam ancestry matrix anc[t, c] (= which physical row
                        holds beam c's K/V from step t) enters as a per-chunk
                        one-hot [T, BKC, BKC], and the kernel gathers K/V
                        with batched MXU matmuls (~20 GFLOP/step at b32 —
                        noise next to the ~1 GB/step HBM gather it replaces;
                        at b128 this grows to ~80 GFLOP/step at MXU-hostile
                        40-deep shapes — see docs/decode_budget.md).
                        Attention runs ONLINE-SOFTMAX over the time chunks,
                        and `pos` is a SCALAR-PREFETCH argument consumed by
                        the index maps: time chunks beyond pos//TB map to the
                        last needed chunk, so their block fetches are elided
                        (consecutive identical indices are not re-fetched) —
                        cache traffic scales with the decoded length, not
                        the padded capacity. The new token's K/V merge in via
                        masks (cache row `pos` is still zero) and are emitted
                        to `k_new/v_new` for the row write outside;
  [+, +NCROSS)          cross-attention over batch chunks — KV is
                        beam-invariant [B, H, hd, S] (bandwidth win of
                        infer/decode_fast carried over); beams fold into the
                        q rows;
  [+, +NFFN)            FFN with the 16 MB fc1/fc2 pair column-chunked,
                        accumulated in an f32 scratch.

Head-structured attention scores avoid sub-lane head layouts entirely:
scores = ((q ⊙ K) reshaped) @ SEL, where SEL is the [D, H] block-diagonal
head-selector — small MXU matmuls instead of 16×64-lane relayouts.

Numerics: bf16 weights/caches, f32 accumulation and softmax (the online
update is algebraically the exact softmax) — identical to
infer/decode_fast.decode_step (tests/test_decode_kernel.py pins per-step
logits and beam-reordered multi-step tokens in interpret mode; the on-chip
parity check is scripts/bench_decode_kernel.py BENCH_MODE=parity).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vacnic_tpu.core.config import BartConfig
from vacnic_tpu.kernels.mosaic_math import mosaic_act


class ChunkPlan(NamedTuple):
    n_self: int = 4   # B·K row chunks for self-attention
    n_cross: int = 4  # batch chunks for cross-attention
    n_ffn: int = 2    # fc1/fc2 column chunks
    vmem_mb: int = 121  # v5e VMEM is 128 MB; b128 needs ~118 of scoped stack
    n_t: int = 4      # time chunks per self row chunk (online softmax)
    # Ancestry-gather formulation. 0 (default): batched one-hot gathers
    # ([TB, C, C']@[TB, C', D]). 1: deep-K per-head matmuls — raw per-head
    # scores with a masked ancestry reduce (K side) and probability-weighted
    # deep value matmuls (V side). MEASURED (r3, b128 ns16 nt4 int8):
    # v2 = 13.59 ms/step vs legacy 8.86 — the 48 small per-head dots lose
    # to 4 big batched ops despite better contraction depth; same lesson as
    # the encoder's block-diag cross probe. Kept as tested inventory.
    gather_v2: int = 0
    # In-kernel LM head: 0 = off (XLA computes the LM head from x_out —
    # MEASURED FASTER end-to-end: XLA fuses the tied matmul into the
    # log_softmax passes better than the kernel's extra grid iteration,
    # 109.7 vs 103.8 cps at batch 64). >0 = vocab chunks for the in-kernel
    # variant (16 fits the VMEM stack at bart-large; 8 OOMs by ~3-4 MB).
    n_lm: int = 0
    # FFN-in-fetch-shadow (r5, the overlap lever from the queue8-10 floor
    # attribution: skeleton fetch-only 11.66 ms of a 16.28 ms model step —
    # step ≈ fetch + compute, NOT max(fetch, compute), because the FFN's
    # ~21.5 GFLOP/layer runs in n_ffn compute-only phases at the END of each
    # layer while the 96 fetch-heavy self/cross phases have almost no MXU
    # work, and Mosaic's pipeline only looks one block ahead). 1 = drop the
    # dedicated FFN phases and instead compute the FFN row-chunked (one self
    # chunk's rows per job, column chunk f per job) INSIDE the cross-phase
    # stream, where each job's ~10 us of MXU time hides under that phase's
    # cross-KV window fetch. Dependency-safe: cross phase m writes
    # x1 rows of self chunk m//ceil(n_cross/n_self)... (see _ffn_job), and
    # job j for chunk c = j // n_ffn is scheduled at phase m = j + 2, which
    # is strictly after the cross phases that produce chunk c's x1 rows
    # whenever n_ffn >= 2 (n_ffn == 1 uses stride 2). Jobs that don't fit in
    # n_cross phases spill into `extra_phases` tail phases per layer.
    ffn_shadow: int = 0
    # Time-chunk phase fusion (r5, grid-step-overhead lever from the queue31
    # K-ladder / queue34 decomposition): 2 = process TWO time chunks per
    # grid step through SEPARATE window operands (self_k/v + ancestry each
    # get an even-chunk and an odd-chunk operand, so per-chunk pos-elision
    # is preserved) — halves the self-phase count. Cost: the odd operand
    # fetches one unneeded chunk while last_tc == 0 (early decode steps),
    # and the extra window buffers add ~10 MB VMEM. 1 = off.
    t_fuse: int = 1

    @property
    def n_t_phases(self) -> int:
        return self.n_t // self.t_fuse

    @property
    def ffn_stride(self) -> int:
        return 1 if self.n_ffn >= 2 else 2

    @property
    def extra_phases(self) -> int:
        if not self.ffn_shadow:
            return 0
        n_jobs = self.n_self * self.n_ffn
        m_last = 2 + (n_jobs - 1) * self.ffn_stride
        return max(0, m_last + 1 - self.n_cross)

    @property
    def phases(self) -> int:
        body = self.n_self * self.n_t_phases + self.n_cross
        body += self.extra_phases if self.ffn_shadow else self.n_ffn
        # the LM head (if on) runs on an extra grid iteration reusing these
        return max(body, self.n_lm)


def _kernel(
    pos_ref,       # scalar-prefetch [1] int32 — current decode position
    # inputs (refs), grid = (L, P)
    x0_ref,        # [BK, d] bf16
    w_qkv_ref,     # [1, d, 3d]
    b_qkv_ref,     # [1, 1, 3d] f32
    w_so_ref,      # [1, d, d]
    b_so_ref,      # [1, 1, d] f32
    ln_s_ref,      # [1, 2, d] f32
    w_cq_ref,      # [1, d, d]
    b_cq_ref,      # [1, 1, d] f32
    w_co_ref,      # [1, d, d]
    b_co_ref,      # [1, 1, d] f32
    ln_c_ref,      # [1, 2, d] f32
    w_fc1_ref,     # [1, d, FC]
    b_fc1_ref,     # [1, 1, FC] f32
    w_fc2_ref,     # [1, FC, d]
    b_fc2_ref,     # [1, 1, d] f32
    ln_f_ref,      # [1, 2, d] f32
    self_k_ref,    # [1, TB, BKC, D] bf16 (time-major, unreordered; or int8)
    self_v_ref,    # [1, TB, BKC, D] bf16
    sk_scale_ref,  # [1, TB, BKC, H] f32 — int8 self-cache per-(t, row, head)
    sv_scale_ref,  # [1, TB, BKC, H] f32   dequant scales (dummies unless
                   #                       self_quant; beam-aligned in-kernel
                   #                       via the ancestry one-hot)
    anc_ref,       # [TB, BKC, BKC] — ancestry one-hot (legacy gather; dummy if v2)
    self_k2_ref,   # [1, TB, BKC, D] — ODD-chunk self K window (t_fuse=2; dummy else)
    self_v2_ref,   # [1, TB, BKC, D] — ODD-chunk self V window (t_fuse=2; dummy else)
    anc_b_ref,     # [TB, BKC, BKC] — ODD-chunk ancestry one-hot (t_fuse=2; dummy else)
    ancT_ref,      # [1, TB, BKC(r), BKC(c)] — transposed one-hot (v2; dummy else)
    anc2_ref,      # [1, TB·BKC(t·r), BKC(c)] — row-major (t,r) one-hot (v2)
    cross_k_ref,   # [1, BC, H, hd, S] bf16 (or int8 when quant)
    cross_v_ref,   # [1, BC, H, hd, S] bf16 (or int8 when quant)
    ck_scale_ref,  # [1, BC, H, hd] f32 — int8 dequant scales (dummy if not quant)
    cv_scale_ref,  # [1, BC, H, hd] f32
    enc_bias_ref,  # [BC, S] f32
    w_lm_ref,      # [VB, d] bf16 — tied LM head rows for this vocab chunk
    b_lm_ref,      # [1, VB] f32 — final_logits_bias chunk (pad rows -1e9)
    # outputs
    x_out_ref,     # [BK, d] bf16
    k_new_ref,     # [1, BKC, D] bf16
    v_new_ref,     # [1, BKC, D] bf16
    logits_ref,    # [BK, VB] f32 — LM-head logits for this vocab chunk
    # scratch
    x_s,           # [BK, d] f32 — carried activation
    x1_s,          # [BK, d] f32 — post-self-attn
    acc_s,         # [BK, d] f32 — FFN accumulator
    q_s,           # [BKC, d] mm — scaled q for the current row chunk
    kn_s,          # [BKC, d] mm — new-token K
    vn_s,          # [BKC, d] mm — new-token V
    snew_s,        # [BKC, H] f32 — new-token scores
    m_s,           # [BKC, H] f32 — online-softmax running max
    l_s,           # [BKC, H] f32 — online-softmax running sum
    att_s,         # [BKC, d] f32 — online-softmax value accumulator
    pap_s,         # [BKC, d] f32 — running prob mass at t == pos
    *,
    plan: ChunkPlan,
    cfg_heads: int,
    cfg_hd: int,
    beams: int,
    act_name: str,
    mm_dtype=jnp.bfloat16,
    quant: bool = False,
    self_quant: bool = False,
    no_gather: bool = False,
    no_cross_sm: bool = False,
    no_self_sm: bool = False,
    skeleton: bool = False,
):
    use_lm = plan.n_lm > 0
    l = pl.program_id(0)
    p = pl.program_id(1)
    # with the in-kernel LM head, the last grid iteration runs it
    n_layers = pl.num_programs(0) - (1 if use_lm else 0)
    pos = pos_ref[0]
    n_t = plan.n_t
    n_tp = plan.n_t_phases  # grid phases per row chunk (n_t unless t_fuse)
    ns = plan.n_self * n_tp
    # exact gelu via the shared Mosaic-safe rational erf (mosaic_math)
    act = mosaic_act(act_name)

    bk, d = x_s.shape
    tb = self_k_ref.shape[1]
    bkc = self_k_ref.shape[2]
    bc = cross_k_ref.shape[1]
    S = cross_k_ref.shape[4]
    H, hd = cfg_heads, cfg_hd
    scaling = hd**-0.5
    chunk = p // n_tp       # self row chunk (valid while p < ns)
    tcq = p % n_tp          # phase index within the row chunk
    tc = tcq * plan.t_fuse  # first time chunk this phase handles
    last_tc = pos // tb     # last time chunk holding rows <= pos
    last_tcq = last_tc // plan.t_fuse  # phase holding the last time chunk

    # block-diagonal head selector [D, H]: SEL[dd, h] = 1 iff dd // hd == h
    dd_ids = jax.lax.broadcasted_iota(jnp.int32, (d, H), 0)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (d, H), 1)
    sel = (dd_ids // hd == h_ids).astype(mm_dtype)

    def ln(ref, x):
        g, b = ref[0, 0, :], ref[0, 1, :]
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5) * g[None, :] + b[None, :]

    if skeleton:
        # PROFILING ONLY (wrong results): every compute phase replaced by a
        # tiny corner read of each block it would fetch — no window can be
        # elided, so this measures the pure fetch pipeline + grid overhead
        # (the decode analogue of the encoder parts=none probe that showed
        # the encoder kernel at speed-of-light). VACNIC_KERNEL_SKELETON=1.
        def _touch(*refs):
            s = jnp.float32(0.0)
            for r in refs:
                blk = r[...]
                flat = blk.reshape(-1, blk.shape[-1])  # merge-only reshape
                s = s + jnp.sum(
                    flat[:8, :min(128, flat.shape[-1])].astype(jnp.float32))
            return s

        @pl.when((l < n_layers) & (p < ns))
        def _sk_self():
            s = _touch(x0_ref, w_qkv_ref, b_qkv_ref, w_so_ref, ln_s_ref,
                       self_k_ref, self_v_ref, sk_scale_ref, sv_scale_ref,
                       anc_ref, ancT_ref, anc2_ref)
            if plan.t_fuse == 2:
                s = s + _touch(self_k2_ref, self_v2_ref, anc_b_ref)
            m_s[...] = jnp.full(m_s.shape, s, jnp.float32)

            @pl.when(tcq == 0)
            def _sk_store():
                k_new_ref[0] = self_k_ref[0, 0].astype(k_new_ref.dtype)
                v_new_ref[0] = self_v_ref[0, 0].astype(v_new_ref.dtype)

        @pl.when((l < n_layers) & (p >= ns) & (p < ns + plan.n_cross))
        def _sk_cross():
            s = _touch(w_cq_ref, b_cq_ref, w_co_ref, b_co_ref, ln_c_ref,
                       cross_k_ref, cross_v_ref, ck_scale_ref, cv_scale_ref,
                       enc_bias_ref)
            l_s[...] = jnp.full(l_s.shape, s, jnp.float32)

        if plan.ffn_shadow:
            # shadow plans fetch fc blocks during the cross/tail job phases
            sk_m = p - ns
            sk_j = (sk_m - 2) // plan.ffn_stride
            sk_ffn_on = ((sk_m >= 2) & (sk_j >= 0)
                         & (sk_j < plan.n_self * plan.n_ffn))
        else:
            sk_ffn_on = ((p >= ns + plan.n_cross)
                         & (p < ns + plan.n_cross + plan.n_ffn))

        @pl.when((l < n_layers) & sk_ffn_on)
        def _sk_ffn():
            s = _touch(w_fc1_ref, b_fc1_ref, w_fc2_ref, b_fc2_ref, ln_f_ref)
            att_s[...] = jnp.full(att_s.shape, s, jnp.float32)

        if use_lm:
            @pl.when(l == n_layers)
            def _sk_lm():
                s = _touch(w_lm_ref, b_lm_ref)
                logits_ref[...] = jnp.full(logits_ref.shape, s, jnp.float32)

        @pl.when((l == pl.num_programs(0) - 1) & (p == pl.num_programs(1) - 1))
        def _sk_emit():
            # rank-0 reads: a [1,1] vector operand broadcast onto [BK, d]
            # is "broadcast in both sublanes and lanes" — Mosaic rejects it
            # (queue7); a scalar lowers as a splat
            s = m_s[0, 0] + l_s[0, 0] + att_s[0, 0]
            x_out_ref[:] = (x0_ref[:].astype(jnp.float32) + s
                            ).astype(x_out_ref.dtype)

        return

    @pl.when((l == 0) & (p == 0))
    def _load_x():
        x_s[:] = x0_ref[:].astype(jnp.float32)

    # ---------------- self-attention (row chunk × time chunk) ---------------
    @pl.when((l < n_layers) & (p < ns))
    def _self_attn():
        rows = pl.ds(chunk * bkc, bkc)

        @pl.when(tcq == 0)
        def _init_chunk():
            x_in = x_s[rows, :]
            qkv = (jnp.dot(x_in.astype(mm_dtype), w_qkv_ref[0].astype(mm_dtype),
                           preferred_element_type=jnp.float32)
                   + b_qkv_ref[0, 0][None, :])
            q = (qkv[:, :d] * scaling).astype(mm_dtype)
            k_new = qkv[:, d:2 * d].astype(mm_dtype)
            v_new = qkv[:, 2 * d:].astype(mm_dtype)
            q_s[...] = q
            kn_s[...] = k_new
            vn_s[...] = v_new
            if k_new_ref.dtype == jnp.float8_e4m3fn:
                # e4m3 cast overflows to NaN (no saturation); clamp to the
                # fp8 max like the r3 bf16-bias clamp
                k_new_ref[0] = jnp.clip(k_new.astype(jnp.float32),
                                        -448.0, 448.0).astype(k_new_ref.dtype)
                v_new_ref[0] = jnp.clip(v_new.astype(jnp.float32),
                                        -448.0, 448.0).astype(v_new_ref.dtype)
            else:
                k_new_ref[0] = k_new.astype(k_new_ref.dtype)
                v_new_ref[0] = v_new.astype(v_new_ref.dtype)
            snew_s[...] = jnp.dot(q * k_new, sel,
                                  preferred_element_type=jnp.float32)
            m_s[...] = jnp.full((bkc, H), -jnp.inf, jnp.float32)
            l_s[...] = jnp.zeros((bkc, H), jnp.float32)
            att_s[...] = jnp.zeros((bkc, d), jnp.float32)
            pap_s[...] = jnp.zeros((bkc, d), jnp.float32)

        def do_time_chunk(tc, self_k_ref, self_v_ref, anc_ref):
            qm = q_s[...]
            gt = jax.lax.broadcasted_iota(jnp.int32, (tb, bkc, H), 0) + tc * tb
            # Mosaic cannot store at a dynamic sublane index (bf16 packing),
            # so the new token is NOT in the cache; its score/value merge in
            # via masks. Cache row `pos` is exactly zero (zero-init; the
            # outer update writes rows only after the step), so its V-side
            # contribution is tracked separately in pap_s.
            use_v2 = plan.gather_v2 and not no_gather
            if use_v2:
                # ---- v2: deep-K formulation (no [TB,C,C']@[TB,C',D]
                # 40-deep batched gathers). K side: per-head RAW scores
                # S_raw[(t,r), c] = K_raw_h · q_h, beam-aligned by a masked
                # reduce against the transposed ancestry one-hot. V side:
                # contrib_h = (pm expanded over (t,r) ⊙ one-hot) ᵀ· V_raw_h —
                # one K=TB·C'-deep matmul per head.
                # cast BEFORE the reshape: fp8 self-cache blocks convert to
                # mm_dtype first (a no-op when the cache is already bf16)
                K2 = self_k_ref[0].astype(mm_dtype).reshape(tb * bkc, d)
                ancT = ancT_ref[0].astype(jnp.float32)  # [TB, C'(r), C]
                s_heads = []
                for h in range(H):
                    s_raw = jax.lax.dot_general(
                        K2[:, h * hd:(h + 1) * hd],
                        qm[:, h * hd:(h + 1) * hd],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # [TB·C', C]
                    s3 = s_raw.reshape(tb, bkc, bkc)  # [TB, C'(r), C]
                    s_heads.append(jnp.sum(ancT * s3, axis=1))  # [TB, C]
                scores = jnp.stack(s_heads, axis=-1)  # [TB, C, H]
            else:
                # legacy batched one-hot gather (batch dim = t)
                anc = anc_ref[...].astype(mm_dtype)  # [TB, C, C']
                if no_gather:
                    # PROFILING ONLY (wrong numerics): measure gather cost
                    gat = lambda ref: ref[0].astype(mm_dtype)
                else:
                    gat = lambda ref: jax.lax.dot_general(
                        anc, ref[0].astype(mm_dtype),
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32).astype(mm_dtype)
                kg = gat(self_k_ref)  # [TB, C, D]
                prod = qm[None, :, :] * kg  # [TB, C, D]
                scores2 = jnp.dot(prod.reshape(tb * bkc, d), sel,
                                  preferred_element_type=jnp.float32)
                scores = scores2.reshape(tb, bkc, H)
                if self_quant:
                    # int8 self K: scales are per (t, physical row, head) —
                    # ancestry-invariant because a cache row is write-once
                    # (quantize_self_rows). Beam-align the [TB, C', H] scale
                    # block with the SAME chunk-local one-hot as the K/V
                    # gather; a one-hot matmul is an exact selection, and in
                    # f32 the product/accumulate is exact, so the dequant
                    # multiply commutes bit-for-bit with a pre-dequantized
                    # cache (pinned by test_selfkv_int8_exact_on_pow2_scales).
                    ancf = anc_ref[...].astype(jnp.float32)  # [TB, C, C']
                    gsc = lambda ref: jax.lax.dot_general(
                        ancf, ref[0].astype(jnp.float32),
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)  # [TB, C, H]
                    skg = gsc(sk_scale_ref)
                    svs3 = gsc(sv_scale_ref)
                    scores = scores * skg
            scores = jnp.where(gt == pos, snew_s[...][None, :, :],
                               jnp.where(gt < pos, scores, -jnp.inf))
            # online softmax (exact): rescale running stats to the new max
            m_new = jnp.maximum(m_s[...], jnp.max(scores, axis=0))  # [C, H]
            if no_self_sm:
                # PROFILING ONLY (wrong numerics): same shapes/reductions
                # without the exp calls — isolates the self-softmax VPU cost
                alpha = jnp.minimum(m_new - m_s[...], 1.0)
                pm = jnp.maximum(scores - m_new[None, :, :], -1.0) + 2.0
            else:
                alpha = jnp.exp(m_s[...] - m_new)
                pm = jnp.exp(scores - m_new[None, :, :])  # [TB, C, H]
            l_s[...] = alpha * l_s[...] + jnp.sum(pm, axis=0)
            m_s[...] = m_new
            alpha_d = jnp.dot(alpha.astype(mm_dtype), sel.T,
                              preferred_element_type=jnp.float32)  # [C, d]
            if use_v2:
                # cast BEFORE the reshape (same as the K side): fp8 blocks
                # must convert to mm_dtype before the sublane merge
                V2 = self_v_ref[0].astype(mm_dtype).reshape(tb * bkc, d)
                anc2 = anc2_ref[0].astype(mm_dtype)  # [TB·C', C]
                # constant time-expansion one-hot: row (t·C'+r) → t
                rr = jax.lax.broadcasted_iota(jnp.int32, (tb * bkc, tb), 0)
                tt = jax.lax.broadcasted_iota(jnp.int32, (tb * bkc, tb), 1)
                r2 = (rr // bkc == tt).astype(mm_dtype)
                outs = []
                for h in range(H):
                    pm_h = pm[:, :, h].astype(mm_dtype)  # [TB, C]
                    pm_exp = jnp.dot(r2, pm_h,
                                     preferred_element_type=jnp.float32
                                     ).astype(mm_dtype)  # [TB·C', C]
                    pw = pm_exp * anc2
                    outs.append(jax.lax.dot_general(
                        pw, V2[:, h * hd:(h + 1) * hd].astype(mm_dtype),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))  # [C, hd]
                contrib = jnp.concatenate(outs, axis=-1)  # [C, D]
                att_s[...] = alpha_d * att_s[...] + contrib
                pap = jnp.dot(
                    jnp.sum(jnp.where(gt == pos, pm, 0.0), axis=0
                            ).astype(mm_dtype), sel.T,
                    preferred_element_type=jnp.float32)  # [C, d]
                pap_s[...] = alpha_d * pap_s[...] + pap
            else:
                if self_quant:
                    # int8 self V: value contraction is over (t, row), so the
                    # beam-aligned per-(t, row, h) scale folds into the
                    # softmax probabilities — EXCEPT the t == pos slot, whose
                    # V is the full-precision scratch vn_s (cache row pos is
                    # zeros; pap_s tracks it). The softmax stats (l_s, line
                    # above) already consumed the unscaled pm — scaling here
                    # touches values only.
                    pm = jnp.where(gt == pos, pm, pm * svs3)
                p_exp = jnp.dot(pm.reshape(tb * bkc, H).astype(mm_dtype), sel.T,
                                preferred_element_type=jnp.float32
                                ).astype(mm_dtype).reshape(tb, bkc, d)
                vg = gat(self_v_ref)
                contrib = jnp.sum(p_exp.astype(jnp.float32) * vg.astype(jnp.float32),
                                  axis=0)
                att_s[...] = alpha_d * att_s[...] + contrib
                gt_d = jax.lax.broadcasted_iota(jnp.int32, (tb, bkc, d), 0) + tc * tb
                pap = jnp.sum(jnp.where(gt_d == pos, p_exp.astype(jnp.float32), 0.0),
                              axis=0)
                pap_s[...] = alpha_d * pap_s[...] + pap

        # one (t_fuse == 1) or two (t_fuse == 2) time chunks per grid step;
        # the fused sub-chunk reads its OWN window operands (even/odd split
        # preserves per-chunk pos-elision) and runs strictly after the
        # first — the online-softmax update order is unchanged.
        @pl.when(tc <= last_tc)
        def _sub0():
            do_time_chunk(tc, self_k_ref, self_v_ref, anc_ref)

        if plan.t_fuse == 2:
            @pl.when(tc + 1 <= last_tc)
            def _sub1():
                do_time_chunk(tc + 1, self_k2_ref, self_v2_ref, anc_b_ref)

        @pl.when(tcq == last_tcq)
        def _finish_chunk():
            l_d = jnp.dot(l_s[...].astype(mm_dtype), sel.T,
                          preferred_element_type=jnp.float32)  # [C, d]
            o = (att_s[...] + pap_s[...] * vn_s[...].astype(jnp.float32)) / l_d
            o = (jnp.dot(o.astype(mm_dtype), w_so_ref[0].astype(mm_dtype),
                         preferred_element_type=jnp.float32)
                 + b_so_ref[0, 0][None, :])
            x1_s[rows, :] = ln(ln_s_ref, x_s[rows, :] + o)

    # ---------------- cross-attention batch chunk ---------------------------
    @pl.when((l < n_layers) & (p >= ns) & (p < ns + plan.n_cross))
    def _cross_attn():
        rows = pl.ds((p - ns) * bc * beams, bc * beams)
        x_in = x1_s[rows, :]
        q = (jnp.dot(x_in.astype(mm_dtype), w_cq_ref[0].astype(mm_dtype),
                     preferred_element_type=jnp.float32) + b_cq_ref[0, 0][None, :])
        q = (q * scaling).astype(mm_dtype)
        # Mosaic constraints shape this block: no lane-splitting reshapes
        # ([R, D]→[..., H, hd]), one batch dim per matmul, and sublane splits
        # only when the new second-to-last dim is 8-aligned — beams=5 is not.
        # So: (1) pad the beam rows 5→KP=8 with a constant 0/1 expansion
        # MATMUL (E @ q — VMEM-only, trivial FLOPs), making [BC, KP, ·]
        # splits legal; (2) loop heads statically over lane slices with one
        # batched matmul per head. KV traffic is unchanged: each head block
        # is read once.
        # 8-aligned beam-pad width; generalizes past the released beam 5
        # (beams > 8 previously fell outside the hardcoded kp=8 selector and
        # beams 8..K-1 silently decoded with zeroed cross-attention)
        kp = -(-beams // 8) * 8
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (bc * kp, bc * beams), 0)
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (bc * kp, bc * beams), 1)
        expand = ((c_ids == (r_ids // kp) * beams + r_ids % kp)
                  & (r_ids % kp < beams)).astype(mm_dtype)
        q_pad = jnp.dot(expand, q, preferred_element_type=jnp.float32
                        ).astype(mm_dtype)  # [BC*KP, d]
        bias = enc_bias_ref[:, :][:, None, :]  # [BC, 1, S]
        outs = []
        for h in range(H):
            q_h = q_pad[:, h * hd:(h + 1) * hd].reshape(bc, kp, hd)
            if quant:
                # int8 K: per-(B, H, hd) scale folds into q BEFORE the score
                # contraction (over hd) — dequant costs one tiny VPU multiply
                q_h = (q_h.astype(jnp.float32)
                       * ck_scale_ref[0, :, h, :][:, None, :]).astype(mm_dtype)
            k_h = cross_k_ref[0, :, h].astype(mm_dtype)  # [BC, hd, S]
            s_h = jax.lax.dot_general(
                q_h, k_h, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) + bias  # [BC, KP, S]
            if no_cross_sm:
                # PROFILING ONLY (wrong numerics): linear pseudo-normalizer
                # with the same shape/dtype flow — isolates the f32 exp/div
                # VPU cost of the cross softmax
                p_h = (s_h * (1.0 / S)).astype(mm_dtype)
            else:
                p_h = jax.nn.softmax(s_h, axis=-1).astype(mm_dtype)
            o_h = jax.lax.dot_general(
                p_h, cross_v_ref[0, :, h].astype(mm_dtype),
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # [BC, KP, hd]
            if quant:
                # int8 V: the value contraction is over S, so the scale
                # applies AFTER the matmul, per output channel
                o_h = o_h * cv_scale_ref[0, :, h, :][:, None, :]
            outs.append(o_h)
        o_pad = jnp.concatenate(outs, axis=-1).reshape(bc * kp, d)  # merge ok
        # unpad KP→beams with the transposed selector
        o = jnp.dot(expand.T, o_pad.astype(mm_dtype),
                    preferred_element_type=jnp.float32)  # [BC*beams, d]
        o = (jnp.dot(o.astype(mm_dtype), w_co_ref[0].astype(mm_dtype),
                     preferred_element_type=jnp.float32) + b_co_ref[0, 0][None, :])
        # overwrite x1 in place with the post-cross state (next phase group
        # reads x1 as FFN input)
        x1_s[rows, :] = ln(ln_c_ref, x_in + o)

    # ---------------- FFN ----------------------------------------------------
    if plan.ffn_shadow:
        # FFN-in-fetch-shadow: one (row chunk, column chunk) job per cross/
        # tail phase, scheduled at m = j·stride + 2 so every job runs
        # strictly after the cross phases that write its rows' x1 (the
        # caller asserts the schedule's dependency condition). The ~10 us
        # of MXU work per job hides under that phase's cross-KV window
        # fetch instead of serializing in dedicated compute-only phases.
        n_jobs = plan.n_self * plan.n_ffn
        stride = plan.ffn_stride
        m = p - ns
        jj = (m - 2) // stride
        job_ok = (m >= 2) & (jj >= 0) & (jj < n_jobs)
        if stride > 1:
            job_ok = job_ok & ((m - 2) % stride == 0)

        @pl.when((l < n_layers) & job_ok)
        def _ffn_job():
            jc = jj // plan.n_ffn
            f = jj % plan.n_ffn
            rows = pl.ds(jc * bkc, bkc)
            x_in = x1_s[rows, :].astype(mm_dtype)
            h = act(jnp.dot(x_in, w_fc1_ref[0].astype(mm_dtype),
                            preferred_element_type=jnp.float32)
                    + b_fc1_ref[0, 0][None, :]).astype(mm_dtype)
            delta = jnp.dot(h, w_fc2_ref[0].astype(mm_dtype),
                            preferred_element_type=jnp.float32)

            @pl.when(f == 0)
            def _init():
                acc_s[...] = delta

            @pl.when(f > 0)
            def _acc():
                acc_s[...] = acc_s[...] + delta

            @pl.when(f == plan.n_ffn - 1)
            def _finish():
                x_s[rows, :] = ln(ln_f_ref, x1_s[rows, :] + acc_s[...]
                                  + b_fc2_ref[0, 0][None, :])

                @pl.when(l == n_layers - 1)
                def _emit():
                    x_out_ref[rows, :] = x_s[rows, :].astype(x_out_ref.dtype)
    else:
        # dedicated FFN column-chunk phases at the end of each layer.
        # upper bound matters: when n_lm pads plan.phases past the body
        # phases, an unbounded guard would re-run the last FFN chunk on
        # every pad phase
        @pl.when((l < n_layers) & (p >= ns + plan.n_cross)
                 & (p < ns + plan.n_cross + plan.n_ffn))
        def _ffn():
            f = p - ns - plan.n_cross
            x_in = x1_s[:].astype(mm_dtype)
            h = act(jnp.dot(x_in, w_fc1_ref[0].astype(mm_dtype),
                            preferred_element_type=jnp.float32)
                    + b_fc1_ref[0, 0][None, :]).astype(mm_dtype)
            delta = jnp.dot(h, w_fc2_ref[0].astype(mm_dtype),
                            preferred_element_type=jnp.float32)

            @pl.when(f == 0)
            def _init():
                acc_s[:] = delta

            @pl.when(f > 0)
            def _acc():
                acc_s[:] = acc_s[:] + delta

            @pl.when(f == plan.n_ffn - 1)
            def _finish():
                x_s[:] = ln(ln_f_ref,
                            x1_s[:] + acc_s[:] + b_fc2_ref[0, 0][None, :])

                @pl.when(l == n_layers - 1)
                def _emit():
                    x_out_ref[:] = x_s[:].astype(x_out_ref.dtype)

    # ---------------- LM head (extra grid iteration, vocab chunks) ----------
    # Optional: the tied-embedding matmul streamed through the same pipeline.
    # Default OFF — see ChunkPlan.n_lm.
    if use_lm:
        @pl.when((l == n_layers) & (p < plan.n_lm))
        def _lm_head():
            logits = jax.lax.dot_general(
                x_s[:].astype(mm_dtype), w_lm_ref[...].astype(mm_dtype),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [BK, VB]
            logits_ref[...] = logits + b_lm_ref[0][None, :]


def decode_stack(
    dp,                # infer.decode_fast.DecodeParams (stacked [L, ...])
    x0: jax.Array,     # [BK, d] bf16 — embedded+LN'd token
    pos: jax.Array,    # scalar int32
    self_k: jax.Array,  # [L, T, BK, D] bf16, T % 16 == 0 — raw, unreordered
    self_v: jax.Array,
    anc_hot: jax.Array,  # [T, BK, BKC] one-hot of the ancestry matrix, chunk-local
    cross_k: jax.Array,  # [L, B, H, hd, S] bf16 — or int8 (with scales below)
    cross_v: jax.Array,
    enc_bias: jax.Array,  # [B, S] f32 additive pad bias
    w_lm: jax.Array,   # [Vp, d] bf16 — tied LM head, vocab padded to n_lm·128k
    b_lm: jax.Array,   # [1, Vp] f32 — final_logits_bias (pad entries -1e9)
    cfg: BartConfig,
    plan: ChunkPlan = ChunkPlan(),
    interpret: bool = False,
    cross_k_scale: jax.Array | None = None,  # [L, B, H, hd] f32 (int8 cross-KV)
    cross_v_scale: jax.Array | None = None,
    self_k_scale: jax.Array | None = None,  # [L, T, BK, H] f32 (int8 self cache)
    self_v_scale: jax.Array | None = None,
):
    """→ (logits [BK, Vp] f32, x_out [BK, d], k_new [L, BK, D], v_new [L, BK, D]).

    The caller writes k_new/v_new into the HBM caches at time row `pos`
    (a [L,1,BK,D] dynamic_update_slice); beam reorders only recompose the
    ancestry matrix (infer/decode_fast.reorder_anc) — the cache itself is
    write-once per row. The LM head runs as an extra grid iteration so its
    ~103 MB weight stream overlaps the last layer's phases.
    """
    L, T, bk, d = self_k.shape
    B = cross_k.shape[1]
    H, hd, S = cross_k.shape[2], cross_k.shape[3], cross_k.shape[4]
    beams = bk // B
    if T % plan.n_t:  # T must split evenly into time chunks
        import warnings

        warnings.warn(
            f"decode_stack: plan.n_t={plan.n_t} does not divide T={T}; "
            "running with n_t=1 — sweep records labeled with the requested "
            "plan would be wrong (use a divisor of T)",
            stacklevel=2,
        )
        plan = plan._replace(n_t=1, t_fuse=1)
    n_t = plan.n_t
    tb = T // n_t
    fc = dp.w_fc1.shape[2] // plan.n_ffn
    bkc = bk // plan.n_self
    bc = B // plan.n_cross
    use_lm = plan.n_lm > 0
    if not use_lm:
        # LM head stays in XLA: tiny dummies keep the kernel signature fixed
        w_lm = jnp.zeros((128, d), self_k.dtype)
        b_lm = jnp.zeros((1, 128), jnp.float32)
    vp = w_lm.shape[0]
    vb = vp // plan.n_lm if use_lm else 128
    quant = cross_k_scale is not None
    if not quant:
        # bf16 path: tiny dummies with a constant index map — fetched once,
        # never read by the kernel (same pattern as the LM-head dummies)
        cross_k_scale = jnp.zeros((1, 1, 1, hd), jnp.float32)
        cross_v_scale = jnp.zeros((1, 1, 1, hd), jnp.float32)
    self_quant = self_k_scale is not None
    assert self_quant == (self_k.dtype == jnp.int8), \
        "int8 self cache and per-row scales must travel together"
    if self_quant:
        assert self_k_scale.shape == (L, T, bk, H), \
            f"per-row self scales must be [L, T, BK, H], got {self_k_scale.shape}"
    # the deep-K v2 formulation is measured-slower inventory (docs/
    # decode_budget.md); the int8 dequant folds are only built for the
    # default legacy gather path
    assert not (self_quant and plan.gather_v2)
    if not self_quant:
        self_k_scale = jnp.zeros((1, 1, 1, H), jnp.float32)
        self_v_scale = jnp.zeros((1, 1, 1, H), jnp.float32)
    bkc_ = bk // plan.n_self
    if plan.gather_v2:
        # derived ancestry layouts for the deep-K formulation (cheap XLA
        # transposes of the 3.3 MB one-hot); the legacy anc input becomes a
        # dummy. Chunk-leading axes keep the BLOCK's last two dims full
        # (Mosaic requires 8/128-mult or whole-dim blocks).
        a4 = anc_hot.reshape(T, plan.n_self, bkc_, bkc_)  # [T, chunk, C, C']
        ancT = a4.transpose(1, 0, 3, 2)                   # [chunk, T, C', C]
        anc2 = ancT.reshape(plan.n_self, T * bkc_, bkc_)  # [chunk, (t,r), C]
        anc_in = jnp.zeros((1, 1, 128), anc_hot.dtype)
    else:
        ancT = jnp.zeros((1, 1, 8, 128), anc_hot.dtype)
        anc2 = jnp.zeros((1, 8, 128), anc_hot.dtype)
        anc_in = anc_hot
    assert bk % plan.n_self == 0 and B % plan.n_cross == 0 and T % n_t == 0
    # row chunks must hold whole beam groups: ancestry stays chunk-local
    assert bkc % beams == 0 and anc_hot.shape == (T, bk, bkc)
    # T only needs to split into n_t whole chunks: tb is always a LEADING
    # block dim, and the in-kernel sublane merges/splits ([tb, bkc, d] <->
    # [tb*bkc, d]) are legal from bkc % 8 alone (choose_plan enforces that
    # for Mosaic shapes; interpret-mode tiny configs run with bkc < 8).
    # The old T % 16 was r2-era conservatism; relaxing to %4 lets
    # max_length 50 pad to T=52 instead of 64 — −19% self-cache storage,
    # the last 210 MB of the b512 HBM gap (VACNIC_CACHE_PAD_PALLAS=4).
    assert dp.w_fc1.shape[2] % plan.n_ffn == 0 and T % 4 == 0
    assert not use_lm or (vp % plan.n_lm == 0 and b_lm.shape == (1, vp))
    tf = plan.t_fuse
    assert tf in (1, 2) and n_t % tf == 0, f"t_fuse={tf} needs n_t % t_fuse == 0"
    # the fused odd-chunk operands are only built for the default path
    assert tf == 1 or not (self_quant or plan.gather_v2), \
        "t_fuse=2 is not built for int8 self-KV or gather_v2"

    n_self, n_cross = plan.n_self, plan.n_cross
    n_tp = plan.n_t_phases
    ns = n_self * n_tp

    # All per-layer block indices clamp l to the last real layer: the extra
    # LM-head iteration (l == L) must not walk indices around (a changed
    # block index would trigger a pointless re-fetch).
    def c(*idx):  # per-layer block, layer-constant chunk index
        return lambda l, p, pos_ref: (jnp.minimum(l, L - 1), *idx)

    def self_chunk(l, p, pos_ref):
        return jnp.where(l >= L, n_self - 1, jnp.clip(p // n_tp, 0, n_self - 1))

    def self_tc(l, p, pos_ref):
        # time chunks beyond the decoded prefix map to the last needed chunk:
        # consecutive identical block indices are not re-fetched, so the
        # skipped chunks cost no HBM traffic. With t_fuse this operand
        # carries the EVEN chunks (tc = tf*q).
        last = pos_ref[0] // tb
        lastq = last // tf
        return jnp.where((p >= ns) | (l >= L), tf * lastq,
                         tf * jnp.minimum(p % n_tp, lastq))

    def self_tc_b(l, p, pos_ref):
        # ODD-chunk operand (t_fuse == 2 only): B(q) = 2*min(q, lqb) + 1
        # where lqb indexes the last needed odd chunk. While last == 0 this
        # fetches chunk 1 unused (elided thereafter) — the documented
        # early-step waste of the fusion.
        last = pos_ref[0] // tb
        lqb = jnp.maximum(last - 1, 0) // 2
        return jnp.where((p >= ns) | (l >= L), 2 * lqb + 1,
                         2 * jnp.minimum(p % n_tp, lqb) + 1)

    def self_cache_idx(l, p, pos_ref):
        return (jnp.minimum(l, L - 1), self_tc(l, p, pos_ref),
                self_chunk(l, p, pos_ref), 0)

    def self_cache_idx_b(l, p, pos_ref):
        return (jnp.minimum(l, L - 1), self_tc_b(l, p, pos_ref),
                self_chunk(l, p, pos_ref), 0)

    def anc_idx(l, p, pos_ref):
        return (self_tc(l, p, pos_ref), self_chunk(l, p, pos_ref), 0)

    def anc_idx_b(l, p, pos_ref):
        return (self_tc_b(l, p, pos_ref), self_chunk(l, p, pos_ref), 0)

    def cross_j(l, p, pos_ref):
        return jnp.where(l >= L, n_cross - 1, jnp.clip(p - ns, 0, n_cross - 1))

    if plan.ffn_shadow:
        # dependency condition of the shadow schedule: job j for row chunk c
        # (at phase m = j*stride + 2) must run strictly after the last cross
        # phase writing chunk c's x1 rows. Holds for every default plan
        # (n_cross/n_self == 2 == n_ffn); reject other geometries loudly
        # rather than decode garbage.
        rows_per_cross = bc * beams
        for c_ in range(plan.n_self):
            m_prod = -(-(c_ + 1) * bkc // rows_per_cross) - 1
            m_job = c_ * plan.n_ffn * plan.ffn_stride + 2
            assert m_job > m_prod, (
                f"ffn_shadow schedule violates x1 dependency for chunk {c_} "
                f"(job phase {m_job} <= producer phase {m_prod}); use the "
                f"default plan geometry or disable ffn_shadow")

    def ffn_j(l, p, pos_ref):
        if plan.ffn_shadow:
            jj = jnp.clip((p - ns - 2) // plan.ffn_stride, 0,
                          plan.n_self * plan.n_ffn - 1)
            return jnp.where(l >= L, plan.n_ffn - 1,
                             jnp.clip(jj % plan.n_ffn, 0, plan.n_ffn - 1))
        return jnp.where(l >= L, plan.n_ffn - 1,
                         jnp.clip(p - ns - n_cross, 0, plan.n_ffn - 1))

    def lm_j(l, p, pos_ref):
        return jnp.where(l >= L, jnp.clip(p, 0, plan.n_lm - 1), 0)

    grid = (L + 1 if use_lm else L, plan.phases)
    specs = [
        pl.BlockSpec((bk, d), lambda l, p, pos_ref: (0, 0)),                 # x0
        pl.BlockSpec((1, d, 3 * d), c(0, 0)),                                # w_qkv
        pl.BlockSpec((1, 1, 3 * d), c(0, 0)),                                # b_qkv
        pl.BlockSpec((1, d, d), c(0, 0)),                                    # w_so
        pl.BlockSpec((1, 1, d), c(0, 0)),                                    # b_so
        pl.BlockSpec((1, 2, d), c(0, 0)),                                    # ln_s
        pl.BlockSpec((1, d, d), c(0, 0)),                                    # w_cq
        pl.BlockSpec((1, 1, d), c(0, 0)),                                    # b_cq
        pl.BlockSpec((1, d, d), c(0, 0)),                                    # w_co
        pl.BlockSpec((1, 1, d), c(0, 0)),                                    # b_co
        pl.BlockSpec((1, 2, d), c(0, 0)),                                    # ln_c
        pl.BlockSpec((1, d, fc),
                     lambda l, p, pos_ref: (jnp.minimum(l, L - 1), 0, ffn_j(l, p, pos_ref))),
        pl.BlockSpec((1, 1, fc),
                     lambda l, p, pos_ref: (jnp.minimum(l, L - 1), 0, ffn_j(l, p, pos_ref))),
        pl.BlockSpec((1, fc, d),
                     lambda l, p, pos_ref: (jnp.minimum(l, L - 1), ffn_j(l, p, pos_ref), 0)),
        pl.BlockSpec((1, 1, d), c(0, 0)),                                    # b_fc2
        pl.BlockSpec((1, 2, d), c(0, 0)),                                    # ln_f
        pl.BlockSpec((1, tb, bkc, d), self_cache_idx),                       # self_k
        pl.BlockSpec((1, tb, bkc, d), self_cache_idx),                       # self_v
        (pl.BlockSpec((1, tb, bkc, H), self_cache_idx)
         if self_quant else
         pl.BlockSpec((1, 1, 1, H), lambda l, p, pos_ref: (0, 0, 0, 0))),    # sk_scale
        (pl.BlockSpec((1, tb, bkc, H), self_cache_idx)
         if self_quant else
         pl.BlockSpec((1, 1, 1, H), lambda l, p, pos_ref: (0, 0, 0, 0))),    # sv_scale
        (pl.BlockSpec((1, 1, 128), lambda l, p, pos_ref: (0, 0, 0))
         if plan.gather_v2 else
         pl.BlockSpec((tb, bkc, bkc), anc_idx)),                             # anc_hot
        (pl.BlockSpec((1, tb, bkc, d), self_cache_idx_b)
         if tf == 2 else
         pl.BlockSpec((1, 1, 8, 128), lambda l, p, pos_ref: (0, 0, 0, 0))),  # self_k2
        (pl.BlockSpec((1, tb, bkc, d), self_cache_idx_b)
         if tf == 2 else
         pl.BlockSpec((1, 1, 8, 128), lambda l, p, pos_ref: (0, 0, 0, 0))),  # self_v2
        (pl.BlockSpec((tb, bkc, bkc), anc_idx_b)
         if tf == 2 else
         pl.BlockSpec((1, 8, 128), lambda l, p, pos_ref: (0, 0, 0))),        # anc_b
        (pl.BlockSpec((1, tb, bkc, bkc),
                      lambda l, p, pos_ref: (self_chunk(l, p, pos_ref),
                                             self_tc(l, p, pos_ref), 0, 0))
         if plan.gather_v2 else
         pl.BlockSpec((1, 1, 8, 128), lambda l, p, pos_ref: (0, 0, 0, 0))),  # ancT
        (pl.BlockSpec((1, tb * bkc, bkc),
                      lambda l, p, pos_ref: (self_chunk(l, p, pos_ref),
                                             self_tc(l, p, pos_ref), 0))
         if plan.gather_v2 else
         pl.BlockSpec((1, 8, 128), lambda l, p, pos_ref: (0, 0, 0))),        # anc2
        pl.BlockSpec((1, bc, H, hd, S),
                     lambda l, p, pos_ref: (jnp.minimum(l, L - 1), cross_j(l, p, pos_ref), 0, 0, 0)),
        pl.BlockSpec((1, bc, H, hd, S),
                     lambda l, p, pos_ref: (jnp.minimum(l, L - 1), cross_j(l, p, pos_ref), 0, 0, 0)),
        (pl.BlockSpec((1, bc, H, hd),
                      lambda l, p, pos_ref: (jnp.minimum(l, L - 1), cross_j(l, p, pos_ref), 0, 0))
         if quant else
         pl.BlockSpec((1, 1, 1, hd), lambda l, p, pos_ref: (0, 0, 0, 0))),   # ck_scale
        (pl.BlockSpec((1, bc, H, hd),
                      lambda l, p, pos_ref: (jnp.minimum(l, L - 1), cross_j(l, p, pos_ref), 0, 0))
         if quant else
         pl.BlockSpec((1, 1, 1, hd), lambda l, p, pos_ref: (0, 0, 0, 0))),   # cv_scale
        pl.BlockSpec((bc, S),
                     lambda l, p, pos_ref: (cross_j(l, p, pos_ref), 0)),     # enc_bias
        pl.BlockSpec((vb, d), lambda l, p, pos_ref: (lm_j(l, p, pos_ref), 0)),  # w_lm
        pl.BlockSpec((1, vb), lambda l, p, pos_ref: (0, lm_j(l, p, pos_ref))),  # b_lm
    ]
    out_specs = [
        pl.BlockSpec((bk, d), lambda l, p, pos_ref: (0, 0)),                 # x_out
        pl.BlockSpec((1, bkc, d),
                     lambda l, p, pos_ref: (jnp.minimum(l, L - 1), self_chunk(l, p, pos_ref), 0)),
        pl.BlockSpec((1, bkc, d),
                     lambda l, p, pos_ref: (jnp.minimum(l, L - 1), self_chunk(l, p, pos_ref), 0)),
        pl.BlockSpec((bk, vb), lambda l, p, pos_ref: (0, lm_j(l, p, pos_ref))),  # logits
    ]
    # int8 self cache: the kernel still emits FULL-PRECISION new rows (the
    # in-step mask-merge reads them from scratch at full precision anyway);
    # the caller quantizes at the cache-row write (quantize_self_rows)
    row_dtype = x0.dtype if self_quant else self_k.dtype
    out_shape = [
        jax.ShapeDtypeStruct((bk, d), x0.dtype),
        jax.ShapeDtypeStruct((L, bk, d), row_dtype),
        jax.ShapeDtypeStruct((L, bk, d), row_dtype),
        jax.ShapeDtypeStruct((bk, vp), jnp.float32),
    ]
    # pallas interpret mode on CPU lacks bf16xbf16=f32 dot thunks
    mm_dtype = jnp.float32 if interpret else jnp.bfloat16
    kernel = functools.partial(
        _kernel, plan=plan, cfg_heads=H, cfg_hd=hd, beams=beams,
        act_name=cfg.activation_function, mm_dtype=mm_dtype, quant=quant,
        self_quant=self_quant,
        no_gather=os.environ.get("VACNIC_KERNEL_NOGATHER") == "1",
        no_cross_sm=os.environ.get("VACNIC_KERNEL_NOCROSSSM") == "1",
        no_self_sm=os.environ.get("VACNIC_KERNEL_NOSELFSM") == "1",
        skeleton=os.environ.get("VACNIC_KERNEL_SKELETON") == "1")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),    # x_s
            pltpu.VMEM((bk, d), jnp.float32),    # x1_s
            # shadow FFN accumulates one row chunk at a time (jobs for a
            # chunk are consecutive) — bkc rows instead of bk saves ~5 MB
            pltpu.VMEM((bkc if plan.ffn_shadow else bk, d), jnp.float32),
            pltpu.VMEM((bkc, d), mm_dtype),      # q_s
            pltpu.VMEM((bkc, d), mm_dtype),      # kn_s
            pltpu.VMEM((bkc, d), mm_dtype),      # vn_s
            pltpu.VMEM((bkc, H), jnp.float32),   # snew_s
            pltpu.VMEM((bkc, H), jnp.float32),   # m_s
            pltpu.VMEM((bkc, H), jnp.float32),   # l_s
            pltpu.VMEM((bkc, d), jnp.float32),   # att_s
            pltpu.VMEM((bkc, d), jnp.float32),   # pap_s
        ],
    )
    x_out, k_new, v_new, logits = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=plan.vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(
        pos.reshape(1).astype(jnp.int32), x0,
        dp.w_qkv, dp.b_qkv[:, None, :], dp.w_self_out,
        dp.b_self_out[:, None, :], dp.ln_self,
        dp.w_cross_q, dp.b_cross_q[:, None, :], dp.w_cross_out,
        dp.b_cross_out[:, None, :], dp.ln_cross,
        dp.w_fc1, dp.b_fc1[:, None, :], dp.w_fc2, dp.b_fc2[:, None, :],
        dp.ln_final,
        self_k, self_v, self_k_scale, self_v_scale, anc_in,
        # fused odd-chunk operands view the SAME arrays (even/odd split
        # happens in the index maps); tiny dummies when t_fuse == 1
        self_k if tf == 2 else jnp.zeros((1, 1, 8, 128), self_k.dtype),
        self_v if tf == 2 else jnp.zeros((1, 1, 8, 128), self_v.dtype),
        anc_in if tf == 2 else jnp.zeros((1, 8, 128), anc_hot.dtype),
        ancT, anc2, cross_k, cross_v,
        cross_k_scale, cross_v_scale, enc_bias, w_lm, b_lm,
    )
    return logits, x_out, k_new, v_new
