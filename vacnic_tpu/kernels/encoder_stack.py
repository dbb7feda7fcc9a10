"""Fused multimodal-encoder text stack: all encoder layers' TEXT path in one
Pallas kernel (inference).

Why (docs/ARCHITECTURE.md round-3 note): at batch 32 / S=512 the XLA encoder
measures 109.2 ms vs a ~57 ms matmul roofline, and the gap lives in the
vanilla transformer path (text-only = 85.0 ms) — ~10 inter-op HBM round
trips per layer for scores/probs/FFN intermediates/LN islands. Flash
attention alone LOSES to XLA here (130.0 ms measured), so the win has to
come from keeping the whole [B, S, d] activation VMEM-RESIDENT across all
layers and phases (33.5 MB at batch 32 — the decode kernel's carried-scratch
pattern, scaled up). x streams in per-chunk at layer 0 and out per-chunk at
the last layer; everything between lives in the scratch.

Key structural fact that makes this possible: the fusion streams
(img/face/ner) evolve INDEPENDENTLY of the text states (models/fusion.py
fusion_encoder_layer_fwd computes them only from each other), so the caller
precomputes, per layer, the cross-attention K/V over the multimodal prompt
(kv_l = concat(img_l, ner_prefix_l), already projected through the layer's
cross k/v weights, K pre-transposed to the lane-aligned [d, KV] layout) and
the kernel consumes them like the decode kernel's beam-invariant cross K/V.
Supported configs: add_ner_ffn=True (released run_full_train.sh config) and
only_image — the add_ner_ffn=False variant puts x itself in the KV and
stays on the XLA path.

Grid = (layer, phases): NS batch-chunk attention phases (self-attention with
per-head full-S scores — S=512 fits VMEM per chunk — then cross-attention to
the tiny KV, with their layernorms), then NS×NF FFN phases (row chunk ×
fc column chunk, f32 accumulator scratch).

Mosaic gotcha encoded here (isolated with scripts/mosaic_probe.py): adding a
[BC, 1, S] bias to [BC, S, S] scores — a middle-dim sublane broadcast with a
small outer batch — crashes Mosaic's lowering ("limits 64 vs 1" internal
check; both contraction orders compile fine). The self-attn pad bias
therefore enters as the raw [B, S] array (whole-array block, fetched once)
and is expanded to one row per query token IN-KERNEL via a one-hot matmul,
then added to the scores reshaped to [BC·S, S]; the cross bias is
structurally zero in the supported configs (the img+ner mask is all-ones)
and is not added at all.

Numerics: bf16 matmuls with f32 accumulation, f32 layernorms/softmax —
identical recipe to models/layers.attention_core; parity pinned in
tests/test_encoder_stack.py (interpret mode) and on-chip via
scripts/bench_encoder_parts.py ENC_MODE=fusedparity.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vacnic_tpu.core.config import BartConfig
from vacnic_tpu.kernels.mosaic_math import mosaic_act


class EncPlan(NamedTuple):
    n_self: int = 16   # batch chunks for the attention phases (bc=2 at batch
                       # 32: n_self=8 exceeded VMEM capacity by 9.3M)
    n_ffn: int = 1     # fc1/fc2 column chunks (full-width blocks measured
                       # 90.1 ms vs 102.1 at n_ffn=2 — fewer phases win)
    vmem_mb: int = 121
    # debug bisect switch: comma-set of {"self", "cross", "ffn"} to compile
    # only some sub-blocks (results are wrong unless all are on)
    parts: str = "self,cross,ffn"
    # merged phases: run self+cross+FFN for a batch chunk in ONE grid step
    # (full-width FFN blocks; n_ffn forced to 1). Halves the grid-step count
    # (384 -> 192 at b32/L12) — the r3 bisect attributed ~30 ms of the 90 ms
    # kernel to phase-count-proportional overhead (~80 us/step), so fewer,
    # fatter phases is the lever.
    fuse_ffn: bool = False

    @property
    def phases(self) -> int:
        if self.fuse_ffn:
            return self.n_self
        return self.n_self + self.n_self * self.n_ffn


class EncStackParams(NamedTuple):
    """Stacked per-layer TEXT-path weights [L, ...] (streams stay in XLA)."""

    w_qkv: jax.Array      # [L, d, 3d] self-attn fused q|k|v
    b_qkv: jax.Array      # [L, 1, 3d] f32
    w_so: jax.Array       # [L, d, d]
    b_so: jax.Array       # [L, 1, d] f32
    ln_s: jax.Array       # [L, 2, d] f32 (self_attn_layer_norm)
    w_cq: jax.Array       # [L, d, d] cross q
    b_cq: jax.Array       # [L, 1, d] f32
    w_co: jax.Array       # [L, d, d] cross out
    b_co: jax.Array       # [L, 1, d] f32
    ln_c: jax.Array       # [L, 2, d] f32 (img_ner_attn_layer_norm)
    w_fc1: jax.Array      # [L, d, F]
    b_fc1: jax.Array      # [L, 1, F] f32
    w_fc2: jax.Array      # [L, F, d]
    b_fc2: jax.Array      # [L, 1, d] f32
    ln_f: jax.Array       # [L, 2, d] f32 (final_layer_norm)


def _kernel(
    x0_ref,        # [RPC, d] — chunk of the embedded tokens (read at layer 0)
    w_qkv_ref, b_qkv_ref, w_so_ref, b_so_ref, ln_s_ref,
    w_cq_ref, b_cq_ref, w_co_ref, b_co_ref, ln_c_ref,
    w_fc1_ref,     # [1, d, FC] column chunk
    b_fc1_ref,     # [1, 1, FC]
    w_fc2_ref,     # [1, FC, d]
    b_fc2_ref, ln_f_ref,
    ck_ref,        # [1, BC, d, KV] bf16 — per-layer cross K, PRE-TRANSPOSED
    cv_ref,        # [1, BC, KV, d] bf16
    sbias_ref,     # [B, S] f32 — per-item additive pad bias (whole array)
    x_out_ref,     # [RPC, d] — chunk of the output (written at last layer)
    x_s,           # [B*S, d] scratch — resident activations
    acc_s,         # [RPC, d] f32 scratch — FFN column accumulator
    *,
    plan: EncPlan,
    n_layers: int,
    batch: int,
    seq: int,
    heads: int,
    hd: int,
    act_name: str,
    mm_dtype=jnp.bfloat16,
):
    l = pl.program_id(0)
    p = pl.program_id(1)
    ns = plan.n_self
    nf = plan.n_ffn
    bs, d = x_s.shape
    bc = batch // ns          # batch items per attention chunk
    rows_per = bc * seq
    scaling = hd**-0.5

    # exact gelu via the shared Mosaic-safe rational erf (mosaic_math)
    act = mosaic_act(act_name)

    def ln(ref, v):
        g, b = ref[0, 0, :], ref[0, 1, :]
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(v - mu), axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + 1e-5) * g[None, :] + b[None, :]

    do_self = "self" in plan.parts
    do_cross = "cross" in plan.parts
    do_ffn = "ffn" in plan.parts

    # ------------- attention phase: one batch chunk, self + cross -----------
    @pl.when(p < ns)
    def _attn():
        rows = pl.ds(p * rows_per, rows_per)

        @pl.when(l == 0)
        def _load():
            x_s[rows, :] = x0_ref[...].astype(x_s.dtype)

        x_in = x_s[rows, :].astype(jnp.float32)
        x1 = x_in
        if do_self:
            qkv = (jnp.dot(x_in.astype(mm_dtype), w_qkv_ref[0].astype(mm_dtype),
                           preferred_element_type=jnp.float32)
                   + b_qkv_ref[0, 0][None, :]).astype(mm_dtype)
            # Expand the per-item [B, S] pad bias to one row per query token
            # of THIS chunk via a one-hot MATMUL (E[r, i] = 1 iff the chunk's
            # item p·bc + r//S == i): the direct [BC, 1, S] broadcast-add
            # crashes Mosaic (module docstring) and the old pre-expanded
            # [B·S, S] operand cost 134 MB HBM at b128 plus a per-layer
            # refetch. The [B, S] block is whole-array (Mosaic needs sublane
            # dims of 8+ or full) and fetched once.
            r_ids = jax.lax.broadcasted_iota(jnp.int32, (rows_per, batch), 0)
            i_ids = jax.lax.broadcasted_iota(jnp.int32, (rows_per, batch), 1)
            expand = (p * bc + r_ids // seq == i_ids).astype(mm_dtype)
            sb2 = jnp.dot(expand, sbias_ref[...].astype(mm_dtype),
                          preferred_element_type=jnp.float32)  # [RPC, S]
            outs = []
            for h in range(heads):
                q_h = (qkv[:, h * hd:(h + 1) * hd] * scaling).reshape(bc, seq, hd)
                k_h = qkv[:, d + h * hd:d + (h + 1) * hd].reshape(bc, seq, hd)
                v_h = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd].reshape(bc, seq, hd)
                s_h = jax.lax.dot_general(
                    q_h, k_h, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # [BC, S, S]
                # bias + softmax in 2D: the [BC, 1, S] broadcast-add form
                # crashes Mosaic (module docstring)
                s2 = s_h.reshape(rows_per, seq) + sb2
                p_h = jax.nn.softmax(s2, axis=-1).astype(mm_dtype).reshape(bc, seq, seq)
                outs.append(jax.lax.dot_general(
                    p_h, v_h, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32).astype(mm_dtype))
            o = jnp.concatenate(outs, axis=-1).reshape(rows_per, d)  # merge ok
            o = (jnp.dot(o, w_so_ref[0].astype(mm_dtype),
                         preferred_element_type=jnp.float32) + b_so_ref[0, 0][None, :])
            x1 = ln(ln_s_ref, x_in + o)

        x2 = x1
        if do_cross:
            # cross-attention to the per-layer multimodal KV (precomputed)
            q2 = (jnp.dot(x1.astype(mm_dtype), w_cq_ref[0].astype(mm_dtype),
                          preferred_element_type=jnp.float32)
                  + b_cq_ref[0, 0][None, :]).astype(mm_dtype)
            # no cross bias: the img+ner mask is all-ones in the supported
            # configs (fused_encoder_eligible), so the bias is exactly zero
            outs2 = []
            for h in range(heads):
                q_h = (q2[:, h * hd:(h + 1) * hd] * scaling).reshape(bc, seq, hd)
                k_h = ck_ref[0, :, h * hd:(h + 1) * hd, :].astype(mm_dtype)  # [BC, hd, KV]
                s_h = jax.lax.dot_general(
                    q_h, k_h, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # [BC, S, KV]
                p_h = jax.nn.softmax(s_h, axis=-1).astype(mm_dtype)
                outs2.append(jax.lax.dot_general(
                    p_h, cv_ref[0, :, :, h * hd:(h + 1) * hd].astype(mm_dtype),
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32).astype(mm_dtype))
            o2 = jnp.concatenate(outs2, axis=-1).reshape(rows_per, d)
            o2 = (jnp.dot(o2, w_co_ref[0].astype(mm_dtype),
                          preferred_element_type=jnp.float32) + b_co_ref[0, 0][None, :])
            x2 = ln(ln_c_ref, x1 + o2)

        if plan.fuse_ffn:
            # merged phase: FFN inline on this chunk (full-width fc blocks).
            # The attention temps (qkv/scores/probs) are dead by here, so the
            # VMEM peak is max(attn, ffn) + resident x_s + weights — the same
            # weight blocks were already fetched during attention phases in
            # the split layout, so fusing adds no fetch pressure.
            x3 = x2
            if do_ffn:
                h = act(jnp.dot(x2.astype(mm_dtype), w_fc1_ref[0].astype(mm_dtype),
                                preferred_element_type=jnp.float32)
                        + b_fc1_ref[0, 0][None, :]).astype(mm_dtype)
                delta = jnp.dot(h, w_fc2_ref[0].astype(mm_dtype),
                                preferred_element_type=jnp.float32)
                x3 = ln(ln_f_ref, x2 + delta + b_fc2_ref[0, 0][None, :])
            x_s[rows, :] = x3.astype(x_s.dtype)

            @pl.when(l == n_layers - 1)
            def _emit_m():
                x_out_ref[...] = x3.astype(x_out_ref.dtype)
        else:
            x_s[rows, :] = x2.astype(x_s.dtype)

    if plan.fuse_ffn:
        return

    # ------------- FFN phases: (row chunk) × (fc column chunk) --------------
    @pl.when(p >= ns)
    def _ffn():
        rc = (p - ns) // nf
        fcw = (p - ns) % nf
        rows = pl.ds(rc * rows_per, rows_per)
        if do_ffn:
            x_in = x_s[rows, :].astype(jnp.float32)
            h = act(jnp.dot(x_in.astype(mm_dtype), w_fc1_ref[0].astype(mm_dtype),
                            preferred_element_type=jnp.float32)
                    + b_fc1_ref[0, 0][None, :]).astype(mm_dtype)
            delta = jnp.dot(h, w_fc2_ref[0].astype(mm_dtype),
                            preferred_element_type=jnp.float32)

            @pl.when(fcw == 0)
            def _init():
                acc_s[...] = delta

            @pl.when(fcw > 0)
            def _acc():
                acc_s[...] = acc_s[...] + delta

            @pl.when(fcw == nf - 1)
            def _fin():
                x_s[rows, :] = ln(
                    ln_f_ref, x_in + acc_s[...] + b_fc2_ref[0, 0][None, :]
                ).astype(x_s.dtype)

        @pl.when((l == n_layers - 1) & (fcw == nf - 1))
        def _emit():
            x_out_ref[...] = x_s[rows, :].astype(x_out_ref.dtype)


def encoder_text_stack(
    sp: EncStackParams,
    x0: jax.Array,       # [B, S, d] — embedded + embed-LN'd tokens
    cross_k: jax.Array,  # [L, B, d, KV] — per-layer projected cross keys,
                         # PRE-TRANSPOSED (lane-aligned contraction layout)
    cross_v: jax.Array,  # [L, B, KV, d]
    self_bias: jax.Array,   # [B, S] f32 additive pad bias
    cross_bias: jax.Array,  # [B, KV] — accepted for API symmetry; must be
                            # zero (the supported configs' img+ner mask is
                            # all-ones) and is not consumed
    cfg: BartConfig,
    plan: EncPlan = EncPlan(),
    interpret: bool = False,
) -> jax.Array:
    """→ last_hidden [B, S, d] (kernel-internal bf16; cast to x0.dtype)."""
    interpret = interpret or jax.default_backend() == "cpu"
    L = sp.w_qkv.shape[0]
    B, S, d = x0.shape
    KV = cross_v.shape[2]
    H = cfg.encoder_attention_heads
    hd = d // H
    F = sp.w_fc1.shape[2]
    if B % plan.n_self:
        n = next(n for n in range(min(plan.n_self, B), 0, -1) if B % n == 0)
        plan = plan._replace(n_self=n)
    if F % plan.n_ffn or plan.fuse_ffn:
        plan = plan._replace(n_ffn=1)
    ns, nf = plan.n_self, plan.n_ffn
    bc = B // ns
    fc = F // nf
    rpc = bc * S
    mm_dtype = jnp.float32 if interpret else jnp.bfloat16
    in_dtype = jnp.float32 if interpret else jnp.bfloat16

    def c(*idx):
        return lambda l, p: (l, *idx)

    def a_chunk(l, p):
        # attention-phase chunk; during FFN phases hold the last index
        return jnp.clip(p, 0, ns - 1)

    def f_row(l, p):
        return jnp.clip((p - ns) // nf, 0, ns - 1)

    def f_col(l, p):
        return jnp.where(p >= ns, (p - ns) % nf, 0)

    grid = (L, plan.phases)
    specs = [
        # x0 chunk: walked during layer-0 attention phases, parked after
        pl.BlockSpec((rpc, d),
                     lambda l, p: (jnp.where(l == 0, a_chunk(l, p), ns - 1), 0)),
        pl.BlockSpec((1, d, 3 * d), c(0, 0)),
        pl.BlockSpec((1, 1, 3 * d), c(0, 0)),
        pl.BlockSpec((1, d, d), c(0, 0)),
        pl.BlockSpec((1, 1, d), c(0, 0)),
        pl.BlockSpec((1, 2, d), c(0, 0)),
        pl.BlockSpec((1, d, d), c(0, 0)),
        pl.BlockSpec((1, 1, d), c(0, 0)),
        pl.BlockSpec((1, d, d), c(0, 0)),
        pl.BlockSpec((1, 1, d), c(0, 0)),
        pl.BlockSpec((1, 2, d), c(0, 0)),
        pl.BlockSpec((1, d, fc), lambda l, p: (l, 0, f_col(l, p))),
        pl.BlockSpec((1, 1, fc), lambda l, p: (l, 0, f_col(l, p))),
        pl.BlockSpec((1, fc, d), lambda l, p: (l, f_col(l, p), 0)),
        pl.BlockSpec((1, 1, d), c(0, 0)),
        pl.BlockSpec((1, 2, d), c(0, 0)),
        pl.BlockSpec((1, bc, d, KV), lambda l, p: (l, a_chunk(l, p), 0, 0)),  # ck
        pl.BlockSpec((1, bc, KV, d), lambda l, p: (l, a_chunk(l, p), 0, 0)),  # cv
        # per-item pad bias [B, S], whole-array block fetched once; expanded
        # to query rows in-kernel via a one-hot matmul (see _attn) — the
        # Mosaic broadcast-add crash workaround without the old materialized
        # [B·S, S] operand
        pl.BlockSpec((B, S), lambda l, p: (0, 0)),                            # sbias
    ]
    out_row = a_chunk if plan.fuse_ffn else f_row
    out_specs = pl.BlockSpec(
        (rpc, d),
        lambda l, p: (jnp.where(l == L - 1, out_row(l, p), 0), 0))
    kernel = functools.partial(
        _kernel, plan=plan, n_layers=L, batch=B, seq=S, heads=H, hd=hd,
        act_name=cfg.activation_function, mm_dtype=mm_dtype)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((B * S, d), in_dtype),
        scratch_shapes=[
            pltpu.VMEM((B * S, d), in_dtype),
            # FFN column accumulator — unused in merged mode (keep a tiny
            # placeholder so the kernel signature is static)
            pltpu.VMEM((8, 128) if plan.fuse_ffn else (rpc, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=plan.vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(
        x0.reshape(B * S, d).astype(in_dtype),
        sp.w_qkv, sp.b_qkv, sp.w_so, sp.b_so, sp.ln_s,
        sp.w_cq, sp.b_cq, sp.w_co, sp.b_co, sp.ln_c,
        sp.w_fc1, sp.b_fc1, sp.w_fc2, sp.b_fc2, sp.ln_f,
        cross_k.astype(in_dtype), cross_v.astype(in_dtype),
        # CLAMP to bf16-finite: the callers build the pad bias from
        # jnp.finfo(f32).min (-3.40282e38), which OVERFLOWS to -inf under
        # the kernel's bf16 cast — and the one-hot expansion matmul then
        # produces 0 * -inf = NaN for every unselected row (observed on-chip
        # as instant-eos garbage decode, r3; interpret-mode tests run f32
        # and cannot catch it)
        jnp.maximum(self_bias.astype(jnp.float32),
                    float(jnp.finfo(jnp.bfloat16).min)),
    )
    return out.reshape(B, S, d).astype(x0.dtype)
