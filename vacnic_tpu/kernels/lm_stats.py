"""LM-head-with-statistics Pallas kernel: logits + per-block max + lse
partials in one pass.

Why: at decode batch 256 the beam logic costs ~6.4 ms/step after the
shortlist rewrite (docs/decode_budget.md) — the remaining full-width work
is the logsumexp reduction and the per-row top-16 over the [B·K, 50k]
logits the XLA LM head wrote to HBM. Both are *statistics of the logits
rows* that the LM matmul already has in registers block by block, so this
kernel fuses them into the matmul epilogue: per vocab block it writes the
f32 logits (needed by the exact certificate-fallback path and the forced
steps), the block max `m` (drives BOTH the exact block-pigeonhole top-C
and the lse max), and the exp-sum partial `s = Σ exp(y − m)`. The VPU
exp/max work hides under the MXU matmul; the extra HBM traffic is ~50
lanes per row instead of two more full 257 MB passes.

Stage 2 (`lm_stats_topk`, plain XLA, all small): combine (m, s) into the
exact-within-f32 lse, pick the top-C vocab blocks per row (every block
holding a top-C value must rank top-C by max — pigeonhole), gather those
C blocks from the logits and re-rank. Ties: block ids are sorted ascending
before the gather, so position order in the gathered array is global index
order and `top_k`'s lowest-index tie-break matches a direct full-width
`top_k`.

Reference behavior: the LM projection with `final_logits_bias`
(/root/reference/src/models/modeling_mmbart...crossattn.py:1884-1885,
:1997); the statistics feed the HF-4.18-semantics beam search
(infer/beam_search).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

VBLOCK = 1024  # vocab block width (lanes); also the top-C block granularity


_MS_LANES = 128  # minimal Mosaic-legal lane width for the packed stats block


def _kernel(x_ref, w_ref, b_ref, out_ref, ms_ref):  # grid (nvb, nr)
    x = x_ref[...]  # [rb, D] bf16
    w = w_ref[...]  # [VBLOCK, D] bf16
    y = jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + b_ref[...]  # [1, VBLOCK] f32 (pad columns carry -1e9)
    out_ref[...] = y
    m = jnp.max(y, axis=-1, keepdims=True)  # [rb, 1]
    s = jnp.sum(jnp.exp(y - m), axis=-1, keepdims=True)
    # Mosaic rejects (rb, 1) output blocks (last block dim must be 128-
    # divisible or the full array dim — r4 on-chip smoke), so m and s are
    # packed into one 128-lane block per (row, vocab) grid cell: lanes <64
    # broadcast m, lanes >=64 broadcast s. Each grid step owns its block, so
    # no output revisiting and the vocab-major weight streaming is kept.
    lane = jax.lax.broadcasted_iota(jnp.int32, ms_ref.shape, 1)
    ms_ref[...] = jnp.where(lane < _MS_LANES // 2, m, s)


def _pick_rows(bk: int) -> int:
    """Largest row-block <= 512 dividing BK with 8-aligned sublanes.

    lm_stats pads bk to a multiple of 8 before calling (Mosaic path);
    interpret mode passes unaligned bk through as a single row block."""
    if bk % 8 != 0:
        return bk
    for rb in (512, 320, 256, 160, 128, 64, 40, 32, 16, 8):
        if bk % rb == 0:
            return rb
    return 8


@functools.partial(jax.jit, static_argnames=("interpret",))
def lm_stats(x: jax.Array, w_lm: jax.Array, b_lm: jax.Array,
             *, interpret: bool = False):
    """(logits [BK, Vp] f32, m [BK, Vp/VBLOCK] f32, s [BK, Vp/VBLOCK] f32).

    `w_lm`/`b_lm` from infer.decode_fast.build_lm_head: [Vp, D] bf16 with
    zero pad rows and [1, Vp] f32 with -1e9 pad bias (Vp a multiple of
    4096, hence of VBLOCK)."""
    bk0, d = x.shape
    # Mosaic needs 8-aligned sublanes; tiny configs (e.g. batch 2 x 2 beams)
    # produce bk=4 — pad with zero rows (they read the bias row; sliced off
    # below) rather than excluding small shapes from the stats path.
    # Interpret mode (CPU tests) skips the pad: alignment isn't enforced
    # there, and keeping the exact row count keeps the dot shape — and hence
    # f32 summation order — identical to the plain path's XLA LM head.
    bk = bk0 if interpret else bk0 + (-bk0) % 8
    if bk != bk0:
        x = jnp.pad(x, ((0, bk - bk0), (0, 0)))
    vp = w_lm.shape[0]
    assert vp % VBLOCK == 0, (vp, VBLOCK)
    nvb = vp // VBLOCK
    rb = _pick_rows(bk)
    nr = bk // rb

    # vocab-major grid: the row dim is innermost, so the [VBLOCK, d] weight
    # block's index map is constant across the inner loop and each weight
    # block streams ONCE per step (104 MB total) while the small x blocks
    # re-stream (~136 MB at b256) — the reverse order re-fetched the whole
    # LM weight nr times (416 MB at b256; review finding r3)
    out = pl.pallas_call(
        _kernel,
        grid=(nvb, nr),
        in_specs=[
            pl.BlockSpec((rb, d), lambda j, i: (i, 0)),       # x
            pl.BlockSpec((VBLOCK, d), lambda j, i: (j, 0)),   # w_lm
            pl.BlockSpec((1, VBLOCK), lambda j, i: (0, j)),   # b_lm
        ],
        out_specs=[
            pl.BlockSpec((rb, VBLOCK), lambda j, i: (i, j)),      # logits
            pl.BlockSpec((rb, _MS_LANES), lambda j, i: (i, j)),   # packed m|s
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bk, vp), jnp.float32),
            jax.ShapeDtypeStruct((bk, nvb * _MS_LANES), jnp.float32),
        ],
        interpret=interpret,
    )(x, w_lm, b_lm)
    logits, ms = out
    ms = ms.reshape(bk, nvb, _MS_LANES)
    return (logits[:bk0], ms[:bk0, :, 0], ms[:bk0, :, _MS_LANES // 2])


def gather_rerank(r3: jax.Array, bid: jax.Array, C: int):
    """Block-pigeonhole stage 2: gather the top-C blocks of r3 [rows, nb,
    blk] (bid [rows, C]) and re-rank to the exact tie-faithful top-C.
    Block ids are sorted ascending first, so position order in the gathered
    array IS global index order and top_k's lowest-index tie-break matches
    a direct full-width top_k. Shared by beam_search.row_topk_blockmax and
    lm_stats_topk — the tie-break argument lives exactly once."""
    rows, nb, blk = r3.shape
    bid = jnp.sort(bid, axis=-1)
    g = jnp.take_along_axis(r3, bid[:, :, None], axis=1)  # [rows, C, blk]
    cv, loc = jax.lax.top_k(g.reshape(rows, C * blk), C)
    gidx = (bid[:, :, None] * blk
            + jnp.arange(blk, dtype=bid.dtype)[None, None, :]
            ).reshape(rows, C * blk)
    ci = jnp.take_along_axis(gidx, loc, axis=1)
    return cv, ci


def lm_stats_topk(logits: jax.Array, m: jax.Array, s: jax.Array, C: int,
                  vocab_size: int):
    """(cand_vals [BK, C], cand_idx [BK, C], lse [BK]) from lm_stats output.

    Exact top-C (pigeonhole over VBLOCK-wide blocks, tie-faithful via
    gather_rerank); lse combines the per-block partials — bit-identical to
    a full-width logsumexp up to f32 summation order. Requires C <= number
    of vocab blocks. Pad columns sit at -1e9 (build_lm_head convention) and
    additionally any out-of-vocab index is masked to -inf here, so
    cand_idx >= vocab_size can never be selected downstream."""
    bk, nvb = m.shape
    assert C <= nvb, (C, nvb)
    big = jnp.max(m, axis=-1)  # [BK]
    lse = jnp.log(jnp.sum(s * jnp.exp(m - big[:, None]), axis=-1)) + big

    _, bid = jax.lax.top_k(m, C)  # [BK, C] best blocks
    cv, ci = gather_rerank(logits.reshape(bk, nvb, VBLOCK), bid, C)
    cv = jnp.where(ci < vocab_size, cv, -jnp.inf)
    return cv, ci, lse
