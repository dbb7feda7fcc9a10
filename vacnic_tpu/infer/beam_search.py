"""Jitted beam search, bit-compatible with transformers-4.18 `generate` semantics.

The reference inherits beam search from HF `GenerationMixin` (SURVEY §2.6;
model hooks `prepare_inputs_for_generation` :2023-2061, `_reorder_cache`
:2066-2074). Decode config per README.md:8 / run_full_train.sh:11: beam 5,
max_length 50, length_penalty 2.0.

Semantics replicated from HF beam search:
  * decoder starts from `decoder_start_token_id` (</s> for BART);
  * `forced_bos_token_id` processor at cur_len==1 (all −inf, forced token 0);
  * `min_length` processor (eos banned while cur_len < min_length);
  * `no_repeat_ngram_size` processor (tokens completing a repeated n-gram
    banned);
  * per step: log_softmax → processors → + beam score → top-2K over K·V;
    eos candidates become hypotheses scored `sum_logprobs / cur_len**lp`
    (hyp length *excludes* the eos, includes decoder start); non-eos
    candidates fill the next K beams;
  * `early_stopping=True`: a batch is done once K hypotheses exist;
    `early_stopping=False`: done when the best possible candidate score cannot
    beat the worst kept hypothesis (4.18: best of all 2K candidates; modern:
    best running beam — `cfg.hf_compat` selects);
  * finalize: unfinished batches add their K running beams — 4.18 scores them
    `sum / max_length**lp` (length incl. decoder start), modern
    `sum / (max_length-1)**lp`; output picks the best hypothesis, pads with
    pad_token. See tests/test_beam_418_semantics.py for the divergence map.

Everything is static-shape: the whole search is one `lax.while_loop` under
`jit`, the KV cache pre-allocated at [B·K, ...] (TPU-friendly — no host
round-trips per step, unlike the reference's Python decode loop).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from vacnic_tpu.core.config import DecodeConfig

NEG_INF = -1.0e7  # large-but-finite; matches practical HF -inf handling under fp32


class BeamState(NamedTuple):
    cur_len: jax.Array  # scalar int32 — tokens so far (incl. decoder start)
    running_seqs: jax.Array  # [B, K, L]
    running_scores: jax.Array  # [B, K] cumulative logprob
    finished_seqs: jax.Array  # [B, K, L]
    finished_scores: jax.Array  # [B, K] length-normalized
    finished_flags: jax.Array  # [B, K] bool
    done: jax.Array  # [B] bool — batch frozen
    cache: Any  # pytree, leading dim B*K


def flatten_beam_dim(x):
    return x.reshape((-1,) + x.shape[2:])


def unflatten_beam_dim(x, b, k):
    return x.reshape((b, k) + x.shape[1:])


def gather_beams(x, beam_indices, b, k_out):
    """x: [B, K_in, ...]; beam_indices: [B, K_out] → [B, K_out, ...]."""
    batch = jnp.arange(b)[:, None]
    return x[batch, beam_indices]


def _ngram_matches(seqs: jax.Array, cur_len: jax.Array, n: int):
    """(match [B,K,P] bool, banned_tok [B,K,P]) for the no-repeat-ngram rule:
    position p matches iff seqs[p:p+n-1] equals the current (n-1)-token
    prefix and the full n-gram lies within generated tokens; the banned
    token is then seqs[p+n-1]. P = L - n + 1 start positions."""
    b, k, L = seqs.shape
    # last (n-1)-token prefix, gathered at traced positions
    idx = cur_len - (n - 1) + jnp.arange(n - 1)  # [n-1]
    prefix = jnp.take_along_axis(seqs, jnp.broadcast_to(idx[None, None, :], (b, k, n - 1)), axis=2)

    pos = jnp.arange(L - n + 1)  # candidate n-gram start positions
    # windows[b,k,p,i] = seqs[b,k,p+i] for i < n-1; banned token = seqs[b,k,p+n-1]
    win_idx = pos[:, None] + jnp.arange(n - 1)[None, :]  # [P, n-1]
    windows = seqs[:, :, win_idx]  # [B, K, P, n-1]
    banned_tok = seqs[:, :, pos + (n - 1)]  # [B, K, P]
    match = jnp.all(windows == prefix[:, :, None, :], axis=-1)  # [B, K, P]
    # the n-gram must lie fully within generated tokens: p + n - 1 <= cur_len - 1
    valid = (pos[None, None, :] + (n - 1)) <= (cur_len - 1)
    match = match & valid & (cur_len >= n)
    return match, banned_tok


def _apply_no_repeat_ngram(seqs: jax.Array, cur_len: jax.Array, logprobs: jax.Array, n: int,
                           ban_value=NEG_INF):
    """Ban tokens that would complete an n-gram already in the sequence.

    seqs [B, K, L]; logprobs [B, K, V]. A token v is banned iff the last n-1
    generated tokens followed by v occur earlier as a contiguous n-gram.
    `ban_value` may be a broadcastable array (the shifted-domain ban).
    """
    b, k, L = seqs.shape
    v = logprobs.shape[-1]
    match, banned_tok = _ngram_matches(seqs, cur_len, n)
    ban = jnp.zeros((b, k, v), bool)
    ban = ban.at[jnp.arange(b)[:, None, None], jnp.arange(k)[None, :, None], banned_tok].max(
        match
    )
    return jnp.where(ban, ban_value, logprobs)


def chunked_top_k(flat: jax.Array, k: int, chunk: int = 4096):
    """Exact top-k over very wide rows via per-chunk top-k then a merge.

    XLA's single top-k over a [B, 251k] row measures ~2.0 ms/step at the
    b128 bench shape (scripts/profile_decode_b128.py loop_notopk delta);
    splitting the row into `chunk`-wide pieces, taking top-k in each, and
    re-ranking the nc·k survivors is algebraically exact (every global
    top-k element is a top-k element of its chunk) and much cheaper.
    """
    b, n = flat.shape
    nc = -(-n // chunk)
    pad = nc * chunk - n
    if pad:
        # pad strictly BELOW any real candidate: banned candidates sit at
        # running_score + NEG_INF < NEG_INF (scores are negative), so a
        # NEG_INF pad would outrank them and leak out-of-range flat indices
        # into the top-k (observed only under VACNIC_CHUNKED_TOPK=1)
        flat = jnp.pad(flat, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    # stage 1 in 2D ([B·nc, chunk]) — a 3D operand falls off TPU TopK's fast
    # path onto a full sort (measured: the 3D form collapsed the bench
    # 123 → 73 cps)
    piece = flat.reshape(b * nc, chunk)
    s1, i1 = jax.lax.top_k(piece, k)  # [B·nc, k]
    base = (jnp.arange(nc, dtype=jnp.int32) * chunk)[:, None]
    g1 = (i1.reshape(b, nc, k) + base[None]).reshape(b, nc * k)
    s2, i2 = jax.lax.top_k(s1.reshape(b, nc * k), k)
    idx = jnp.take_along_axis(g1, i2, axis=1)
    return s2, idx


def shortlist_width(cfg: DecodeConfig) -> int:
    """Exactness margin for the per-row shortlist: the global top-2K can
    displace at most (#banned tokens per row) shortlist slots, and bans are
    bounded by the ngram rule's L-n+1 start positions plus the min_length
    eos ban. Any candidate the full-width path selects from a row is among
    that row's top-(2K + bans) raw logits (within a row, total = logit +
    (score - lse) is a constant shift, so raw-logit order IS total order)."""
    c = 2 * cfg.num_beams
    if cfg.no_repeat_ngram_size > 0:
        c += cfg.max_length - cfg.no_repeat_ngram_size + 1
    if cfg.min_length > 0:
        c += 1
    return c


def shortlist_c_width(k: int) -> int:
    """Per-row shortlist width C: 2K winners + certificate tolerance, floor
    16 (the TPU TopK fast path). SINGLE SOURCE — _candidates_shortlist's
    default, generate's stats-head width, and the block-lse eligibility
    gate must all agree or the fused path's exactness bound breaks.
    (Distinct from shortlist_width(cfg) above — the theoretical ban-bound
    margin used by resolve_cand_mode's big-vocab gate.)"""
    return max(2 * k + 6, 16)


def _block_view(logits: jax.Array, blk: int = 128):
    """[rows, n] → ([rows, nb, blk] padded with -inf, block maxima
    [rows, nb]). The shared first stage of blockmax top-C and the fused
    block-decomposed logsumexp."""
    rows, n = logits.shape
    nb = -(-n // blk)
    if nb * blk != n:
        logits = jnp.pad(logits, ((0, 0), (0, nb * blk - n)),
                         constant_values=-jnp.inf)
    r3 = logits.reshape(rows, nb, blk)
    return r3, r3.max(axis=-1)


def block_lse(r3: jax.Array, bm: jax.Array) -> jax.Array:
    """Exact-to-f32-reorder logsumexp from the block view: per-block
    exp-sums against the block max, combined against the row max. A pad
    block is all -inf (bm = -inf): compute its partials against a clamped
    max so exp(-inf − (−inf)) can't make NaN; its contribution is 0."""
    bm_safe = jnp.maximum(bm, jnp.finfo(jnp.float32).min)  # [rows, nb]
    bs = jnp.sum(jnp.exp(r3 - bm_safe[..., None]), axis=-1)
    m = jnp.max(bm, axis=-1)  # [rows] — finite: real logits exist
    return jnp.log(jnp.sum(bs * jnp.exp(bm_safe - m[:, None]), axis=-1)) + m


def row_topk_blockmax(logits: jax.Array, C: int, blk: int = 128,
                      blocks=None):
    """Exact per-row top-C via block-max: reduce each 128-token block to its
    max (one streaming pass), pick the top-C blocks (every block holding a
    top-C value must rank in the top-C by max — pigeonhole), gather those
    C blocks and re-rank. Tie-faithful to lax.top_k: block ids are sorted
    ascending before the gather, so within the gathered array position
    order IS global index order and top_k's lowest-index tie-break carries
    over. DEFAULT row top-k since r4 (175.2 vs 158.6 paired e2e at b256).
    `blocks` passes a precomputed (r3, bm) pair so the VACNIC_BLOCK_LSE
    path shares one full-vocab pass between the shortlist and the lse."""
    from vacnic_tpu.kernels.lm_stats import gather_rerank

    r3, bm = _block_view(logits, blk) if blocks is None else blocks
    _, bid = jax.lax.top_k(bm, C)
    return gather_rerank(r3, bid, C)


def _candidates_shortlist(logits, lse, s, cur, *, cfg, b, k, vocab_size,
                          eos_token_id, forced_bos_token_id, full_fn,
                          C=None, pre=None, blocks=None):
    """Per-step candidate selection via a per-row shortlist on RAW logits
    with an exactness certificate.

    Within a row (batch·beam), total = logit + (score - lse) is a constant
    shift of the raw logits, so the row's top candidates by total ARE its
    top raw logits. Per-row top-C (C=16 — TPU TopK stays on its fast path;
    k=64 measured 16.9 vs 5.9 ms/step at b256,
    scripts/logs_r3/topk_probe_b256.log) moves all processor/score work
    onto [B, K, C]. Exactness: the global top-2K draws at most 2K from any
    row, displaced only by banned candidates, so a row certificate
    (#bans within the shortlist <= C - 2K) guarantees the survivors are
    the true top-2K; on certificate failure the step falls back to the
    full-width path under lax.cond (compiled once, executed only when a
    row's top-C is >= 6/16 banned — pathological repetition). Forced-token
    steps take the analytic _forced_step_candidates branch (the forced
    token need not rank in any row's top-C)."""
    L = cfg.max_length
    if pre is not None:
        C = pre[0].shape[-1]
        assert C > 2 * k, (C, k)  # certificate tolerance must be positive
    elif C is None:
        C = shortlist_c_width(k)
    C = min(C, vocab_size)

    banned = _banned_token_list(s, cur, cfg=cfg, eos_token_id=eos_token_id)

    def shortlist(_):
        import os as _os

        if pre is not None:
            cv, ci = pre  # [BK, C] raw-logit shortlist from the stats head
        elif blocks is not None:
            # fused path (VACNIC_BLOCK_LSE): the body already computed the
            # block view for the lse — reuse it (eligibility was checked
            # there with the same 2*C*128 bound)
            cv, ci = row_topk_blockmax(logits, C, blocks=blocks)
        elif (_os.environ.get("VACNIC_BEAM_TOPK", "blockmax") == "blockmax"
                and vocab_size >= 2 * C * 128):  # needs >= C blocks (exactness)
            # DEFAULT since r4: exact block-max two-stage row top-C. Same-
            # window paired e2e at b256: 175.2 cps (174.8/177.1/175.2) vs
            # 158.6 plain (164.4/158.6/153.4) — the TPU TopK partial sort
            # over the full vocab is ~2 ms/step slower than a BW-bound
            # max-reduce + top-C-block gather + re-rank
            # (scripts/logs_r4/bench_queue9.log). VACNIC_BEAM_TOPK=plain
            # opts out.
            cv, ci = row_topk_blockmax(logits, C)  # [BK, C] raw-logit shortlist
        else:
            cv, ci = jax.lax.top_k(logits, C)  # [BK, C] raw-logit shortlist
        shift = s.running_scores.reshape(-1) - lse
        total = (cv + shift[:, None]).reshape(b, k, C)
        ci3 = ci.reshape(b, k, C)
        if banned is not None:
            hit = jnp.any(ci3[:, :, :, None] == banned[:, :, None, :], axis=-1)
            cert = jnp.all(jnp.sum(hit, axis=-1) <= C - 2 * k)
            total = jnp.where(hit, -jnp.inf, total)
        else:
            cert = jnp.bool_(True)
        flat = total.reshape(b, k * C)
        ts, ti = jax.lax.top_k(flat, 2 * k)
        cand = (ts, ti // C,
                jnp.take_along_axis(ci3.reshape(b, k * C), ti, axis=1))
        if banned is None:
            return cand
        return jax.lax.cond(cert, lambda _: cand,
                            lambda _: full_fn(logits, lse, s, cur), None)

    is_fb = (cur == 1) if forced_bos_token_id is not None else jnp.bool_(False)
    is_fe = (cur == L - 1) if cfg.forced_eos else jnp.bool_(False)
    if forced_bos_token_id is None and not cfg.forced_eos:
        return shortlist(None)
    return jax.lax.cond(
        is_fb | is_fe,
        lambda _: _forced_step_candidates(
            s, cur, b=b, k=k, is_fb=is_fb, is_fe=is_fe,
            eos_token_id=eos_token_id,
            forced_bos_token_id=forced_bos_token_id, vocab_size=vocab_size),
        shortlist, None)


def _forced_step_candidates(s, cur, *, b, k, is_fb, is_fe, eos_token_id,
                            forced_bos_token_id, vocab_size):
    """Analytic candidates for a forced-token step (forced_bos at cur==1 /
    forced_eos at cur==L-1): the full-width path maps every token to
    total = score + NEG_INF except the forced token (= score), so its
    top-2K is [K forced candidates by value, then "junk" — banned tokens in
    (beam, token-index) tie-break order, i.e. the lowest-index non-forced
    tokens]. K·(2K+1) candidates replace the K·V top-k. Junk admission is
    observable (an eos junk candidate at rank < K becomes a NEG_INF
    hypothesis exactly as in HF 4.18), hence the faithful junk columns."""
    # forced_eos is applied LAST in the full path (HF processor order), so
    # it wins when both forcings hit the same step (max_length == 2)
    ftok = jnp.where(is_fe, eos_token_id,
                     forced_bos_token_id if forced_bos_token_id is not None
                     else eos_token_id)
    banned_total = s.running_scores[:, :, None] + NEG_INF
    # per beam: [junk tokens (2K lowest-index non-forced), forced]
    jtok = jnp.arange(2 * k, dtype=jnp.int32)
    jtok = jtok + (jtok >= ftok.astype(jnp.int32)).astype(jnp.int32)
    # junk columns score NEG_INF so their ids are semantically arbitrary, but
    # they must stay in-vocab: with 2K+1 > V (tiny test vocabs under an
    # env-forced non-full mode) the arange would emit out-of-range ids
    # (ADVICE r3 #3)
    jtok = jnp.minimum(jtok, vocab_size - 1)
    jtok = jnp.broadcast_to(jtok, (b, k, 2 * k))
    jcol = jnp.broadcast_to(banned_total, (b, k, 2 * k))
    fcol = s.running_scores[:, :, None]
    total = jnp.concatenate([jcol, fcol], axis=2)  # [B, K, 2K+1]
    toks = jnp.concatenate(
        [jtok, jnp.broadcast_to(ftok, (b, k, 1)).astype(jnp.int32)], axis=2)
    w = 2 * k + 1
    flat = total.reshape(b, k * w)
    topk_scores, ti = jax.lax.top_k(flat, 2 * k)
    topk_beam = ti // w
    topk_tok = jnp.take_along_axis(toks.reshape(b, k * w), ti, axis=1)
    return topk_scores, topk_beam, topk_tok


def _banned_token_list(s, cur, *, cfg, eos_token_id):
    """[B, K, P(+1)] token ids banned at this step (-1 in inactive slots):
    the no-repeat-ngram completions plus eos while cur < min_length."""
    cols = []
    if cfg.no_repeat_ngram_size > 0:
        match, banned_tok = _ngram_matches(s.running_seqs, cur,
                                           cfg.no_repeat_ngram_size)
        cols.append(jnp.where(match, banned_tok, -1))
    if cfg.min_length > 0:
        b, k, _ = s.running_seqs.shape
        eos_col = jnp.where(cur < cfg.min_length, eos_token_id, -1)
        cols.append(jnp.broadcast_to(eos_col, (b, k, 1)))
    return jnp.concatenate(cols, axis=2) if cols else None


OPT_WINDOW = 32  # optimistic top-k window; tolerance = OPT_WINDOW - 2K bans


def _candidates_opt(logits, lse, s, cur, *, cfg, b, k, vocab_size,
                    eos_token_id, forced_bos_token_id, full_fn):
    """Optimistic candidate selection: ONE wide top-k with a widened window,
    ban-checking only the W winners.

    The full-width path spends a per-step [B, K, V] pass scattering ngram
    bans over the whole vocab (measured ~2.4 ms/step at b256) when on real
    steps only a handful of the top candidates are ever banned. Instead:
    top-W (W=32) over the unbanned totals, compare the W winners against
    the small banned-token list, drop hits, and keep the top-2K survivors.
    Exact-by-certificate: if a batch row has more than W-2K banned winners,
    the survivors may not be the true top-2K, so the step falls back to the
    full-width path under lax.cond (compiled once, executed only on
    certificate failure — never observed on real decodes). Banned
    candidates can outrank unbanned ones only on forced-token steps (ban
    value = score + NEG_INF vs any real total within 1e7 of the best row's
    score — the best row alone supplies >= 2K unbanned candidates above
    every ban value); forced steps take the analytic
    _forced_step_candidates branch, so dropping hits to -inf is exact."""
    L = cfg.max_length
    shift = s.running_scores - unflatten_beam_dim(lse, b, k)
    total = unflatten_beam_dim(logits, b, k) + shift[:, :, None]

    is_fb = (cur == 1) if forced_bos_token_id is not None else jnp.bool_(False)
    is_fe = (cur == L - 1) if cfg.forced_eos else jnp.bool_(False)

    banned = _banned_token_list(s, cur, cfg=cfg, eos_token_id=eos_token_id)

    def optimistic(_):
        # window must exceed 2K (top_k k <= axis size; tolerance = w - 2K);
        # an explicitly-valid OPT_WINDOW is respected (tests shrink it to
        # force the certificate fallback), otherwise widen with the beams
        w = OPT_WINDOW if OPT_WINDOW > 2 * k else 2 * k + 8
        flat = total.reshape(b, k * vocab_size)
        ts, ti = jax.lax.top_k(flat, w)  # [B, W]
        tbeam = ti // vocab_size
        ttok = ti % vocab_size
        if banned is not None:
            bl = jnp.take_along_axis(  # [B, W, P]
                banned, tbeam[:, :, None], axis=1)
            hit = jnp.any(ttok[:, :, None] == bl, axis=-1)  # [B, W]
            cert = jnp.all(jnp.sum(hit, axis=1) <= w - 2 * k)
            vals = jnp.where(hit, -jnp.inf, ts)
        else:
            cert = jnp.bool_(True)
            vals = ts
        s2, i2 = jax.lax.top_k(vals, 2 * k)
        cand = (s2,
                jnp.take_along_axis(tbeam, i2, axis=1),
                jnp.take_along_axis(ttok, i2, axis=1))
        if banned is None:
            return cand
        return jax.lax.cond(cert, lambda _: cand,
                            lambda _: full_fn(logits, lse, s, cur), None)

    if forced_bos_token_id is None and not cfg.forced_eos:
        return optimistic(None)
    return jax.lax.cond(
        is_fb | is_fe,
        lambda _: _forced_step_candidates(
            s, cur, b=b, k=k, is_fb=is_fb, is_fe=is_fe,
            eos_token_id=eos_token_id,
            forced_bos_token_id=forced_bos_token_id, vocab_size=vocab_size),
        optimistic, None)


def candidates_full(logits, lse, s, cur, *, cfg, b, k, vocab_size,
                    eos_token_id, forced_bos_token_id):
    """Reference full-width pipeline: materialize total [B, K, V], apply
    processors over the whole vocab, single top-2K over K·V lanes.
    MEASURED (r3, b128): chunked variants are a big LOSS on this backend
    — 3D stage-1 collapsed the bench 123→73 cps and even 2D [B·nc, 4096]
    chunking read 9.9 ms/step vs 4.1 for the single wide call; TPU
    TopK's fast path handles [128, 251335] k=10 best.
    VACNIC_CHUNKED_TOPK=1 keeps the chunked path for future-backend A/B."""
    import os as _os

    L = cfg.max_length
    logits = unflatten_beam_dim(logits, b, k)  # [B, K, V]
    shift = s.running_scores - unflatten_beam_dim(lse, b, k)
    total = logits + shift[:, :, None]  # [B, K, V] = logprobs + scores

    # logits processors (HF order; forced_bos overrides last), applied
    # in the shifted (score-added) domain: a ban that set
    # logprob=NEG_INF becomes total=score+NEG_INF, identical to the
    # unshifted formulation
    banned_total = s.running_scores[:, :, None] + NEG_INF
    if cfg.min_length > 0:
        total = jnp.where(
            (cur < cfg.min_length)
            & (jnp.arange(vocab_size)[None, None, :] == eos_token_id),
            banned_total,
            total,
        )
    if cfg.no_repeat_ngram_size > 0:
        total = _apply_no_repeat_ngram(s.running_seqs, cur, total,
                                       cfg.no_repeat_ngram_size,
                                       ban_value=banned_total)
    if forced_bos_token_id is not None:
        # forced token's logprob is 0 → total = running score exactly
        is_first = cur == 1
        forced = jnp.where(
            jnp.arange(vocab_size)[None, None, :] == forced_bos_token_id,
            s.running_scores[:, :, None], banned_total,
        )
        total = jnp.where(is_first, forced, total)
    if cfg.forced_eos:
        # ForcedEOSTokenLogitsProcessor: at max_length-1 all mass on eos
        # with score 0 (BartConfig default forced_eos_token_id).
        is_last = cur == L - 1
        forced = jnp.where(
            jnp.arange(vocab_size)[None, None, :] == eos_token_id,
            s.running_scores[:, :, None], banned_total,
        )
        total = jnp.where(is_last, forced, total)

    flat = total.reshape(b, k * vocab_size)
    if _os.environ.get("VACNIC_CHUNKED_TOPK", "0") == "1":
        topk_scores, topk_idx = chunked_top_k(flat, 2 * k)  # [B, 2K]
    else:
        topk_scores, topk_idx = jax.lax.top_k(flat, 2 * k)
    return topk_scores, topk_idx // vocab_size, topk_idx % vocab_size


def resolve_cand_mode(cfg: DecodeConfig, vocab_size: int) -> str:
    """The candidate-selection mode beam_search will use (pure env + config
    logic, exposed so callers — e.g. the fused LM-stats gate in
    infer/generate — can check it BEFORE building mode-specific inputs)."""
    import os as _os

    mode = _os.environ.get("VACNIC_BEAM_LOGIC")
    if mode is None and _os.environ.get("VACNIC_BEAM_SHORTLIST") == "1":
        mode = "shortlist"
    if mode is None and _os.environ.get("VACNIC_BEAM_SHORTLIST") == "0":
        mode = "full"
    if mode is not None:
        return mode
    big_vocab = vocab_size >= 8 * (shortlist_width(cfg) + 2)
    return "shortlist" if big_vocab else "full"


def beam_search(
    step_fn: Callable[[jax.Array, Any, jax.Array], tuple[jax.Array, Any]],
    init_cache: Any,
    batch_size: int,
    *,
    cfg: DecodeConfig,
    eos_token_id: int,
    pad_token_id: int,
    decoder_start_token_id: int,
    forced_bos_token_id: int | None,
    vocab_size: int,
    reorder_cache_fn=None,
    step_stats_fn=None,
) -> tuple[jax.Array, jax.Array]:
    """Run beam search. `step_fn(tokens[BK,1], cache, pos) → (logits[BK,V], cache)`.

    `step_stats_fn`, when provided, replaces step_fn on the shortlist path:
    `(tok, cache, pos) → (logits_padded [BK, Vp] f32, cand_vals [BK, C],
    cand_idx [BK, C], lse [BK], cache)` — a fused LM head that already
    computed the per-row shortlist and logsumexp (kernels/lm_stats). The
    padded logits feed only the rare certificate-fallback (sliced to V);
    ignored unless the candidate mode resolves to "shortlist".

    Returns (sequences [B, L], scores [B]) for the best hypothesis per batch.
    """
    b, k, L = batch_size, cfg.num_beams, cfg.max_length
    lp = cfg.length_penalty

    running_seqs = jnp.full((b, k, L), pad_token_id, jnp.int32)
    running_seqs = running_seqs.at[:, :, 0].set(decoder_start_token_id)
    # beam 0 live, others -inf (HF initializes beam_scores[:, 1:] = -1e9)
    running_scores = jnp.tile(jnp.array([0.0] + [NEG_INF] * (k - 1)), (b, 1))

    state = BeamState(
        cur_len=jnp.int32(1),
        running_seqs=running_seqs,
        running_scores=running_scores.astype(jnp.float32),
        finished_seqs=jnp.full((b, k, L), pad_token_id, jnp.int32),
        finished_scores=jnp.full((b, k), NEG_INF, jnp.float32),
        finished_flags=jnp.zeros((b, k), bool),
        done=jnp.zeros((b,), bool),
        cache=init_cache,
    )

    # Candidate-selection strategy (all three final-output-exact, pinned by
    # tests/test_beam_shortlist.py):
    #   full      — materialize total [B,K,V], full-vocab processors, one
    #               wide top-2K (the reference semantics definition).
    #   opt       — optimistic window: wide top-W on unbanned totals,
    #               ban-check only the W winners, certificate + lax.cond
    #               fallback; skips the per-step full-vocab ngram pass.
    #               MEASURED SLOWER in situ (13.9 ms/step vs full 8.9 at
    #               b256 — the k=32 wide top-k falls off TPU TopK's fast
    #               path; scripts/logs_r3/realbs_probe_b256.log).
    #   shortlist — per-row top-16 on raw logits then [B,K,16] processors,
    #               certificate + lax.cond fallback (per-row TopK cliff:
    #               k=16 5.9 vs k=64 16.9 ms/step stub at b256,
    #               scripts/logs_r3/topk_probe_b256.log). IN-SITU WINNER:
    #               6.4 ms/step vs full 8.9 at b256 (realbs_probe).
    # Auto: shortlist when the vocab dwarfs the shortlist margin (real 50k
    # vocab yes; tiny hand-built test vocabs no — those pin tie-break
    # semantics the full path defines).
    cand_mode = resolve_cand_mode(cfg, vocab_size)

    def _candidates_full(logits, lse, s, cur):
        return candidates_full(logits, lse, s, cur, cfg=cfg, b=b, k=k,
                               vocab_size=vocab_size,
                               eos_token_id=eos_token_id,
                               forced_bos_token_id=forced_bos_token_id)

    def cond(s: BeamState):
        return (s.cur_len < L) & ~jnp.all(s.done)

    use_stats = step_stats_fn is not None and cand_mode == "shortlist"
    # fused block-lse (opt-in): share ONE full-vocab block pass between the
    # blockmax shortlist and the logsumexp instead of separate max-reduce +
    # logsumexp passes. Same eligibility as the blockmax default; the
    # certificate fallback's full path recomputes nothing (it takes lse as
    # given — a per-row constant, so its selection semantics are intact).
    import os as _os

    _c_sl = shortlist_c_width(k)
    use_block_lse = (
        _os.environ.get("VACNIC_BLOCK_LSE", "0") == "1"
        and cand_mode == "shortlist" and not use_stats
        and _os.environ.get("VACNIC_BEAM_TOPK", "blockmax") == "blockmax"
        and vocab_size >= 2 * min(_c_sl, vocab_size) * 128)

    def body(s: BeamState) -> BeamState:
        cur = s.cur_len
        tok = jax.lax.dynamic_slice_in_dim(  # last token, [BK, 1]
            flatten_beam_dim(s.running_seqs), cur - 1, 1, axis=1
        )
        if use_stats:
            logits, cv, ci, lse, new_cache = step_stats_fn(tok, s.cache, cur - 1)
            topk_scores, topk_beam, topk_tok = _candidates_shortlist(
                logits, lse, s, cur, cfg=cfg, b=b, k=k, vocab_size=vocab_size,
                eos_token_id=eos_token_id,
                forced_bos_token_id=forced_bos_token_id,
                full_fn=lambda lg, lse_, s_, cur_: _candidates_full(
                    lg[:, :vocab_size], lse_, s_, cur_),
                pre=(cv, ci))
            return _finish_body(s, cur, new_cache, topk_scores, topk_beam,
                                topk_tok)
        logits, new_cache = step_fn(tok, s.cache, cur - 1)
        logits = logits.astype(jnp.float32)  # [BK, V]
        # log_softmax + score-add in ONE fused pass: total = logits + (score
        # − logsumexp) per beam. Algebraically identical to
        # log_softmax(logits) + scores, but skips materializing the [B·K, V]
        # logprob array (measured 1.65 ms/step at b128 —
        # scripts/profile_decode_b128.py loop_nosm delta).
        blocks = None
        if use_block_lse:
            # fused block pass (VACNIC_BLOCK_LSE=1): one full-vocab read
            # yields BOTH the blockmax shortlist's block maxima AND the lse
            # (block-decomposed, exact to f32 summation order — the lse is
            # a per-row constant shift, so within-row ranking is unchanged)
            blocks = _block_view(logits)
            lse = block_lse(*blocks)
        else:
            lse = jax.scipy.special.logsumexp(logits, axis=-1)  # [BK]

        if cand_mode == "shortlist":
            topk_scores, topk_beam, topk_tok = _candidates_shortlist(
                logits, lse, s, cur, cfg=cfg, b=b, k=k, vocab_size=vocab_size,
                eos_token_id=eos_token_id,
                forced_bos_token_id=forced_bos_token_id,
                full_fn=_candidates_full, blocks=blocks)
        elif cand_mode == "opt":
            topk_scores, topk_beam, topk_tok = _candidates_opt(
                logits, lse, s, cur, cfg=cfg, b=b, k=k, vocab_size=vocab_size,
                eos_token_id=eos_token_id,
                forced_bos_token_id=forced_bos_token_id,
                full_fn=_candidates_full)
        else:
            topk_scores, topk_beam, topk_tok = _candidates_full(
                logits, lse, s, cur)
        return _finish_body(s, cur, new_cache, topk_scores, topk_beam,
                            topk_tok)

    def _finish_body(s, cur, new_cache, topk_scores, topk_beam, topk_tok):
        # candidate sequences with the new token written at position cur
        cand_seqs = gather_beams(s.running_seqs, topk_beam, b, 2 * k)  # [B, 2K, L]
        cand_seqs = jax.lax.dynamic_update_slice_in_dim(
            cand_seqs, topk_tok[:, :, None], cur, axis=2
        )

        # --- stopping criteria on each candidate (HF `stopping_criteria`):
        # eos just generated, or (modern mode) the candidate reached max_length.
        legacy = cfg.hf_compat == "4.18"
        eos_hit = topk_tok == eos_token_id
        is_last = cur + 1 >= L
        hits = eos_hit if legacy else (eos_hit | is_last)
        # eos candidates become hypotheses only when ranked within the top K
        # (4.18 beam_search.py process: `beam_token_rank >= self.group_size`
        # → skipped; identical rule in the modern vectorized path)
        admit = hits & (jnp.arange(2 * k)[None, :] < k) & ~s.done[:, None]

        # ----- finished pool: existing K + admitted candidates, keep top K --
        # eos-hypothesis normalization: 4.18 divides by len(hyp) = cur tokens
        # (incl. decoder start, EXCL. the eos; BeamHypotheses.add
        # `sum_logprobs / len(hyp)**lp`); modern divides by the generated
        # length incl. the eos (`(cur_len + 1 - decoder_prompt_len)**lp`) —
        # the +start/−eos swap makes both equal `cur`.
        new_fin_scores = topk_scores / (cur.astype(jnp.float32) ** lp)
        new_fin_scores = jnp.where(admit, new_fin_scores, NEG_INF)
        fin_scores = jnp.concatenate([s.finished_scores, new_fin_scores], axis=1)  # [B, 3K]
        fin_seqs = jnp.concatenate([s.finished_seqs, cand_seqs], axis=1)
        fin_flags = jnp.concatenate([s.finished_flags, admit], axis=1)

        # ----- running beams: top K candidates that did not hit a criterion -
        run_cand_scores = jnp.where(hits, NEG_INF, topk_scores)
        top_run_scores, top_run_idx = jax.lax.top_k(run_cand_scores, k)
        new_running_seqs = gather_beams(cand_seqs, top_run_idx, b, k)
        sel_beam = gather_beams(topk_beam, top_run_idx, b, k)  # [B, K] source beams

        if legacy:
            # 4.18 finalize: after the loop exits at max_length, ALL K running
            # beams are added with denominator len(final_tokens) = max_length
            # (incl. decoder start) — one longer than the modern generated-
            # length denominator. Folded into the last step here.
            final_admit = is_last & ~s.done[:, None] & jnp.ones((b, k), bool)
            final_scores = jnp.where(
                final_admit, top_run_scores / ((cur + 1).astype(jnp.float32) ** lp), NEG_INF
            )
            fin_scores = jnp.concatenate([fin_scores, final_scores], axis=1)  # [B, 4K]
            fin_seqs = jnp.concatenate([fin_seqs, new_running_seqs], axis=1)
            fin_flags = jnp.concatenate([fin_flags, final_admit], axis=1)

        top_fin_scores, top_fin_idx = jax.lax.top_k(fin_scores, k)
        finished_seqs = gather_beams(fin_seqs, top_fin_idx, b, k)
        finished_flags = gather_beams(fin_flags, top_fin_idx, b, k)

        # reorder cache along the B*K dim (HF `_reorder_cache`, self-attn only —
        # cross-attn KV is beam-invariant; reordering it is a no-op we skip)
        flat_sel = (jnp.arange(b)[:, None] * k + sel_beam).reshape(-1)  # [BK]

        if reorder_cache_fn is not None:
            new_cache = reorder_cache_fn(new_cache, flat_sel)
        else:
            def reorder(path, leaf):
                names = [str(p.key) for p in path if hasattr(p, "key")]
                if "cross" in names:
                    return leaf
                return jnp.take(leaf, flat_sel, axis=0)

            new_cache = jax.tree_util.tree_map_with_path(reorder, new_cache)

        # ----- done bookkeeping -------------------------------------------
        all_fin = jnp.all(finished_flags, axis=1)
        if cfg.early_stopping:
            newly_done = all_fin
        else:
            # Once all K slots are finished, stop when no candidate can
            # improve on the worst kept hypothesis. Numerator: 4.18 is_done
            # uses `next_scores.max()` — the best of ALL 2K candidates,
            # eos candidates included (beam_search.py BeamHypotheses.is_done);
            # the modern heuristic uses only the best RUNNING beam
            # (_check_early_stop_heuristic: running_beam_scores[:, :1]).
            best_num = topk_scores[:, 0] if legacy else top_run_scores[:, 0]
            best_possible = best_num / (cur.astype(jnp.float32) ** lp)
            worst_fin = jnp.min(top_fin_scores, axis=1)
            newly_done = all_fin & (best_possible <= worst_fin)
        done = s.done | newly_done

        # freeze state for done batches
        def freeze(old, new):
            extra = (1,) * (new.ndim - 1)
            return jnp.where(s.done.reshape((b,) + extra), old, new)

        return BeamState(
            cur_len=cur + 1,
            running_seqs=freeze(s.running_seqs, new_running_seqs),
            running_scores=freeze(s.running_scores, top_run_scores),
            finished_seqs=freeze(s.finished_seqs, finished_seqs),
            finished_scores=freeze(s.finished_scores, top_fin_scores),
            finished_flags=freeze(s.finished_flags, finished_flags),
            done=done,
            cache=new_cache,
        )

    state = jax.lax.while_loop(cond, body, state)

    # No separate host-side finalize: the last loop step folds the running
    # beams into the finished pool (4.18 finalize semantics in legacy mode,
    # generated-length normalization in modern mode — see body).
    # finished pool is already sorted descending; num_return_sequences=1.
    return state.finished_seqs[:, 0], state.finished_scores[:, 0]
