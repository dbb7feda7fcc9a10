"""Attribute the full decode-step cost AT THE BENCH SHAPE (batch 128, beam 5,
bk=640, T=64, S=512, vocab 50267) — VERDICT r2 next-step #1: ~6 of 13.3
ms/step was unattributed because prior part-benches ran at b32.

Variants (each its own jitted 50-step sequential loop; BENCH_PART selects,
comma-separated, default all — but run ONE per process on the chip: the
remote compile service serializes poorly):

  model        — chained real decode_step_pallas (kernel + anc one-hot +
                 cache row write + XLA LM head) with argmax feedback.
  model_nolm   — same but x_out probed with a tiny matmul instead of the
                 LM head: isolates LM-head matmul + bias.
  model_reorder— model + reorder_anc each step: isolates ancestry recompose.
  logic        — the REAL beam_search loop with a stub step_fn (table-lookup
                 logits): log_softmax + processors + top-k + bookkeeping +
                 while-loop overhead (bench_beam_logic generalized to b128).
  logic_noproc — logic with min_length/ngram/forced processors disabled:
                 the processor delta.
  softmax_topk — standalone log_softmax + score-add + reshape + top-2K scan.
  topk_only    — standalone reshape + top-2K scan (no softmax).
  ngram        — standalone no-repeat-ngram processor scan (the [B,K,V]
                 scatter is the suspected hot spot).
  loop_shortlist / loop_blockmax / loop_rowtopk16 — candidate top-k
                 strategy stubs (see loop_strategy_variants).
  loop_realbs  — the ACTUAL beam_search with a stub step_fn; the only
                 trustworthy beam-logic harness (stub loop_* variants let
                 XLA DCE the total materialization). VACNIC_BEAM_LOGIC /
                 VACNIC_BEAM_TOPK / PROBE_NOLSE select the configuration.

Full-step identity to check: full_bench_step ≈ model + (logic − stub) + gap.
Writes one line per variant; run with a full log file, never through tail.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vacnic_tpu.core.config import DecodeConfig, VacnicConfig
from vacnic_tpu.infer import decode_fast as DF
from vacnic_tpu.infer.beam_search import _apply_no_repeat_ngram, beam_search
from vacnic_tpu.models import fusion as F

BATCH = int(os.environ.get("BENCH_BATCH", 128))
BEAMS, V, L = 5, 50267, 50
T_MAX, S, D = 64, 512, 1024
N_STEPS = 50
BK = BATCH * BEAMS


def timed(fn, *args, n=3):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = np.inf
    for _i in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def emit(name, seconds):
    print(f"{name:14s} {seconds / N_STEPS * 1e3:8.3f} ms/step "
          f"({seconds * 1e3:.1f} ms total)", flush=True)


def model_variants(parts, cfg, params):
    bart = cfg.bart
    key = jax.random.PRNGKey(0)
    dp = DF.build_decode_params(params)
    enc_out = jax.random.normal(jax.random.fold_in(key, 1), (BATCH, S, D), jnp.bfloat16)
    int8 = os.environ.get("PROF_INT8") == "1"
    enc_bias = jnp.zeros((BATCH, 1, 1, S), jnp.float32)
    plan = DF.choose_plan(BK, BATCH, T_MAX, dp.w_fc1.shape[2])
    print(f"plan: {plan} int8={int8}", flush=True)

    def chained(with_lm: bool, with_reorder: bool):
        probe_w = jax.random.normal(jax.random.fold_in(key, 2), (D, 128), jnp.bfloat16)

        # build the cache INSIDE the jit (from enc_out): passing it as a jit
        # argument keeps the input buffer alive next to the scan carry — two
        # self-cache copies ≈ 8 GB at b256 OOM where the real while_loop path
        # fits. In-jit build adds one cross-KV projection per 50-step loop
        # (~0.1 ms/step noise).
        self_fp8 = os.environ.get("VACNIC_SELFKV_FP8") == "1"

        @jax.jit
        def run(dp, params, enc_bias, enc_out, probe_w):
            cache = DF.build_decode_cache(params, enc_out, BEAMS, L, bart,
                                          pad_to=16, time_major=True,
                                          cross_kv_int8=int8,
                                          self_kv_fp8=self_fp8)
            def body(carry, pos):
                tok, cache = carry
                logits, cache = DF.decode_step_pallas(
                    dp, params, cache, tok, pos, enc_bias, bart, plan=plan)
                if not with_lm:
                    # bypass the LM head cost: decode_step_pallas already ran
                    # it (XLA head); to isolate, recompute tok from a tiny
                    # probe of the logits' first column only
                    tok = (jnp.argmax(logits[:, :128], axis=-1))[:, None]
                else:
                    tok = jnp.argmax(logits, axis=-1)[:, None].astype(jnp.int32)
                if with_reorder:
                    sel = (jnp.arange(BK, dtype=jnp.int32) // BEAMS) * BEAMS \
                        + (jnp.arange(BK, dtype=jnp.int32) + tok[0, 0]) % BEAMS
                    cache = DF.reorder_anc(cache, sel)
                return (tok.astype(jnp.int32), cache), logits[0, 0]

            (tok, _), probe = jax.lax.scan(
                body, (jnp.zeros((BK, 1), jnp.int32), cache), jnp.arange(N_STEPS))
            return probe.sum()

        return run

    if "model" in parts:
        emit("model", timed(chained(True, False), dp, params, enc_bias, enc_out,
                            jnp.zeros((D, 128), jnp.bfloat16)))
    if "model_reorder" in parts:
        emit("model_reorder", timed(chained(True, True), dp, params, enc_bias,
                                    enc_out, jnp.zeros((D, 128), jnp.bfloat16)))


def model_nolm_variant(cfg, params):
    """decode_step_pallas with the XLA LM head REPLACED by a 128-column probe
    (separate function: needs the internal pieces, not the public step)."""
    bart = cfg.bart
    key = jax.random.PRNGKey(0)
    dp = DF.build_decode_params(params)
    enc_out = jax.random.normal(jax.random.fold_in(key, 1), (BATCH, S, D), jnp.bfloat16)
    int8 = os.environ.get("PROF_INT8") == "1"
    enc_bias = jnp.zeros((BATCH, 1, 1, S), jnp.float32)
    plan = DF.choose_plan(BK, BATCH, T_MAX, dp.w_fc1.shape[2])
    from vacnic_tpu.kernels.decode_layer import decode_stack
    from vacnic_tpu.models.bart import POS_OFFSET
    from vacnic_tpu.models.layers import layernorm

    probe_w = jax.random.normal(jax.random.fold_in(key, 2), (D, 128), jnp.bfloat16)

    # cache built INSIDE the jit and int8 matched to the base probe: passing
    # it as a jit argument keeps a second ~4 GB self-cache copy alive next to
    # the scan carry (RESOURCE_EXHAUSTED at b256 in queue6 AND queue7 — the
    # base `chained` harness had the same bug fixed earlier), and a bf16
    # cross-KV here would make the nolm-vs-base delta compare different
    # cross traffic.
    @jax.jit
    def run(dp, params, enc_bias, enc_out, probe_w):
        cache = DF.build_decode_cache(params, enc_out, BEAMS, L, bart,
                                      pad_to=16, time_major=True,
                                      cross_kv_int8=int8)
        dec = params["decoder"]

        def body(carry, pos):
            tok, cache = carry
            x = jnp.take(params["shared"]["weight"], tok[:, 0], axis=0).astype(jnp.bfloat16)
            x = x + jnp.take(dec["embed_positions"]["weight"], pos + POS_OFFSET,
                             axis=0).astype(jnp.bfloat16)
            x = layernorm(dec["layernorm_embedding"], x).astype(jnp.bfloat16)
            bkc = BK // plan.n_self
            group = (jnp.arange(BK, dtype=jnp.int32) // bkc) * bkc
            anc_hot = jax.nn.one_hot(cache.anc - group[None, :], bkc, dtype=jnp.bfloat16)
            logits_p, x_out, k_new, v_new = decode_stack(
                dp, x, pos, cache.self_k, cache.self_v, anc_hot,
                cache.cross_k, cache.cross_v,
                enc_bias[:, 0, 0, :].astype(jnp.float32),
                jnp.zeros((128, D), jnp.bfloat16), jnp.zeros((1, 128), jnp.float32),
                bart, plan=plan._replace(n_lm=0),
                cross_k_scale=cache.cross_k_scale,
                cross_v_scale=cache.cross_v_scale)
            new_k = jax.lax.dynamic_update_slice(cache.self_k, k_new[:, None, :, :],
                                                 (0, pos, 0, 0))
            new_v = jax.lax.dynamic_update_slice(cache.self_v, v_new[:, None, :, :],
                                                 (0, pos, 0, 0))
            cache = cache._replace(self_k=new_k, self_v=new_v, pos=pos)
            small = jnp.dot(x_out, probe_w, preferred_element_type=jnp.float32)
            tok = jnp.argmax(small, axis=-1)[:, None].astype(jnp.int32)
            return (tok, cache), small[0, 0]

        (tok, _), probe = jax.lax.scan(
            body, (jnp.zeros((BK, 1), jnp.int32), cache), jnp.arange(N_STEPS))
        return probe.sum()

    emit("model_nolm", timed(run, dp, params, enc_bias, enc_out, probe_w))


def logic_variants(parts):
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (256, V), jnp.bfloat16)

    def run_logic(with_procs: bool):
        cfg = DecodeConfig(
            num_beams=BEAMS, max_length=L, length_penalty=2.0,
            min_length=L - 1 if with_procs else 0,
            no_repeat_ngram_size=3 if with_procs else 0,
            early_stopping=True, forced_eos=with_procs)

        @jax.jit
        def run(tbl, cache):
            def step_fn(tok, cache, pos):
                logits = jnp.take(tbl, tok[:, 0] % 256, axis=0).astype(jnp.float32)
                return logits, {"x": cache["x"] + 1e-6}

            return beam_search(
                step_fn, cache, BATCH, cfg=cfg, eos_token_id=2, pad_token_id=1,
                decoder_start_token_id=2, forced_bos_token_id=0, vocab_size=V)[1].sum()

        cache = {"x": jnp.zeros((BK, 8), jnp.float32)}
        return timed(run, table, cache)

    if "logic" in parts:
        emit("logic", run_logic(True))
    if "logic_noproc" in parts:
        emit("logic_noproc", run_logic(False))


def softmax_topk_variants(parts):
    key = jax.random.PRNGKey(0)
    logits0 = jax.random.normal(key, (BK, V), jnp.float32)
    scores0 = jnp.zeros((BATCH, BEAMS), jnp.float32)

    @jax.jit
    def sm_topk(logits0, scores0):
        def body(scores, i):
            lp = jax.nn.log_softmax(logits0 + scores.sum() * 1e-9, axis=-1)
            total = lp.reshape(BATCH, BEAMS, V) + scores[:, :, None]
            ts, ti = jax.lax.top_k(total.reshape(BATCH, BEAMS * V), 2 * BEAMS)
            return ts[:, :BEAMS], ts[0, 0]

        s, probe = jax.lax.scan(body, scores0, jnp.arange(N_STEPS))
        return probe.sum()

    @jax.jit
    def topk_only(logits0, scores0):
        def body(scores, i):
            total = (logits0 + scores.sum() * 1e-9).reshape(BATCH, BEAMS * V)
            ts, ti = jax.lax.top_k(total, 2 * BEAMS)
            return ts[:, :BEAMS], ts[0, 0]

        s, probe = jax.lax.scan(body, scores0, jnp.arange(N_STEPS))
        return probe.sum()

    if "softmax_topk" in parts:
        emit("softmax_topk", timed(sm_topk, logits0, scores0))
    if "topk_only" in parts:
        emit("topk_only", timed(topk_only, logits0, scores0))


def loop_parts_variants(parts):
    """The REAL while_loop shape with individual heavy ops STUBBED (wrong
    results, same shapes) — differential attribution inside the true compile
    context (the isolated scan variants read 15x the in-loop cost; XLA
    compiles top_k differently there, so isolate by subtraction instead)."""
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (256, V), jnp.bfloat16)

    def run_loop(no_topk=False, no_softmax=False, no_bookkeeping=False):
        lcfg = DecodeConfig(num_beams=BEAMS, max_length=L, length_penalty=2.0,
                            min_length=L - 1, no_repeat_ngram_size=3,
                            early_stopping=True, forced_eos=True)

        @jax.jit
        def run(tbl):
            def cond(s):
                return s["cur"] < L

            def body(s):
                cur = s["cur"]
                tok = jax.lax.dynamic_slice_in_dim(
                    s["seqs"].reshape(BATCH * BEAMS, L), cur - 1, 1, axis=1)
                logits = jnp.take(tbl, tok[:, 0] % 256, axis=0).astype(jnp.float32)
                if no_softmax:
                    lp = logits * 0.9999
                else:
                    lp = jax.nn.log_softmax(logits, axis=-1)
                lp = lp.reshape(BATCH, BEAMS, V)
                # min_length + forced processors (elementwise; ngram measured
                # separately at 1.2 ms — keep off here to isolate)
                lp = jnp.where(
                    (cur < lcfg.min_length)
                    & (jnp.arange(V)[None, None, :] == 2), -1e7, lp)
                total = lp + s["scores"][:, :, None]
                flat = total.reshape(BATCH, BEAMS * V)
                if no_topk:
                    ts = jax.lax.dynamic_slice_in_dim(flat, 0, 2 * BEAMS, axis=1) \
                        + jnp.float32(cur)
                    ti = jnp.broadcast_to(
                        jnp.arange(2 * BEAMS, dtype=jnp.int32)[None, :],
                        (BATCH, 2 * BEAMS)) * (V // 2)
                elif os.environ.get("LOOP_APPROX") == "1":
                    ts, ti = jax.lax.approx_max_k(flat, 2 * BEAMS,
                                                  recall_target=1.0)
                else:
                    ts, ti = jax.lax.top_k(flat, 2 * BEAMS)
                if no_bookkeeping:
                    seqs = s["seqs"]
                    scores = ts[:, :BEAMS]
                else:
                    beam = ti // V
                    tokn = ti % V
                    cand = jnp.take_along_axis(
                        s["seqs"], beam[:, :, None], axis=1)  # [B, 2K, L]
                    cand = jax.lax.dynamic_update_slice_in_dim(
                        cand, tokn[:, :, None], cur, axis=2)
                    keep_s, keep_i = jax.lax.top_k(ts, BEAMS)
                    seqs = jnp.take_along_axis(cand, keep_i[:, :, None], axis=1)
                    scores = keep_s
                return {"cur": cur + 1, "seqs": seqs, "scores": scores}

            init = {
                "cur": jnp.int32(1),
                "seqs": jnp.full((BATCH, BEAMS, L), 1, jnp.int32),
                "scores": jnp.tile(jnp.array([0.0] + [-1e7] * (BEAMS - 1),
                                             jnp.float32), (BATCH, 1)),
            }
            out = jax.lax.while_loop(cond, body, init)
            return out["scores"].sum()

        return timed(run, table)

    if "loop_full" in parts:
        emit("loop_full", run_loop())
    if "loop_notopk" in parts:
        emit("loop_notopk", run_loop(no_topk=True))
    if "loop_nosm" in parts:
        emit("loop_nosm", run_loop(no_softmax=True))
    if "loop_nobk" in parts:
        emit("loop_nobk", run_loop(no_bookkeeping=True))


def loop_strategy_variants(parts):
    """Candidate NEW beam-logic strategies, measured in the REAL while_loop
    (isolation trap: isolated scans mis-measure top_k by >15x).

    loop_shortlist — per-(batch,beam)-row shortlist FIRST on RAW logits:
        within a row, ranking by total = logit + (score - lse) is invariant
        to the per-row constant shift, so per-row top-C by raw logit (C=64
        covers top-10 + the <=49-token worst-case ngram+eos ban margin)
        is exact. Downstream (lse add, ngram ban check, final top-10) runs
        on [B, K, C] instead of [B, K*V]; the only remaining full-width
        passes are the lse reduction and the top-C itself.
    loop_blockmax — keep the current full-width `total`, replace the final
        top-2K with an exact two-stage: per-1024-block max-reduce ->
        top-10 blocks (any block holding a global top-10 value must rank
        in the top-10 by block max — pigeonhole) -> gather 10 blocks/row ->
        top-10 over [B, 10240].
    loop_rowtopk16 — per-row top_k at k=16: TopK k-scaling probe.
    """
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (256, V), jnp.bfloat16)
    C = 64

    def stub_logits(tbl, seqs, cur):
        tok = jax.lax.dynamic_slice_in_dim(
            seqs.reshape(BATCH * BEAMS, L), cur - 1, 1, axis=1)
        return jnp.take(tbl, tok[:, 0] % 256, axis=0).astype(jnp.float32)

    def banned_tokens(seqs, cur):
        """[B, K, P] token ids banned by ngram-3 (invalid slots = -1) — the
        library matcher, so the probe measures production semantics."""
        from vacnic_tpu.infer.beam_search import _ngram_matches

        match, btok = _ngram_matches(seqs, cur, 3)
        return jnp.where(match, btok, -1)

    def run_shortlist(k_row=C, with_lse=True):
        @jax.jit
        def run(tbl):
            def cond(s):
                return s["cur"] < L

            def body(s):
                cur = s["cur"]
                logits = stub_logits(tbl, s["seqs"], cur)  # [BK, V] f32
                cv, ci = jax.lax.top_k(logits, k_row)      # [BK, C]
                if with_lse:
                    lse = jax.scipy.special.logsumexp(logits, axis=-1)  # [BK]
                else:
                    lse = logits[:, 0] * 1e-9
                shift = s["scores"].reshape(-1) - lse
                total = (cv + shift[:, None]).reshape(BATCH, BEAMS, k_row)
                ci3 = ci.reshape(BATCH, BEAMS, k_row)
                # processors on the candidate set only
                ban = banned_tokens(s["seqs"], cur)  # [B, K, P]
                hit = jnp.any(ci3[:, :, :, None] == ban[:, :, None, :], axis=-1)
                hit = hit | ((cur < L - 1) & (ci3 == 2))  # min_length eos ban
                total = jnp.where(hit, s["scores"][:, :, None] - 1e7, total)
                flat = total.reshape(BATCH, BEAMS * k_row)
                ts, ti = jax.lax.top_k(flat, 2 * BEAMS)
                beam = ti // k_row
                tokn = jnp.take_along_axis(
                    ci3.reshape(BATCH, BEAMS * k_row), ti, axis=1)
                cand = jnp.take_along_axis(s["seqs"], beam[:, :, None], axis=1)
                cand = jax.lax.dynamic_update_slice_in_dim(
                    cand, tokn[:, :, None], cur, axis=2)
                keep_s, keep_i = jax.lax.top_k(ts, BEAMS)
                seqs = jnp.take_along_axis(cand, keep_i[:, :, None], axis=1)
                return {"cur": cur + 1, "seqs": seqs, "scores": keep_s}

            init = {
                "cur": jnp.int32(1),
                "seqs": jnp.full((BATCH, BEAMS, L), 1, jnp.int32),
                "scores": jnp.tile(jnp.array([0.0] + [-1e7] * (BEAMS - 1),
                                             jnp.float32), (BATCH, 1)),
            }
            out = jax.lax.while_loop(cond, body, init)
            return out["scores"].sum()

        return timed(run, table)

    def run_blockmax(blk=1024):
        @jax.jit
        def run(tbl):
            def cond(s):
                return s["cur"] < L

            def body(s):
                cur = s["cur"]
                logits = stub_logits(tbl, s["seqs"], cur)
                lp = jax.nn.log_softmax(logits, axis=-1).reshape(BATCH, BEAMS, V)
                lp = jnp.where(
                    (cur < L - 1)
                    & (jnp.arange(V)[None, None, :] == 2), -1e7, lp)
                total = lp + s["scores"][:, :, None]
                flat = total.reshape(BATCH, BEAMS * V)
                n = BEAMS * V
                nb = -(-n // blk)
                padded = jnp.pad(flat, ((0, 0), (0, nb * blk - n)),
                                 constant_values=-jnp.inf)
                bmax = padded.reshape(BATCH, nb, blk).max(axis=-1)  # [B, nb]
                _, bidx = jax.lax.top_k(bmax, 2 * BEAMS)            # [B, 2K]
                gat = jnp.take_along_axis(
                    padded.reshape(BATCH, nb, blk), bidx[:, :, None], axis=1
                ).reshape(BATCH, 2 * BEAMS * blk)
                ts, tj = jax.lax.top_k(gat, 2 * BEAMS)
                ti = jnp.take_along_axis(
                    (bidx[:, :, None] * blk
                     + jnp.arange(blk)[None, None, :]).reshape(BATCH, -1),
                    tj, axis=1)
                beam = ti // V
                tokn = ti % V
                cand = jnp.take_along_axis(s["seqs"], beam[:, :, None], axis=1)
                cand = jax.lax.dynamic_update_slice_in_dim(
                    cand, tokn[:, :, None], cur, axis=2)
                keep_s, keep_i = jax.lax.top_k(ts, BEAMS)
                seqs = jnp.take_along_axis(cand, keep_i[:, :, None], axis=1)
                return {"cur": cur + 1, "seqs": seqs, "scores": keep_s}

            init = {
                "cur": jnp.int32(1),
                "seqs": jnp.full((BATCH, BEAMS, L), 1, jnp.int32),
                "scores": jnp.tile(jnp.array([0.0] + [-1e7] * (BEAMS - 1),
                                             jnp.float32), (BATCH, 1)),
            }
            out = jax.lax.while_loop(cond, body, init)
            return out["scores"].sum()

        return timed(run, table)

    if "loop_shortlist" in parts:
        emit("loop_shortlist", run_shortlist())
    if "loop_shortlist_nolse" in parts:
        emit("loop_shortlist_nolse", run_shortlist(with_lse=False))
    if "loop_rowtopk16" in parts:
        emit("loop_rowtopk16", run_shortlist(k_row=16))
    if "loop_blockmax" in parts:
        emit("loop_blockmax", run_blockmax())


def real_bs_variant(parts):
    """The ACTUAL vacnic_tpu.infer.beam_search with a stub table step_fn at
    the bench vocab/shape — the real beam-logic cost per candidate mode
    (select with VACNIC_BEAM_LOGIC=full|opt|shortlist before launch).
    min_length pins a full-length decode so all N_STEPS run."""
    if "loop_realbs" not in parts:
        return
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (256, V), jnp.bfloat16)
    cfg = DecodeConfig(num_beams=BEAMS, max_length=L, length_penalty=2.0,
                       early_stopping=True, no_repeat_ngram_size=3,
                       forced_eos=True, min_length=L - 1)

    @jax.jit
    def run(tbl):
        def sf(tok, cache, pos):
            return jnp.take(tbl, tok[:, 0] % 256, axis=0), cache + 1

        seqs, scores = beam_search(
            sf, jnp.zeros((BATCH * BEAMS, 8), jnp.float32), BATCH, cfg=cfg,
            eos_token_id=2, pad_token_id=1, decoder_start_token_id=2,
            forced_bos_token_id=0, vocab_size=V)
        return scores.sum()

    if os.environ.get("PROBE_NOLSE") == "1":
        # attribution stub: replace the full-width logsumexp with a cheap
        # slice (wrong scores, same shapes) to isolate the lse pass cost
        import jax.scipy.special as _jsp

        _jsp.logsumexp = lambda x, axis=-1: x[..., 0] * 1e-9

    mode = os.environ.get("VACNIC_BEAM_LOGIC", "auto")
    tag = "nolse," if os.environ.get("PROBE_NOLSE") == "1" else ""
    topk = os.environ.get("VACNIC_BEAM_TOPK", "")
    emit(f"loop_realbs[{tag}{topk}{mode}]", timed(run, table))


def ngram_variant():
    key = jax.random.PRNGKey(0)
    seqs = jax.random.randint(key, (BATCH, BEAMS, L), 4, 100)
    logits0 = jax.random.normal(key, (BATCH, BEAMS, V), jnp.float32)

    @jax.jit
    def run(seqs, logits0):
        def body(carry, i):
            lp = _apply_no_repeat_ngram(seqs, jnp.int32(40) + carry.astype(jnp.int32) * 0,
                                        logits0 + carry * 1e-9, 3)
            return lp[0, 0, 0], lp[0, 0, 0]

        s, probe = jax.lax.scan(body, jnp.float32(0), jnp.arange(N_STEPS))
        return probe.sum()

    emit("ngram", timed(run, seqs, logits0))


def main():
    parts = os.environ.get("BENCH_PART", "model,logic").split(",")
    print(f"profile_decode b{BATCH} parts={parts} backend={jax.default_backend()}",
          flush=True)
    needs_model = {"model", "model_reorder", "model_nolm"} & set(parts)
    if needs_model:
        cfg = VacnicConfig.full_train()
        params = F.multimodal_bart_init(jax.random.PRNGKey(0), cfg.bart, cfg.fusion)
        params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
        if {"model", "model_reorder"} & set(parts):
            model_variants(parts, cfg, params)
        if "model_nolm" in parts:
            model_nolm_variant(cfg, params)
    logic_variants(parts)
    softmax_topk_variants(parts)
    loop_parts_variants(parts)
    loop_strategy_variants(parts)
    real_bs_variant(parts)
    if "ngram" in parts:
        ngram_variant()


if __name__ == "__main__":
    main()
