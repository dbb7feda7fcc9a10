"""Decompose the decode-step cost on the real chip (round-2 kernel targeting).

Variants, each 12 scanned layers at the bench shapes (batch 32 · beam 5 = 160
rows, d=1024, ffn=4096, T=50, S=512):

  matmuls   — the 6 weight matmuls only (qkv, self_out, cross_q, cross_out,
              fc1, fc2): the pure weight-streaming floor (~342 MB/step).
  +selfkv   — matmuls + self-KV cache update/read ([L,160,50,1024]×2).
  +cross    — matmuls + cross-attention reads ([L,32,16,64,512]×2).
  full      — the real decode_step (everything incl. LM head + softmaxes).

Timing per CLAUDE.md: N steps inside ONE jitted scan, device→host transfer of
a small scalar to synchronize (block_until_ready does not block on the
tunneled backend).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from vacnic_tpu.core.config import VacnicConfig
from vacnic_tpu.infer import decode_fast as DF
from vacnic_tpu.models import fusion as F

BATCH, BEAMS, T_MAX, S = 32, 5, 50, 512
N_STEPS = 50


def timed(fn, *args, n=3):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])  # warm compile + sync
    best = np.inf
    for _i in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import os
    only = os.environ.get("BENCH_PART")  # run one variant per process: the
    # remote compile service is erratic (45s-10min/program, CLAUDE.md)
    cfg = VacnicConfig.full_train()
    bart = cfg.bart
    key = jax.random.PRNGKey(0)
    params = F.multimodal_bart_init(key, bart, cfg.fusion)
    dp = DF.build_decode_params(params)
    enc_out = jax.random.normal(jax.random.fold_in(key, 1), (BATCH, S, bart.d_model),
                                jnp.bfloat16)
    cache = DF.build_decode_cache(params, enc_out, BEAMS, T_MAX, bart)
    enc_bias = jnp.zeros((BATCH, 1, 1, S), jnp.float32)
    bk = BATCH * BEAMS
    d = bart.d_model

    results = {}

    # ---- full decode_step ---------------------------------------------------
    @jax.jit
    def full(dp, params, enc_bias, cache):
        def body(carry, pos):
            tok, cache = carry
            logits, cache = DF.decode_step(dp, params, cache, tok, pos, enc_bias, bart)
            tok = jnp.argmax(logits, axis=-1)[:, None].astype(jnp.int32)
            return (tok, cache), logits[0, 0]
        (tok, _), probe = jax.lax.scan(body, (jnp.zeros((bk, 1), jnp.int32), cache),
                                       jnp.arange(N_STEPS))
        return probe.sum()

    if only in (None, "full"):
        results["full"] = timed(full, dp, params, enc_bias, cache) / N_STEPS

    # ---- matmuls only -------------------------------------------------------
    @jax.jit
    def matmuls(dp, x0):
        def body(x, pos):
            def layer(x, w):
                (w_qkv, w_so, w_cq, w_co, w1, w2) = w
                q = jnp.dot(x, w_qkv, preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)[:, :d]
                x = jnp.dot(q, w_so, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                x = jnp.dot(x, w_cq, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                x = jnp.dot(x, w_co, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                h = jnp.dot(x, w1, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                x = jnp.dot(h, w2, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                return x, ()
            x, _ = jax.lax.scan(layer, x, (dp.w_qkv, dp.w_self_out, dp.w_cross_q,
                                           dp.w_cross_out, dp.w_fc1, dp.w_fc2))
            return x, x[0, 0]
        x, probe = jax.lax.scan(body, x0, jnp.arange(N_STEPS))
        return probe.sum()

    x0 = jax.random.normal(key, (bk, d), jnp.bfloat16)
    if only in (None, "matmuls"):
        results["matmuls"] = timed(matmuls, dp, x0) / N_STEPS

    # ---- matmuls + self-KV cache -------------------------------------------
    h_heads, hd = bart.decoder_attention_heads, bart.head_dim

    @jax.jit
    def with_selfkv(dp, x0, self_k, self_v):
        def body(carry, pos):
            x, self_k, self_v = carry
            t_idx = jnp.arange(T_MAX)
            bias = jnp.where(t_idx <= pos, 0.0, jnp.finfo(jnp.float32).min)
            def layer(x, w):
                (w_qkv, w_so, k_cache, v_cache) = w
                qkv = jnp.dot(x, w_qkv, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
                k_cache = jax.lax.dynamic_update_slice(k_cache, k_new[:, None, :], (0, pos, 0))
                v_cache = jax.lax.dynamic_update_slice(v_cache, v_new[:, None, :], (0, pos, 0))
                qh = (q * hd**-0.5).reshape(bk, h_heads, hd)
                s = jnp.einsum("bhd,bthd->bht", qh, k_cache.reshape(bk, T_MAX, h_heads, hd),
                               preferred_element_type=jnp.float32) + bias[None, None, :]
                p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
                o = jnp.einsum("bht,bthd->bhd", p, v_cache.reshape(bk, T_MAX, h_heads, hd),
                               preferred_element_type=jnp.float32)
                x = jnp.dot(o.astype(jnp.bfloat16).reshape(bk, d), w_so,
                            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                return x, (k_cache, v_cache)
            x, (self_k, self_v) = jax.lax.scan(
                layer, x, (dp.w_qkv, dp.w_self_out, self_k, self_v))
            return (x, self_k, self_v), x[0, 0]
        (x, _, _), probe = jax.lax.scan(body, (x0, self_k, self_v), jnp.arange(N_STEPS))
        return probe.sum()

    if only in (None, "selfkv"):
        results["+selfkv"] = timed(with_selfkv, dp, x0, cache.self_k, cache.self_v) / N_STEPS

    # ---- matmuls + cross-attention -------------------------------------------
    @jax.jit
    def with_cross(dp, ck_all, cv_all, x0):
        def body(x, pos):
            def layer(x, w):
                (w_cq, w_co, ck, cv) = w
                q = (jnp.dot(x, w_cq, preferred_element_type=jnp.float32)
                     .astype(jnp.bfloat16) * hd**-0.5)
                qh = q.reshape(BATCH, BEAMS, h_heads, hd)
                s = jnp.einsum("bkhd,bhds->bkhs", qh, ck, preferred_element_type=jnp.float32)
                p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
                o = jnp.einsum("bkhs,bhds->bkhd", p, cv, preferred_element_type=jnp.float32)
                x = jnp.dot(o.astype(jnp.bfloat16).reshape(bk, d), w_co,
                            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                return x, ()
            x, _ = jax.lax.scan(layer, x, (dp.w_cross_q, dp.w_cross_out,
                                           ck_all, cv_all))
            return x, x[0, 0]
        x, probe = jax.lax.scan(body, x0, jnp.arange(N_STEPS))
        return probe.sum()

    if only in (None, "cross"):
        results["+cross"] = timed(with_cross, dp, cache.cross_k, cache.cross_v, x0) / N_STEPS

    # ---- LM head alone --------------------------------------------------------
    @jax.jit
    def lm_head(w_shared, x0):
        def body(x, pos):
            logits = jnp.dot(x, w_shared.astype(jnp.bfloat16).T,
                             preferred_element_type=jnp.float32)
            lp = jax.nn.log_softmax(logits, axis=-1)
            return x, lp[0, 0]
        x, probe = jax.lax.scan(body, x0, jnp.arange(N_STEPS))
        return probe.sum()

    if only in (None, "lm_head"):
        results["lm_head"] = timed(lm_head, params["shared"]["weight"], x0) / N_STEPS

    for k, v in results.items():
        print(f"{k:10s} {v*1e3:8.3f} ms/step")


if __name__ == "__main__":
    main()
