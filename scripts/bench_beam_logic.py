"""Isolate the beam-search bookkeeping cost at bench shapes (batch 32, beam
5, vocab 50267, len 50): run the REAL infer/beam_search.py loop with a
trivial step_fn (one small matmul; no transformer), with and without
realistically-sized cache tensors in the loop state.

  logic       — processors + top-k + seq updates + done bookkeeping only
                (cache = one tiny array).
  logic+cache — adds the [12, 160, T, 1024] x2 bf16 self cache with the real
                reorder (gather + pending-row fold), T from CACHE_T (50/64).

The difference vs bench.py's total step then attributes model/kernel vs beam
vs cache costs exactly. BENCH_MODE=logic|cache, CACHE_T=64.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vacnic_tpu.core.config import DecodeConfig
from vacnic_tpu.infer.beam_search import beam_search

B, K, V, L = 32, 5, 50267, 50
N_LAYERS, D, T = 12, 1024, int(os.environ.get("CACHE_T", 64))
LAYOUT = os.environ.get("CACHE_LAYOUT", "lb")  # lb: [L,BK,T,D]; bl: [BK,L,T,D]


def main():
    mode = os.environ.get("BENCH_MODE", "logic")
    cfg = DecodeConfig(num_beams=K, max_length=L, length_penalty=2.0,
                       min_length=L - 1, no_repeat_ngram_size=3,
                       early_stopping=True, forced_eos=True)
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (256, V), jnp.bfloat16)

    if mode == "logic":
        def mk_cache():
            return {"x": jnp.zeros((B * K, 8), jnp.float32)}
    else:
        def mk_cache():
            if LAYOUT == "bl":
                return {
                    "self_k": jnp.zeros((B * K, N_LAYERS, T, D), jnp.bfloat16),
                    "self_v": jnp.zeros((B * K, N_LAYERS, T, D), jnp.bfloat16),
                    "pend_k": jnp.zeros((B * K, N_LAYERS, D), jnp.bfloat16),
                    "pend_v": jnp.zeros((B * K, N_LAYERS, D), jnp.bfloat16),
                    "pos": jnp.int32(0),
                }
            return {
                "self_k": jnp.zeros((N_LAYERS, B * K, T, D), jnp.bfloat16),
                "self_v": jnp.zeros((N_LAYERS, B * K, T, D), jnp.bfloat16),
                "pend_k": jnp.zeros((N_LAYERS, B * K, D), jnp.bfloat16),
                "pend_v": jnp.zeros((N_LAYERS, B * K, D), jnp.bfloat16),
                "pos": jnp.int32(0),
            }

    @jax.jit
    def run(tbl, cache):  # tbl as ARG: closures inline as MLIR constants
        def step_fn(tok, cache, pos):
            logits = jnp.take(tbl, tok[:, 0] % 256, axis=0).astype(jnp.float32)
            if mode != "logic":
                # logits must DEPEND on the cache or XLA dead-code-eliminates
                # the whole reorder (measured: it does)
                probe = (cache["self_k"][0, :, 0, 0] if LAYOUT == "bl"
                         else cache["self_k"][:, :, 0, 0].sum(0)).astype(jnp.float32)
                if LAYOUT == "bl":
                    probe = cache["self_k"][:, 0, 0, 0].astype(jnp.float32)
                logits = logits + probe[:, None] * 1e-9
                cache = dict(cache)
                cache["pos"] = pos
                cache["pend_k"] = cache["pend_k"] + 1e-6  # rows change per step
            return logits, cache

        def reorder(cache, flat_sel):
            axis = 0 if LAYOUT == "bl" else 1
            out = dict(cache)
            for n, p in (("self_k", "pend_k"), ("self_v", "pend_v")):
                g = jnp.take(cache[n], flat_sel, axis=axis)
                rows = jnp.take(cache[p], flat_sel, axis=axis)
                out[n] = jax.lax.dynamic_update_slice(
                    g, rows[:, :, None, :], (0, 0, cache["pos"], 0))
            return out

        return beam_search(
            step_fn, cache, B, cfg=cfg, eos_token_id=2, pad_token_id=1,
            decoder_start_token_id=2, forced_bos_token_id=0, vocab_size=V,
            reorder_cache_fn=reorder if mode != "logic" else None)[1].sum()

    print(f"compiling {mode} (T={T})...", file=sys.stderr, flush=True)
    cache = mk_cache()
    _ = np.asarray(run(table, cache))
    best = np.inf
    for _i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(run(table, cache))
        best = min(best, time.perf_counter() - t0)
    print(f"{mode} T={T} layout={LAYOUT}: {best / L * 1e3:.3f} ms/step")


if __name__ == "__main__":
    main()
