"""On-chip smoke + micro-bench for kernels/lm_stats at the b256 decode shape.

Checks Mosaic accepts the kernel (notably the [rb, 1] m/s output blocks),
pins parity vs the XLA head, and times kernel-vs-XLA for the fused
{LM head + lse + row top-16} bundle in a chained 50-step loop (same
measurement discipline as profile_decode_b128: device->host sync, logits
feed back into x so nothing is DCE'd).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vacnic_tpu.kernels.lm_stats import lm_stats, lm_stats_topk

BK = int(os.environ.get("SMOKE_BK", 1280))
D, V = 1024, 50267
C = 16
N_STEPS = 50
INTERP = jax.default_backend() == "cpu"  # CPU sanity runs interpret mode


def _stats(x, w, b):
    return lm_stats(x, w, b, interpret=INTERP)


def main():
    print(f"smoke_lm_stats bk={BK} backend={jax.default_backend()}", flush=True)
    key = jax.random.PRNGKey(0)
    vp = -(-V // 4096) * 4096
    x = jax.random.normal(key, (BK, D), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(key, 1), (vp, D),
                          jnp.float32).astype(jnp.bfloat16) * 0.02
    w = w.at[V:].set(0)
    b = jnp.full((1, vp), -1e9, jnp.float32).at[0, :V].set(0.0)

    # ---- parity (single call) ----------------------------------------------
    logits, m, s = jax.jit(_stats)(x, w, b)
    cv, ci, lse = jax.jit(lambda lo, mm, ss: lm_stats_topk(lo, mm, ss, C, V))(
        logits, m, s)
    ref = jnp.dot(x, w.T, preferred_element_type=jnp.float32) + b
    cv0, ci0 = jax.lax.top_k(ref[:, :V], C)
    lse0 = jax.scipy.special.logsumexp(ref[:, :V], axis=-1)
    print("max|dlogits|", float(jnp.max(jnp.abs(logits - ref))),
          "topk idx agree", float(jnp.mean((ci == ci0).astype(jnp.float32))),
          "max|dlse|", float(jnp.max(jnp.abs(lse - lse0))), flush=True)

    # ---- chained timing: kernel bundle vs XLA bundle ------------------------
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

    @jax.jit
    def run_kernel(x0, w, b):
        def body(xc, i):
            logits, m, s = _stats(xc.astype(jnp.bfloat16), w, b)
            cv, ci, lse = lm_stats_topk(logits, m, s, C, V)
            # feed stats back into x so nothing is dead
            xc = xc + cv[:, :1] * 1e-9 + lse[:, None] * 1e-9 \
                + logits[:, :D] * 1e-9
            return xc, cv[0, 0]

        xe, probe = jax.lax.scan(body, x0.astype(jnp.float32), jnp.arange(N_STEPS))
        return probe.sum()

    @jax.jit
    def run_xla(x0, w, b):
        def body(xc, i):
            logits = jnp.dot(xc.astype(jnp.bfloat16), w.T,
                             preferred_element_type=jnp.float32) + b
            logits = logits[:, :V]
            lse = jax.scipy.special.logsumexp(logits, axis=-1)
            cv, ci = jax.lax.top_k(logits, C)
            xc = xc + cv[:, :1] * 1e-9 + lse[:, None] * 1e-9 \
                + logits[:, :D] * 1e-9
            return xc, cv[0, 0]

        xe, probe = jax.lax.scan(body, x0.astype(jnp.float32), jnp.arange(N_STEPS))
        return probe.sum()

    t = timed(run_kernel, x, w, b)
    print(f"kernel bundle  {t / N_STEPS * 1e3:8.3f} ms/step ({t*1e3:.1f} total)",
          flush=True)
    t = timed(run_xla, x, w, b)
    print(f"xla bundle     {t / N_STEPS * 1e3:8.3f} ms/step ({t*1e3:.1f} total)",
          flush=True)


if __name__ == "__main__":
    main()
