"""Bisect the encoder-stack kernel's Mosaic compile failure at bench shapes:
ENC_PARTS selects which sub-blocks compile ("self", "cross", "ffn" or
comma-combos). Random weights — only shapes/lowering matter."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vacnic_tpu.core.config import BartConfig
from vacnic_tpu.kernels.encoder_stack import EncPlan, EncStackParams, encoder_text_stack

L, B, S, D, KV, F = 12, 32, 512, 1024, 40, 4096


def main():
    parts = os.environ.get("ENC_PARTS", "self,cross,ffn")
    cfg = BartConfig(vocab_size=1024, d_model=D, encoder_attention_heads=16,
                     decoder_attention_heads=16, encoder_ffn_dim=F,
                     decoder_ffn_dim=F, encoder_layers=L, decoder_layers=L)
    k = jax.random.PRNGKey(0)

    def r(*shape, dtype=jnp.bfloat16, scale=0.02):
        return (jax.random.normal(jax.random.fold_in(k, hash(shape) % 2**31),
                                  shape, jnp.float32) * scale).astype(dtype)

    sp = EncStackParams(
        w_qkv=r(L, D, 3 * D), b_qkv=r(L, 1, 3 * D, dtype=jnp.float32),
        w_so=r(L, D, D), b_so=r(L, 1, D, dtype=jnp.float32),
        ln_s=jnp.broadcast_to(jnp.stack([jnp.ones(D), jnp.zeros(D)]), (L, 2, D)).astype(jnp.float32),
        w_cq=r(L, D, D), b_cq=r(L, 1, D, dtype=jnp.float32),
        w_co=r(L, D, D), b_co=r(L, 1, D, dtype=jnp.float32),
        ln_c=jnp.broadcast_to(jnp.stack([jnp.ones(D), jnp.zeros(D)]), (L, 2, D)).astype(jnp.float32),
        w_fc1=r(L, D, F), b_fc1=r(L, 1, F, dtype=jnp.float32),
        w_fc2=r(L, F, D), b_fc2=r(L, 1, D, dtype=jnp.float32),
        ln_f=jnp.broadcast_to(jnp.stack([jnp.ones(D), jnp.zeros(D)]), (L, 2, D)).astype(jnp.float32),
    )
    x0 = r(B, S, D)
    ck = r(L, B, D, KV)
    cv = r(L, B, KV, D)
    sbias = jnp.zeros((B, S), jnp.float32)
    cbias = jnp.zeros((B, KV), jnp.float32)
    plan = EncPlan(
        parts=parts,
        n_self=int(os.environ.get("ENC_NSELF", EncPlan().n_self)),
        vmem_mb=int(os.environ.get("ENC_VMEM", EncPlan().vmem_mb)),
        fuse_ffn=bool(int(os.environ.get("ENC_FUSE", "0"))),
    )

    fn = jax.jit(lambda sp, x0, ck, cv, sb, cb: encoder_text_stack(
        sp, x0, ck, cv, sb, cb, cfg, plan=plan)[:, 0, :8])
    print(f"compiling parts={parts}...", file=sys.stderr, flush=True)
    out = np.asarray(fn(sp, x0, ck, cv, sbias, cbias))
    import time

    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(fn(sp, x0, ck, cv, sbias, cbias))
        best = min(best, time.perf_counter() - t0)
    print(f"parts={parts}: OK, out mean {float(np.mean(np.abs(out))):.5f}, "
          f"{best*1e3:.1f} ms")


if __name__ == "__main__":
    main()
