"""Decompose the multimodal-encoder cost on the real chip.

The mm encoder measures 109.2 ms at batch 32 / S=512 / bf16 vs a ~57 ms
matmul roofline (CLAUDE.md); the flash-attention probe ruled OUT the
attention-score materialization as the gap. Variants (ENC_MODE, one per
process — remote compiles are erratic):

  full      — mm_encoder_fwd with all streams (sanity anchor vs bench_encoder)
  text      — plain text-only BART encoder at the same shapes: the fusion
              delta (streams, extra attentions, masks) is full - text
  onlyimg   — only_image variant (img stream, no face/ner): face+ner delta
  b64       — full at batch 64: fixed-overhead amortization check
  fused     — mm_encoder_fwd_fused (Pallas text stack, kernels/encoder_stack)
  fusedparity — one-off on-chip numeric check of fused vs XLA
  glue      — the fused path's XLA prologue ONLY (embed + sequential stream
              evolution + batched ner_map/cross-KV projections), no text
              kernel: sizes the non-kernel share at any batch. Outputs
              depend on cross_k/cross_v/x so XLA cannot DCE the prologue.

ENC_BATCH overrides the batch size (default 32; b64 mode keeps 64). The
single-call timing includes the ~28 ms tunnel round trip (CLAUDE.md) — read
DELTAS between modes at the same batch, not absolute numbers.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vacnic_tpu.core.config import VacnicConfig
from vacnic_tpu.data.synthetic import synthetic_batch
from vacnic_tpu.models import bart as B
from vacnic_tpu.models import fusion as F
from vacnic_tpu.train.train_step import create_mask, face_mask_from_emb


def main():
    import dataclasses

    mode = os.environ.get("ENC_MODE", "full")
    cfg = VacnicConfig.full_train()
    if mode == "onlyimg":
        cfg = dataclasses.replace(cfg, fusion=dataclasses.replace(cfg.fusion, only_image=True))
    batch_size = 64 if mode == "b64" else int(os.environ.get("ENC_BATCH", 32))
    key = jax.random.PRNGKey(0)
    params = F.multimodal_bart_init(key, cfg.bart, cfg.fusion)
    batch = synthetic_batch(cfg, batch_size=batch_size, seed=0)

    def mm_kwargs(batch):
        if cfg.fusion.only_image:
            return {}
        return dict(face_features=batch["face_emb"],
                    face_mask=face_mask_from_emb(batch["face_emb"]),
                    name_ids=batch["names_art_ids"],
                    name_mask=create_mask(batch["names_art_ids"]))

    if mode == "fusedparity":
        @jax.jit
        def both(params, batch):
            src = batch["article_ids"]
            a = F.mm_encoder_fwd(params, src, create_mask(src), batch["image_cls"],
                                 cfg.bart, cfg.fusion, dtype=jnp.bfloat16,
                                 **mm_kwargs(batch))["last_hidden"]
            b = F.mm_encoder_fwd_fused(params, src, create_mask(src),
                                       batch["image_cls"], cfg.bart, cfg.fusion,
                                       dtype=jnp.bfloat16, **mm_kwargs(batch))["last_hidden"]
            d = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
            return jnp.max(d), jnp.mean(d)

        print("compiling fusedparity...", file=sys.stderr, flush=True)
        mx, mn = both(params, batch)
        print(f"fused-vs-XLA last_hidden: max|d|={float(np.asarray(mx)):.4f} "
              f"mean|d|={float(np.asarray(mn)):.6f}")
        return

    if mode == "glue":
        @jax.jit
        def enc(params, batch):
            src = batch["article_ids"]
            x, sp, ck, cv, sb, cb, _ = F._fused_encoder_prologue(
                params, src, create_mask(src), batch["image_cls"],
                cfg.bart, cfg.fusion, dtype=jnp.bfloat16, **mm_kwargs(batch))
            # depend on every prologue product so nothing is DCE'd; keep the
            # returned payload tiny (tunnel moves ~25 MB/s)
            return (x[0, 0, :8].astype(jnp.float32)
                    + ck[0, 0, :8, 0].astype(jnp.float32)
                    + cv[0, 0, 0, :8].astype(jnp.float32)
                    + sb[0, :8] + cb[0, :8]
                    + sp.w_qkv[0, :8, 0].astype(jnp.float32))
    elif mode == "text":
        @jax.jit
        def enc(params, batch):
            src = batch["article_ids"]
            out = B.encoder_fwd(params, src, create_mask(src), cfg.bart,
                                dtype=jnp.bfloat16)
            return out[0, 0, :8]
    elif mode == "fused":
        @jax.jit
        def enc(params, batch):
            src = batch["article_ids"]
            out = F.mm_encoder_fwd_fused(params, src, create_mask(src),
                                         batch["image_cls"], cfg.bart, cfg.fusion,
                                         dtype=jnp.bfloat16, **mm_kwargs(batch))
            # depend on EVERY 32-item kernel slice: returning only row 0
            # lets XLA dead-code-eliminate slices 2..N — queue22 measured
            # "b256 fused = 144.9 ms" that was really glue + ONE slice
            # (the stub-harness DCE trap, decode_budget.md)
            return out["last_hidden"][::32, 0, :8]
    else:
        @jax.jit
        def enc(params, batch):
            src = batch["article_ids"]
            kw = {}
            if not cfg.fusion.only_image:
                kw = dict(face_features=batch["face_emb"],
                          face_mask=face_mask_from_emb(batch["face_emb"]),
                          name_ids=batch["names_art_ids"],
                          name_mask=create_mask(batch["names_art_ids"]))
            out = F.mm_encoder_fwd(params, src, create_mask(src),
                                   batch["image_cls"], cfg.bart, cfg.fusion,
                                   dtype=jnp.bfloat16, **kw)
            return out["last_hidden"][0, 0, :8]

    print(f"compiling {mode}...", file=sys.stderr, flush=True)
    _ = np.asarray(enc(params, batch))
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(enc(params, batch))
        best = min(best, time.perf_counter() - t0)
    print(f"{mode} (batch {batch_size}, S=512, bf16): {best*1e3:.1f} ms")


if __name__ == "__main__":
    main()
