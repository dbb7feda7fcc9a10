"""On-chip parity/smoke for the per-row int8 self-KV cache (r4b).

Rolls N decode steps with beam reorders through the fused kernel twice —
bf16 self cache vs int8 self cache (real write path: decode_step_pallas
quantizes new rows via quantize_self_rows and the kernel beam-aligns the
per-(L, t, row, H) scales with the ancestry one-hot). Proves the Mosaic
lowering of the 4D scale blocks + the batched f32 scale-gather matmul on
the real chip and reports the numeric distance. Random weights make token
agreement an unreliable quality signal (near-degenerate logits — see
PARITY.md); the QUALITY verdict comes from scripts/gate_selfkv_int8.py on
the trained gate model. This script asserts only structural health:
finite logits, finite bounded dlogit, and the int8 rows actually written.

Run:  python scripts/parity_selfkv_int8.py          (b64 x beam5 shapes,
      bkc=80 — the mosaic_probe_int8win-validated int8 window)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vacnic_tpu.core.config import VacnicConfig
from vacnic_tpu.infer import decode_fast as DF
from vacnic_tpu.models import fusion as F

BATCH, BEAMS, MAX_LEN, S = 64, 5, 50, 512
N_STEPS = 8
# bkc=80 — the exact int8 window mosaic_probe_int8win.py validated on this
# chip (b256's auto plan uses the same row-chunk width via ns16)


def _plan():
    from vacnic_tpu.kernels.decode_layer import ChunkPlan

    return ChunkPlan(n_self=4, n_cross=8, n_ffn=2, vmem_mb=121, n_t=4)


def main():
    cfg = VacnicConfig.full_train()
    bart = cfg.bart
    key = jax.random.PRNGKey(0)
    params = F.multimodal_bart_init(key, bart, cfg.fusion)
    dp = DF.build_decode_params(params)
    enc_out = jax.random.normal(jax.random.fold_in(key, 1),
                                (BATCH, S, bart.d_model), jnp.bfloat16)
    kw = dict(pad_to=16, time_major=True)
    cache_bf = DF.build_decode_cache(params, enc_out, BEAMS, MAX_LEN, bart, **kw)
    cache_i8 = DF.build_decode_cache(params, enc_out, BEAMS, MAX_LEN, bart,
                                     self_kv_int8=True, **kw)
    assert cache_i8.self_k.dtype == jnp.int8
    enc_bias = jnp.broadcast_to(
        jnp.where(jnp.arange(S) < S - 17, 0.0, jnp.finfo(jnp.float32).min)
        [None, None, None, :], (BATCH, 1, 1, S))
    bk = BATCH * BEAMS

    # params as jit ARGS (closures inline as MLIR constants -> POST 413)
    plan = _plan()
    step = jax.jit(lambda dp, params, eb, c, t, p: DF.decode_step_pallas(
        dp, params, c, t, p, eb, bart, plan=plan))

    def roll(cache, label):
        rng = np.random.RandomState(7)
        tok = jnp.full((bk, 1), 5, jnp.int32)
        logits = None
        for pos in range(N_STEPS):
            logits, cache = step(dp, params, enc_bias, cache, tok,
                                 jnp.int32(pos))
            la = np.asarray(logits)
            assert np.isfinite(la).all(), f"{label}: non-finite logits at {pos}"
            sel = np.arange(bk).reshape(BATCH, BEAMS)
            sel = np.stack([g[rng.randint(0, BEAMS, BEAMS)] for g in sel]
                           ).reshape(-1)
            flat_sel = jnp.asarray(sel, jnp.int32)
            cache = DF.reorder_anc(cache, flat_sel)
            tok = jnp.take(np.asarray(la).argmax(-1).astype(np.int32),
                           flat_sel, axis=0)[:, None]
            tok = jnp.asarray(tok, jnp.int32)
        return np.asarray(logits), cache

    print("rolling bf16 kernel path...", file=sys.stderr, flush=True)
    l_bf, _ = roll(cache_bf, "bf16")
    print("rolling int8 kernel path...", file=sys.stderr, flush=True)
    l_i8, c_i8 = roll(cache_i8, "int8")
    # rows 0..N_STEPS-1 must hold real int8 data with live scales
    written = np.asarray(c_i8.self_k[:, :N_STEPS], np.int32)
    scales = np.asarray(c_i8.self_k_scale[:, :N_STEPS])
    assert np.abs(written).max() > 0, "int8 rows never written"
    assert scales.min() > 0, "scale rows never written"
    adiff = float(np.max(np.abs(l_i8 - l_bf)))
    agree = float((l_i8.argmax(-1) == l_bf.argmax(-1)).mean())
    print(f"selfkv-int8 parity: max|dlogit|={adiff:.4f} "
          f"argmax agreement={agree:.4f} "
          f"scale_shape={tuple(c_i8.self_k_scale.shape)}")
    assert np.isfinite(adiff) and adiff < 5.0, "int8 path diverged"
    print("SELFKV_INT8_SMOKE OK")


if __name__ == "__main__":
    main()
