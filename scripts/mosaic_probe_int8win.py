"""Mosaic int8 window probe for the int8 self-KV cache (r4 follow-on to
mosaic_probe_fp8.py).

The int8 self cache stores the decode kernel's past K/V rows as int8 with
per-(L, t, row, H) scales (decode_fast.quantize_self_rows). The open Mosaic
question is the same one fp8 had: windowed [tb, bkc, D] blocks over the
time-major [T, BK, D] cache with bkc=80 — 8-sublane-aligned but NOT
32-aligned for the packed (32, 128) 8-bit tiling. fp8 windows passed this
probe bit-exactly at bkc 80 AND 160 (queue11); int8 should behave the same
(same bit width), and unlike fp8 the int8→bf16 convert is NATIVE on v5e
(r4 dtype ladder, mosaic_probe_int4.py timed_*).

Variants:
  window160 — 32-aligned window (surely legal baseline)
  window80  — the b256 plan's real chunk (ns16, bkc=80); pass = the int8
              cache can keep the measured-optimal plan (VACNIC_INT8_SUB8=1)
  gather80  — window80 + the kernel's actual consumption pattern: one-hot
              ancestry gather matmul on the converted block, f32 scale
              multiply on the score block

Run on the chip: python scripts/mosaic_probe_int8win.py [window160|window80|gather80|all]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
import numpy as np


def probe_window(bkc: int):
    T, BK, D = 64, 1280, 1024
    tb = 16

    def kern(k8_ref, o_ref):
        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            o_ref[...] = jnp.sum(k8_ref[...].astype(jnp.float32),
                                 axis=0)[:, :128]

    key = jax.random.PRNGKey(5)
    k8 = jnp.clip(jnp.round(jax.random.normal(key, (T, BK, D)) * 40),
                  -127, 127).astype(jnp.int8)
    out = pl.pallas_call(
        kern,
        grid=(T // tb, BK // bkc),
        in_specs=[pl.BlockSpec((tb, bkc, D), lambda t, c: (t, c, 0))],
        out_specs=pl.BlockSpec((bkc, 128), lambda t, c: (c, 0)),
        out_shape=jax.ShapeDtypeStruct((BK, 128), jnp.float32),
    )(k8)
    ref = np.asarray(k8, np.float32).reshape(T // tb, tb, BK // bkc, bkc, D)
    ref = ref[-1].sum(axis=0)[:, :, :128].reshape(BK, 128)
    err = float(np.max(np.abs(np.asarray(out) - ref)))
    print(f"window bkc={bkc} OK max|d|={err:.4g}", flush=True)


def probe_gather80():
    """The decode kernel's real int8 consumption (per-ROW scales, r4b):
    convert the int8 window to bf16 (raw ints), one-hot gather matmul,
    q-product + head-select matmul, then the [TB, C', H] per-row scale
    block beam-aligned through the SAME ancestry one-hot in f32 — mirrors
    decode_layer.py's gsc gather exactly (the pre-r4b variant probed the
    superseded [tb, H] exp8 time-expansion instead)."""
    tb, bkc, D, H = 16, 80, 1024, 16
    hd = D // H

    def kern(k8_ref, anc_ref, q_ref, s_ref, o_ref):
        kg = jax.lax.dot_general(
            anc_ref[...].astype(jnp.bfloat16),
            k8_ref[...].astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        prod = q_ref[...][None, :, :] * kg
        dd = jax.lax.broadcasted_iota(jnp.int32, (D, H), 0)
        hh = jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
        sel = (dd // hd == hh).astype(jnp.bfloat16)
        scores2 = jnp.dot(prod.reshape(tb * bkc, D), sel,
                          preferred_element_type=jnp.float32)
        skg = jax.lax.dot_general(
            anc_ref[...].astype(jnp.float32),
            s_ref[...].astype(jnp.float32),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [TB, C, H]
        o_ref[...] = (scores2.reshape(tb, bkc, H) * skg).reshape(tb * bkc, H)

    key = jax.random.PRNGKey(7)
    k8 = jnp.clip(jnp.round(jax.random.normal(key, (tb, bkc, D)) * 40),
                  -127, 127).astype(jnp.int8)
    perm = jax.random.randint(jax.random.fold_in(key, 1), (tb, bkc), 0, bkc)
    anc = jax.nn.one_hot(perm, bkc, dtype=jnp.float32)
    q = jax.random.normal(jax.random.fold_in(key, 2), (bkc, D), jnp.bfloat16)
    s = jnp.abs(jax.random.normal(jax.random.fold_in(key, 3),
                                  (tb, bkc, H))) * 0.02
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((tb * bkc, H), jnp.float32),
    )(k8, anc, q, s)
    kf = np.asarray(k8, np.float32)
    kg = np.take_along_axis(kf, np.asarray(perm)[:, :, None], axis=1)
    prod = (np.asarray(q, np.float32)[None].astype(np.float32)
            * kg).reshape(tb, bkc, H, hd)
    sg = np.take_along_axis(np.asarray(s), np.asarray(perm)[:, :, None], axis=1)
    ref = prod.sum(-1) * sg
    err = float(np.max(np.abs(np.asarray(out).reshape(tb, bkc, H) - ref)
                       / (np.abs(ref) + 1.0)))
    print(f"gather80 OK max rel err={err:.4g} (bf16 product rounding)",
          flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    probes = (("window160", lambda: probe_window(160)),
              ("window80", lambda: probe_window(80)),
              ("gather80", probe_gather80))
    for name, fn in probes:
        if which in (name, "all"):
            try:
                fn()
            except Exception as e:  # noqa: BLE001 — probe: report and continue
                print(f"{name} FAILED: {type(e).__name__}: {str(e)[:500]}",
                      flush=True)
