"""Mosaic fp8 feasibility probe for an fp8 (e4m3) self-KV cache.

The int8 self-cache alternative needs per-row scales whose [L,T,BK] layout
fights Mosaic block rules; fp8 storage needs none — IF Mosaic on v5e can
(a) load float8_e4m3fn blocks and convert to bf16, and (b) convert bf16 and
store fp8 blocks. This probes exactly those two ops at decode-kernel-like
shapes plus the downstream matmul. Variants:

  load   — fp8 input block -> astype(bf16) -> matmul -> f32 out
  store  — bf16 input -> astype(fp8) stored to an fp8 output block
  roundtrip — store then load in two calls; checks max abs error vs bf16

Run on the chip: python scripts/mosaic_probe_fp8.py [load|store|roundtrip|all]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

FP8 = jnp.float8_e4m3fn
TB, BKC, D = 16, 80, 1024  # a self-KV time-chunk block at the b256 plan


def probe_load():
    def kern(k8_ref, q_ref, o_ref):
        k = k8_ref[...].astype(jnp.bfloat16).reshape(TB * BKC, D)
        o_ref[...] = jax.lax.dot_general(
            k, q_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    key = jax.random.PRNGKey(0)
    k8 = (jax.random.normal(key, (TB, BKC, D), jnp.float32) * 4).astype(FP8)
    q = jax.random.normal(jax.random.fold_in(key, 1), (BKC, D), jnp.bfloat16)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((TB * BKC, BKC), jnp.float32),
    )(k8, q)
    ref = jnp.dot(k8.astype(jnp.bfloat16).reshape(TB * BKC, D), q.T,
                  preferred_element_type=jnp.float32)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"load OK max|d|={err:.4g}", flush=True)


def probe_store():
    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...].astype(FP8)

    key = jax.random.PRNGKey(2)
    x = (jax.random.normal(key, (BKC, D), jnp.float32) * 4).astype(jnp.bfloat16)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((BKC, D), FP8))(x)
    ref = x.astype(FP8).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    print(f"store OK max|d|={err:.4g} (0 = bit-exact vs XLA cast)", flush=True)


def probe_roundtrip():
    def store_k(x_ref, o_ref):
        o_ref[...] = x_ref[...].astype(FP8)

    def load_k(k8_ref, o_ref):
        o_ref[...] = k8_ref[...].astype(jnp.bfloat16)

    key = jax.random.PRNGKey(3)
    x = (jax.random.normal(key, (BKC, D), jnp.float32) * 4).astype(jnp.bfloat16)
    k8 = pl.pallas_call(store_k, out_shape=jax.ShapeDtypeStruct((BKC, D), FP8))(x)
    back = pl.pallas_call(load_k, out_shape=jax.ShapeDtypeStruct((BKC, D), jnp.bfloat16))(k8)
    rel = float(jnp.max(jnp.abs(back.astype(jnp.float32) - x.astype(jnp.float32))
                        / (jnp.abs(x.astype(jnp.float32)) + 1e-6)))
    print(f"roundtrip OK max rel err={rel:.4g} (e4m3 ~ 6%)", flush=True)


def probe_window(bkc: int = 160):
    """Windowed BlockSpec over a [T, BK, D] fp8 array at the real b256
    shapes: full-array blocks skip the packed-dtype tiling rule, this
    doesn't. bkc=160 is 32-sublane-aligned (surely legal); bkc=80 is only
    8-aligned — if Mosaic accepts it, the fp8 self-cache can keep the
    measured-optimal ns16 plan instead of the 2x-slower ns8."""
    T, BK, D2 = 64, 1280, 1024
    tb = 16

    def kern(k8_ref, o_ref):
        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            o_ref[...] = jnp.sum(k8_ref[...].astype(jnp.float32),
                                 axis=0)[:, :128]

    key = jax.random.PRNGKey(5)
    k8 = (jax.random.normal(key, (T, BK, D2), jnp.float32) * 4).astype(FP8)
    out = pl.pallas_call(
        kern,
        grid=(T // tb, BK // bkc),
        in_specs=[pl.BlockSpec((tb, bkc, D2), lambda t, c: (t, c, 0))],
        out_specs=pl.BlockSpec((bkc, 128), lambda t, c: (c, 0)),
        out_shape=jax.ShapeDtypeStruct((BK, 128), jnp.float32),
    )(k8)
    ref = np.asarray(k8.astype(jnp.float32)).reshape(
        T // tb, tb, BK // bkc, bkc, D2)
    ref = ref[-1].sum(axis=0)[:, :, :128].reshape(BK, 128)
    err = float(np.max(np.abs(np.asarray(out) - ref)))
    print(f"window bkc={bkc} OK max|d|={err:.4g}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    probes = (("load", probe_load), ("store", probe_store),
              ("roundtrip", probe_roundtrip),
              ("window", lambda: probe_window(160)),
              ("window80", lambda: probe_window(80)))
    for name, fn in probes:
        if which in (name, "all"):
            try:
                fn()
            except Exception as e:  # noqa: BLE001 — probe: report and continue
                print(f"{name} FAILED: {type(e).__name__}: {str(e)[:500]}",
                      flush=True)
