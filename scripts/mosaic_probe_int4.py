"""Mosaic int4 feasibility probe (candidate: int4 cross-KV, halving the
3.2 GB/step int8 cross fetch — the largest term of the 11.7 ms b256 fetch
floor). Tests whether Mosaic on v5e can load int4 blocks and convert for
matmul, full-array and windowed (int4 packs 64 values per sublane tile, so
windowed blocks may need 64-aligned sublanes).

Run on the chip: python scripts/mosaic_probe_int4.py [full|window|all]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
import numpy as np

INT4 = jnp.int4


def probe_full():
    def kern(k4_ref, q_ref, o_ref):
        k = k4_ref[...].astype(jnp.bfloat16)
        o_ref[...] = jnp.dot(k, q_ref[...],
                             preferred_element_type=jnp.float32)

    key = jax.random.PRNGKey(0)
    ints = jax.random.randint(key, (512, 512), -8, 8, jnp.int32)
    k4 = ints.astype(INT4)
    q = jax.random.normal(jax.random.fold_in(key, 1), (512, 128), jnp.bfloat16)
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32))(k4, q)
    ref = jnp.dot(ints.astype(jnp.bfloat16), q,
                  preferred_element_type=jnp.float32)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"full OK max|d|={err:.4g}", flush=True)


def probe_window(sub: int = 64):
    T, BK, D2 = 64, 1280, 512
    tb = 16
    bkc = sub

    def kern(k4_ref, o_ref):
        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            o_ref[...] = jnp.sum(k4_ref[...].astype(jnp.float32),
                                 axis=0)[:, :128]

    key = jax.random.PRNGKey(5)
    ints = jax.random.randint(key, (T, BK, D2), -8, 8, jnp.int32)
    k4 = ints.astype(INT4)
    out = pl.pallas_call(
        kern,
        grid=(T // tb, BK // bkc),
        in_specs=[pl.BlockSpec((tb, bkc, D2), lambda t, c: (t, c, 0))],
        out_specs=pl.BlockSpec((bkc, 128), lambda t, c: (c, 0)),
        out_shape=jax.ShapeDtypeStruct((BK, 128), jnp.float32),
    )(k4)
    ref = np.asarray(ints, np.float32).reshape(T // tb, tb, BK // bkc, bkc, D2)
    ref = ref[-1].sum(axis=0)[:, :, :128].reshape(BK, 128)
    err = float(np.max(np.abs(np.asarray(out) - ref)))
    print(f"window sub={sub} OK max|d|={err:.4g}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"backend={jax.default_backend()}", flush=True)
    probes = (("full", probe_full),
              ("window", lambda: probe_window(64)),
              ("window80", lambda: probe_window(80)))
    for name, fn in probes:
        if which in (name, "all"):
            try:
                fn()
            except Exception as e:  # noqa: BLE001 — probe: report and continue
                print(f"{name} FAILED: {type(e).__name__}: {str(e)[:500]}",
                      flush=True)
