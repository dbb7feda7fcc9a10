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


def probe_timed(dtype_name: str):
    """Effective fetch+convert bandwidth: sum-reduce a ~1.3 GB logical
    array streamed through windowed blocks, timed via device→host sync.
    Compares int4 / int8 / fp8 / bf16 — v5e converts int8 natively but
    emulates fp8 (the fp8 self-cache measured 45 vs 16 ms/step, queue11);
    int4's conversion cost decides whether int4 cross-KV is viable."""
    import time

    R, C = 81920, 4096  # 336M elements; REPS passes amortize the ~28 ms RT
    tb = 512
    REPS = 20

    dt = {"int4": INT4, "int8": jnp.int8, "fp8": jnp.float8_e4m3fn,
          "bf16": jnp.bfloat16}[dtype_name]
    key = jax.random.PRNGKey(0)
    if dtype_name in ("int4", "int8"):
        x = jax.random.randint(key, (R, C), -8, 8, jnp.int32).astype(dt)
    else:
        x = (jax.random.normal(key, (R, C), jnp.float32)).astype(dt)

    def kern(x_ref, o_ref):
        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _init():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += jnp.sum(x_ref[...].astype(jnp.float32), axis=0,
                              keepdims=True)

    # grid (rep, j): j fastest, so blocks change every step and Mosaic's
    # same-block fetch elision never kicks in — each rep is a real pass
    run = jax.jit(lambda a: pl.pallas_call(
        kern,
        grid=(REPS, R // tb),
        in_specs=[pl.BlockSpec((tb, C), lambda r, j: (j, 0))],
        out_specs=pl.BlockSpec((1, C), lambda r, j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, C), jnp.float32),
    )(a))
    np.asarray(run(x))  # compile+warm
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(x))
        best = min(best, time.perf_counter() - t0)
    bits = {"int4": 4, "int8": 8, "fp8": 8, "bf16": 16}[dtype_name]
    gb = REPS * R * C * bits / 8 / 1e9
    print(f"timed {dtype_name}: {best*1e3:.2f} ms for {gb:.2f} GB "
          f"(incl ~28 ms RT) -> {gb/best:.0f} GB/s effective", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"backend={jax.default_backend()}", flush=True)
    probes = (("full", probe_full),
              ("window", lambda: probe_window(64)),
              ("window80", lambda: probe_window(80)),
              ("timed_int8", lambda: probe_timed("int8")),
              ("timed_int4", lambda: probe_timed("int4")),
              ("timed_fp8", lambda: probe_timed("fp8")),
              ("timed_bf16", lambda: probe_timed("bf16")))
    for name, fn in probes:
        if which in (name, "all"):
            try:
                fn()
            except Exception as e:  # noqa: BLE001 — probe: report and continue
                print(f"{name} FAILED: {type(e).__name__}: {str(e)[:500]}",
                      flush=True)
