"""Does the Mosaic pallas pipeline overlap window DMA with MXU compute?

Motivation (r5): the decode-kernel floor attribution reads EXACTLY additive
(skeleton fetch-only 11.66 ms + ~4.6 ms compute = 16.28 ms model step), and
the FFN-in-fetch-shadow variant — which moves the FFN's MXU work into the
fetch-heavy cross phases — measured SLOWER (22.34 vs 20.27 ms/step bf16
pair, logs_r5/bench_queue29.log). Both observations fit one hypothesis: the
generated pipeline does not execute a grid step's compute concurrently with
the next step's window copies.

This probe isolates that question from the decode kernel entirely:
  grid = (N_WIN,) steps; each step fetches one 8 MB HBM window
  ([1, 4096, 1024] bf16, distinct per step — no elision) and runs K matmul
  units ([1024, 1024] bf16 @ itself, ~20 us each) on RESIDENT scratch that
  does not depend on the fetched window (only a corner of the window feeds
  the output, preventing DCE).

If copies overlap compute: time(K) ~= max(fetch, K * unit).
If they serialize:         time(K) ~= fetch + K * unit.

Run one K per process (PROBE_K=0,1,2,4); each timed via a 30-iteration
lax.scan whose carry threads through the kernel (defeats CSE), synchronized
by a device->host transfer of a [8,128] carry (CLAUDE.md timing rules).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_WIN = int(os.environ.get("PROBE_WINDOWS", 128))
K = int(os.environ.get("PROBE_K", 0))
REPS = int(os.environ.get("PROBE_REPS", 30))
# Variables that differ between this minimal kernel and the decode kernel —
# candidate overlap-killers to isolate if K=1 ~= K=0 here but the decode
# kernel is additive:
#   PROBE_EXTRA_OPS: N additional small window operands (decode kernel has
#     28 operands; many DMA streams may serialize the scheduler)
#   PROBE_DYNIDX=1: index map depends on a scalar-prefetch arg (the decode
#     kernel's pos-based elision) — dynamic indices may defeat lookahead
EXTRA_OPS = int(os.environ.get("PROBE_EXTRA_OPS", 0))
DYNIDX = os.environ.get("PROBE_DYNIDX") == "1"
# Window-size sweep (PROBE_ROWS): the K-ladder decomposes K=0's 17.7 us/step
# (8 MB window) as ~8 us fixed per-grid-step overhead + native-BW DMA
# (9.5 us at 840 GB/s) — if that holds, per-step time vs window size is
# affine with slope 1/native-BW and intercept = the fixed overhead, and the
# decode kernel's 1176-step grid carries ~9 ms of pure step overhead.
ROWS = int(os.environ.get("PROBE_ROWS", 4096))  # window = [1, ROWS, 1024] bf16
# Step-fusion premise test (PROBE_NOPS=N): fetch the SAME total bytes as N
# full-size window operands per grid step over N_WIN/N steps. If per-step
# overhead dominates (affine model), time drops toward bytes/native-BW as N
# grows — the premise behind fusing decode time-chunk phases (multiple
# cache-window operands per step, per-window elision preserved).
NOPS = int(os.environ.get("PROBE_NOPS", 1))


def kernel(*refs):
    if DYNIDX:
        _sp, *refs = refs
    win_refs, refs = refs[:NOPS], refs[NOPS:]
    carry_ref, *rest = refs
    extra = rest[:EXTRA_OPS]
    out_ref, a_s, acc_s = rest[EXTRA_OPS], rest[EXTRA_OPS + 1], rest[EXTRA_OPS + 2]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        a_s[...] = carry_ref[:1, :128].astype(jnp.float32) @ jnp.ones(
            (128, 1024), jnp.float32) + jnp.ones((1024, 1024), jnp.float32)
        acc_s[...] = jnp.zeros((8, 128), jnp.float32)

    # K units of MXU work on resident scratch (independent of the window)
    for _ in range(K):
        a = a_s[...].astype(jnp.bfloat16)
        # clamp keeps the iterated matmul numerically bounded (timing is
        # dtype-flow-only; inf/NaN cost the same on the MXU but are ugly)
        a_s[...] = jnp.clip(
            jnp.dot(a, a, preferred_element_type=jnp.float32) * 1e-3,
            0.5, 1.5)

    # touch a corner of each fetched window so no copy can be elided
    for w in win_refs:
        acc_s[...] = acc_s[...] + w[0, :8, :128].astype(jnp.float32)
    for e in extra:
        acc_s[...] = acc_s[...] + e[0, :8, :128].astype(jnp.float32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        out_ref[...] = acc_s[...] + a_s[:8, :128]


def main():
    key = jax.random.PRNGKey(0)
    wins = jax.random.normal(key, (N_WIN, ROWS, 1024), jnp.bfloat16)
    extras = [jax.random.normal(jax.random.fold_in(key, 10 + e),
                                (N_WIN, 8, 128), jnp.bfloat16)
              for e in range(EXTRA_OPS)]

    assert N_WIN % NOPS == 0
    n_steps = N_WIN // NOPS
    # NOPS window operands per step, interleaved: step i, operand j reads
    # window i*NOPS + j (all operands view the same HBM array)
    if DYNIDX:
        # window index comes from a scalar-prefetch permutation (the decode
        # kernel's pos-elision pattern: index maps read pos_ref)
        def mk_win_idx(j):
            return lambda i, perm_ref: (perm_ref[i * NOPS + j], 0, 0)

        def small_idx(i, perm_ref):
            return (0, 0)

        def extra_idx(i, perm_ref):
            return (perm_ref[jnp.minimum(i, N_WIN - 1)], 0, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_steps,),
            in_specs=[pl.BlockSpec((1, ROWS, 1024), mk_win_idx(j))
                      for j in range(NOPS)]
            + [pl.BlockSpec((8, 128), small_idx)]
            + [pl.BlockSpec((1, 8, 128), extra_idx) for _ in range(EXTRA_OPS)],
            out_specs=pl.BlockSpec((8, 128), small_idx),
            scratch_shapes=[pltpu.VMEM((1024, 1024), jnp.float32),
                            pltpu.VMEM((8, 128), jnp.float32)],
        )
        call0 = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=os.environ.get("PROBE_INTERPRET") == "1",
        )
        perm = jnp.arange(N_WIN, dtype=jnp.int32)

        def call(wins, carry, *extras):
            return call0(perm, *([wins] * NOPS), carry, *extras)
    else:
        def mk_win_idx_s(j):
            return lambda i: (i * NOPS + j, 0, 0)

        call0 = pl.pallas_call(
            kernel,
            grid=(n_steps,),
            in_specs=[pl.BlockSpec((1, ROWS, 1024), mk_win_idx_s(j))
                      for j in range(NOPS)]
            + [pl.BlockSpec((8, 128), lambda i: (0, 0))]
            + [pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0))
               for _ in range(EXTRA_OPS)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1024, 1024), jnp.float32),
                            pltpu.VMEM((8, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=os.environ.get("PROBE_INTERPRET") == "1",
        )

        def call(wins, carry, *extras):
            return call0(*([wins] * NOPS), carry, *extras)

    @jax.jit
    def run(wins, carry0, *extras):
        # extras are jit ARGUMENTS, never closed over: closures inline as
        # MLIR constants on this backend (CLAUDE.md) — which both bloats the
        # remote compile and stops the variant from modeling real operand
        # DMA streams
        def body(carry, _):
            out = call(wins, carry, *extras)
            return out, ()

        carry, _ = jax.lax.scan(body, carry0, None, length=REPS)
        return carry

    carry0 = jnp.ones((8, 128), jnp.float32)
    t0 = time.time()
    out = np.asarray(run(wins, carry0, *extras))
    print(f"compile+first: {time.time() - t0:.1f}s out[0,0]={out[0, 0]:.3e}",
          flush=True)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = np.asarray(run(wins, carry0, *extras))
        best = min(best, time.perf_counter() - t0)
    per_call = best / REPS
    per_step = per_call / N_WIN
    gbps = (N_WIN * ROWS * 1024 * 2) / per_call / 1e9
    print(f"K={K} windows={N_WIN} reps={REPS}: {per_call * 1e3:.3f} ms/call "
          f"{per_step * 1e6:.2f} us/step  fetch-BW {gbps:.0f} GB/s",
          flush=True)


if __name__ == "__main__":
    main()
