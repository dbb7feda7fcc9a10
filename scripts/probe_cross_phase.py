"""Probe the encoder-kernel CROSS phase in isolation at real shapes
(bc=2, S=512, d=1024, H=16, hd=64, KV=40): the part-bisect reads 36.2 ms
for the cross phase alone vs a ~7.6 ms projection floor.

Variants (PROBE env):
  head   — current per-head loop: 16 × ([BC,S,hd]@[BC,hd,KV] → softmax →
           [BC,S,KV]@[BC,KV,hd]) + q/out projections.
  bd     — block-diagonal single-matmul: scores_all = q2 @ CK_bd
           ([rows,d]@[d,H*KV]) in ONE dot (16x redundant FLOPs at full MXU),
           per-head softmax via ones-matmul segment sums, values via
           P_all @ V_bd ([rows,H*KV]@[H*KV,d]). Exact same math.
  proj   — q/out projections only (floor).

Grid loops layers*chunks times to mimic the real kernel's phase count.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

BC, S, D, H, HD, KV = 2, 512, 1024, 16, 64, 40
ROWS = BC * S
L_CHUNKS = 12 * 16  # layers × batch chunks, as in the real kernel


def _kernel(x_ref, wq_ref, wo_ref, ck_ref, cv_ref, ckbd_ref, cvbd_ref,
            seg_ref, o_ref, acc_s, *, probe: str):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.bfloat16)
    q2 = jnp.dot(x, wq_ref[...].astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    scaling = HD ** -0.5
    if probe == "proj":
        o = q2
    elif probe == "head":
        outs = []
        for h in range(H):
            q_h = (q2[:, h * HD:(h + 1) * HD] * scaling).reshape(BC, S, HD)
            k_h = ck_ref[0, :, h * HD:(h + 1) * HD, :].astype(jnp.bfloat16)
            s_h = jax.lax.dot_general(
                q_h, k_h, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            p_h = jax.nn.softmax(s_h, axis=-1).astype(jnp.bfloat16)
            outs.append(jax.lax.dot_general(
                p_h, cv_ref[0, :, :, h * HD:(h + 1) * HD].astype(jnp.bfloat16),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16))
        o = jnp.concatenate(outs, axis=-1).reshape(ROWS, D)
    else:  # bd
        # ck_bd [BC, D, H*KV] block-diag per batch item; one batched dot
        s_all = jax.lax.dot_general(
            (q2 * scaling).reshape(BC, S, D), ckbd_ref[0].astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [BC, S, H*KV]
        s2 = s_all.reshape(ROWS, H * KV)
        # per-head softmax via segment matmuls: seg [H*KV, H] ones blocks
        e = jnp.exp(s2 - jax.lax.stop_gradient(jnp.max(s2, axis=-1, keepdims=True)))
        # NOTE: per-head max replaced by global row max — exp is still exact
        # softmax after per-head normalization below (softmax shift-invariant)
        sums = jnp.dot(e.astype(jnp.bfloat16), seg_ref[...].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)  # [ROWS, H]
        inv = 1.0 / sums
        # expand per-head inverse back over the KV blocks: inv @ seg.T
        inv_full = jnp.dot(inv.astype(jnp.bfloat16),
                           seg_ref[...].astype(jnp.bfloat16).T,
                           preferred_element_type=jnp.float32)
        p_all = (e * inv_full).astype(jnp.bfloat16).reshape(BC, S, H * KV)
        o = jax.lax.dot_general(
            p_all, cvbd_ref[0].astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16).reshape(ROWS, D)
    o = jnp.dot(o.astype(jnp.bfloat16), wo_ref[...].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _init():
        acc_s[...] = o

    @pl.when(i > 0)
    def _acc():
        acc_s[...] = acc_s[...] + o * 1e-6

    @pl.when(i == L_CHUNKS - 1)
    def _emit():
        o_ref[...] = acc_s[...]


def main():
    probe = os.environ.get("PROBE", "head")
    k = jax.random.PRNGKey(0)

    def r(*shape, dtype=jnp.bfloat16):
        return (jax.random.normal(jax.random.fold_in(k, hash(shape) % 2**31),
                                  shape, jnp.float32) * 0.05).astype(dtype)

    x = r(ROWS, D)
    wq, wo = r(D, D), r(D, D)
    ck = r(1, BC, D, KV)
    cv = r(1, BC, KV, D)
    # block-diag forms
    ckbd = np.zeros((1, BC, D, H * KV), np.float32)
    cvbd = np.zeros((1, BC, H * KV, D), np.float32)
    ck_np, cv_np = np.asarray(ck, np.float32), np.asarray(cv, np.float32)
    for h in range(H):
        ckbd[0, :, h * HD:(h + 1) * HD, h * KV:(h + 1) * KV] = \
            ck_np[0, :, h * HD:(h + 1) * HD, :]
        cvbd[0, :, h * KV:(h + 1) * KV, h * HD:(h + 1) * HD] = \
            cv_np[0, :, :, h * HD:(h + 1) * HD]
    seg = np.zeros((H * KV, H), np.float32)
    for h in range(H):
        seg[h * KV:(h + 1) * KV, h] = 1.0

    fn = jax.jit(lambda *a: pl.pallas_call(
        functools.partial(_kernel, probe=probe),
        grid=(L_CHUNKS,),
        in_specs=[pl.BlockSpec(t.shape, lambda i, n=t.ndim: (0,) * n) for t in a],
        out_specs=pl.BlockSpec((ROWS, D), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((ROWS, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ROWS, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
    )(*a)[:8, :8])

    args = (x, wq, wo, ck, cv, jnp.asarray(ckbd, jnp.bfloat16),
            jnp.asarray(cvbd, jnp.bfloat16), jnp.asarray(seg, jnp.bfloat16))
    print(f"compiling {probe}...", file=sys.stderr, flush=True)
    out = np.asarray(fn(*args))
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"PROBE={probe}: {best * 1e3:.1f} ms for {L_CHUNKS} cross phases "
          f"({best / L_CHUNKS * 1e6:.0f} us/phase), out[0,0]={out[0,0]:.4f}")


if __name__ == "__main__":
    main()
