"""On-chip check of the fused Pallas decode-stack kernel at bench shapes
(BART-large, batch 32 x beam 5): logits parity vs decode_step, then ms/step.

BENCH_MODE=parity|time|time_ref selects one program per process (remote
compile latency is erratic). Timing runs N steps in one jitted scan and
synchronizes through a device->host scalar transfer (CLAUDE.md).
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
from vacnic_tpu.infer import decode_fast as DF
from vacnic_tpu.kernels.decode_layer import ChunkPlan
from vacnic_tpu.models import fusion as F

BATCH, BEAMS, MAX_LEN, S = 32, 5, 50, 512
N_STEPS = 50
PLAN = ChunkPlan(
    n_self=int(os.environ.get("PLAN_SELF", 4)),
    n_cross=int(os.environ.get("PLAN_CROSS", 4)),
    n_ffn=int(os.environ.get("PLAN_FFN", 2)),
    vmem_mb=int(os.environ.get("PLAN_VMEM", 110)),
    ffn_shadow=int(os.environ.get("PLAN_FFNSHADOW", 0)),
    t_fuse=int(os.environ.get("PLAN_TFUSE", 1)),
)


def main():
    mode = os.environ.get("BENCH_MODE", "parity")
    cfg = VacnicConfig.full_train()
    bart = cfg.bart
    key = jax.random.PRNGKey(0)
    params = F.multimodal_bart_init(key, bart, cfg.fusion)
    dp = DF.build_decode_params(params)
    enc_out = jax.random.normal(jax.random.fold_in(key, 1),
                                (BATCH, S, bart.d_model), jnp.bfloat16)
    cache = DF.build_decode_cache(params, enc_out, BEAMS, MAX_LEN, bart, pad_to=16)
    cache_tm = DF.build_decode_cache(params, enc_out, BEAMS, MAX_LEN, bart,
                                     pad_to=16, time_major=True)
    enc_bias = jnp.broadcast_to(
        jnp.where(jnp.arange(S) < S - 17, 0.0, jnp.finfo(jnp.float32).min)
        [None, None, None, :], (BATCH, 1, 1, S))
    bk = BATCH * BEAMS
    tok = jnp.full((bk, 1), 5, jnp.int32)

    if mode == "parity":
        # params passed as jit ARGS: closures become MLIR constants and the
        # remote-compile POST 413s (CLAUDE.md)
        ref = jax.jit(lambda dp, params, eb, c, t, p: DF.decode_step(
            dp, params, c, t, p, eb, bart))
        pal = jax.jit(lambda dp, params, eb, c, t, p: DF.decode_step_pallas(
            dp, params, c, t, p, eb, bart, plan=PLAN))
        print("compiling ref...", file=sys.stderr, flush=True)
        rl, rc = ref(dp, params, enc_bias, cache, tok, jnp.int32(3))
        rl = np.asarray(rl)
        print("compiling pallas...", file=sys.stderr, flush=True)
        plg, pc = pal(dp, params, enc_bias, cache_tm, tok, jnp.int32(3))
        plg = np.asarray(plg)
        adiff = np.max(np.abs(plg - rl))
        # compare on argmax + normalized logits (bf16 paths)
        agree = (plg.argmax(-1) == rl.argmax(-1)).mean()
        print(f"parity: max|dlogit|={adiff:.4f} argmax agreement={agree:.4f}")
        kd = np.max(np.abs(np.asarray(pc.self_k.transpose(0, 2, 1, 3), np.float32)
                           - np.asarray(rc.self_k, np.float32)))
        print(f"cache max|dk|={kd:.4f}")
        assert agree > 0.995 and adiff < 0.15, "kernel parity FAILED"
        print("PARITY OK")
        return

    step_fns = {
        "time": lambda dp, params, eb, c, t, p: DF.decode_step_pallas(
            dp, params, c, t, p, eb, bart, plan=PLAN),
        "time_ref": lambda dp, params, eb, c, t, p: DF.decode_step(
            dp, params, c, t, p, eb, bart),
    }
    mode_holder = [mode]
    cache0 = cache_tm if mode == "time" else cache

    @jax.jit
    def run(dp, params, enc_bias, tok, cache):
        def body(carry, pos):
            tok, cache = carry
            logits, cache = step_fns[mode_holder[0]](dp, params, enc_bias, cache, tok, pos)
            tok = jnp.argmax(logits, axis=-1)[:, None].astype(jnp.int32)
            return (tok, cache), logits[0, 0]
        (_, _), probe = jax.lax.scan(body, (tok, cache), jnp.arange(N_STEPS))
        return probe.sum()

    print(f"compiling {mode} (plan={PLAN})...", file=sys.stderr, flush=True)
    _ = np.asarray(run(dp, params, enc_bias, tok, cache0))
    best = np.inf
    for _i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(run(dp, params, enc_bias, tok, cache0))
        best = min(best, time.perf_counter() - t0)
    print(f"{mode}: {best / N_STEPS * 1e3:.3f} ms/step (plan={PLAN})")


if __name__ == "__main__":
    main()
