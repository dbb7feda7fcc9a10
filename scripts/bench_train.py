#!/usr/bin/env python
"""Training-step throughput: full VACNIC BART-large, batch 32, on one chip.

The reference trains GoodNews (424k samples... batch 32, 16 epochs) in ~1.5
days on one A100 (README.md:31) ≈ 2.45 steps/sec if 16×8.3k steps/epoch —
the exact step count depends on the split size; this prints samples/sec so
the wall-time comparison is direct. One JSON line like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from vacnic_tpu.core.config import VacnicConfig
    from vacnic_tpu.core.rng import set_random_seed
    from vacnic_tpu.data.synthetic import synthetic_batch
    from vacnic_tpu.models import bart as B
    from vacnic_tpu.models import fusion as F
    from vacnic_tpu.train.train_step import make_train_step

    import dataclasses

    cfg = VacnicConfig.full_train()
    if os.environ.get("BENCH_NO_REMAT"):
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, grad_checkpoint=False)
        )
    # A/B knobs for dropout-mask cost: BENCH_PRNG overrides the PRNG impl
    # (default = TrainConfig.prng_impl, measured-best rbg; BENCH_PRNG=
    # threefry2x32 restores the old path); BENCH_DROPOUT=0 disables dropout
    # entirely (upper bound); VACNIC_DROPOUT_BITS=0 restores bernoulli masks.
    # Measured b64 teacher-cached: threefry 60.37, rbg 66.91, no-dropout
    # 72.8 samples/s (one window); rbg+uint16-bits 70.53 vs rbg+bernoulli
    # 67.36 (a later window).
    impl = os.environ.get("BENCH_PRNG", cfg.train.prng_impl)
    if impl != "threefry2x32":
        jax.config.update("jax_default_prng_impl", impl)
    if os.environ.get("BENCH_DROPOUT") is not None:
        cfg = dataclasses.replace(
            cfg, bart=dataclasses.replace(
                cfg.bart, dropout=float(os.environ["BENCH_DROPOUT"])))
    key = set_random_seed(0)
    params = {"model": F.multimodal_bart_init(key, cfg.bart, cfg.fusion)}
    # frozen CoLaM teacher in bf16 (no gradients through it); Adam mu in bf16 —
    # fp32 params+grads+fp32 Adam+teacher exceed one v5e's 15.75 GB HBM
    teacher = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), B.bart_init(jax.random.fold_in(key, 1), cfg.bart)
    )
    batch_size = int(os.environ.get("BENCH_BATCH", 16))
    batch = synthetic_batch(cfg, batch_size=batch_size, seed=0)
    # steady-state step for epochs >= 2 under TrainConfig.teacher_cache: the
    # frozen CoLaM teacher's pooled state comes from the cache, no teacher fwd
    cached_teacher = bool(os.environ.get("BENCH_TEACHER_CACHED"))
    if cached_teacher:
        vec = jax.random.normal(jax.random.fold_in(key, 3),
                                (batch_size, cfg.bart.d_model), jnp.float32)
        batch["teacher_pooled"] = vec / jnp.linalg.norm(vec, axis=-1, keepdims=True)

    # attribution knobs (train-budget table, mirrors profile_decode_b128):
    # BENCH_TXT_ONLY=1 drops the aux losses (CoLaM margin, SECLA) to isolate
    # their fwd+bwd cost; BENCH_FWD_ONLY=1 times compute_losses without
    # value_and_grad/optimizer — the fwd vs bwd split.
    if os.environ.get("BENCH_TXT_ONLY"):
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, alpha=0.0, no_mapping=True))

    nu_dtype = jnp.bfloat16 if os.environ.get("BENCH_NU_BF16") else None
    init_fn, step_fn = make_train_step(cfg, num_training_steps=1000,
                                       mu_dtype=jnp.bfloat16, nu_dtype=nu_dtype)
    state = init_fn(params, teacher, jax.random.fold_in(key, 2))
    if os.environ.get("BENCH_FWD_ONLY"):
        from vacnic_tpu.train.train_step import compute_losses

        def fwd_step(state, batch):
            rng, dropout_rng = jax.random.split(state.rng)
            loss, metrics = compute_losses(state.params, state.teacher, batch,
                                           cfg, dropout_rng)
            return state._replace(rng=rng), metrics

        step = jax.jit(fwd_step, donate_argnums=0)
    else:
        step = jax.jit(step_fn, donate_argnums=0)

    state, m = step(state, batch)
    _ = float(np.asarray(m["loss"]))  # force completion (tunnel-safe barrier)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
        _ = float(np.asarray(m["loss"]))
    dt = (time.perf_counter() - t0) / iters
    print(
        json.dumps(
            {
                "metric": (
                    f"train samples/sec/chip (full VACNIC BART-large, batch {batch_size}, "
                    f"SECLA+CoLaM{' teacher-cached' if cached_teacher else ''}, "
                    f"remat={'on' if cfg.train.grad_checkpoint else 'off'}"
                    f"{', txt-only' if os.environ.get('BENCH_TXT_ONLY') else ''}"
                    f"{', fwd-only' if os.environ.get('BENCH_FWD_ONLY') else ''})"
                ),
                "value": round(batch_size / dt, 2),
                "unit": "samples/sec/chip",
                "step_ms": round(dt * 1000, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
