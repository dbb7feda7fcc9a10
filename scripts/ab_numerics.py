"""bf16-state numerics A/B (VERDICT r1 weak #4): prove the memory strategy
(bf16 CoLaM teacher + bf16 Adam mu) trains the same as fp32 state.

Runs the SAME synthetic data stream through the full train step twice —
(a) fp32 teacher + fp32 mu, (b) bf16 teacher + bf16 mu — and reports the
loss trajectories and deltas. Full BART-large at batch 8 without remat (the
fp32 variant does not fit HBM at batch 32, which is why bf16 state exists).

Writes a JSON summary consumed by PARITY.md's numerics note.

Usage: python scripts/ab_numerics.py [--steps 300] [--batch 8] [--tiny]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run_variant(cfg, bf16_state: bool, steps: int, batch_size: int, log_every: int):
    from vacnic_tpu.core.rng import set_random_seed
    from vacnic_tpu.data.synthetic import synthetic_batch
    from vacnic_tpu.models import bart as B
    from vacnic_tpu.models import fusion as F
    from vacnic_tpu.train.train_step import make_train_step

    key = set_random_seed(0)
    params = {"model": F.multimodal_bart_init(key, cfg.bart, cfg.fusion)}
    teacher = B.bart_init(jax.random.fold_in(key, 1), cfg.bart)
    if bf16_state:
        teacher = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), teacher)
    # AB_NU_BF16=1 additionally stores the Adam second moment in bf16 in the
    # bf16 variant (scale_by_adam_low_precision)
    nu = jnp.bfloat16 if (bf16_state and os.environ.get("AB_NU_BF16")) else None
    init_fn, step_fn = make_train_step(
        cfg, num_training_steps=steps,
        mu_dtype=jnp.bfloat16 if bf16_state else None, nu_dtype=nu)
    state = init_fn(params, teacher, jax.random.fold_in(key, 2))
    step = jax.jit(step_fn, donate_argnums=0)

    losses = []
    t0 = time.time()
    for i in range(steps):
        batch = synthetic_batch(cfg, batch_size=batch_size, seed=i % 64)
        state, m = step(state, batch)
        if i % log_every == 0 or i == steps - 1:
            losses.append((i, float(np.asarray(m["loss"]))))
    print(f"  variant {'bf16' if bf16_state else 'fp32'}: {time.time()-t0:.0f}s",
          file=sys.stderr)
    return losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--tiny", action="store_true", help="tiny config (CPU-testable)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import dataclasses

    from vacnic_tpu.core.config import VacnicConfig

    cfg = VacnicConfig.tiny() if args.tiny else VacnicConfig.full_train()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, grad_checkpoint=False))

    fp32 = run_variant(cfg, False, args.steps, args.batch, args.log_every)
    bf16 = run_variant(cfg, True, args.steps, args.batch, args.log_every)

    deltas = [abs(a[1] - b[1]) for a, b in zip(fp32, bf16)]
    rel = [d / max(abs(a[1]), 1e-9) for d, a in zip(deltas, fp32)]
    summary = {
        "config": "tiny" if args.tiny else "bart-large",
        "steps": args.steps, "batch": args.batch,
        "fp32_first_last": [fp32[0][1], fp32[-1][1]],
        "bf16_first_last": [bf16[0][1], bf16[-1][1]],
        "final_abs_delta": deltas[-1],
        "mean_abs_delta": float(np.mean(deltas)),
        "max_rel_delta": float(np.max(rel)),
        "trajectory": [{"step": a[0], "fp32": a[1], "bf16": b[1]}
                       for a, b in zip(fp32, bf16)],
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "trajectory"}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
