"""On-chip quality gate + A/B for int8 cross-KV (VERDICT r2 #3).

Runs the FULL beam search (generate_mm, bench shapes/config) twice on the
same inputs — bf16 cross-KV vs int8 cross-KV — and reports:

  * beam-token agreement (fraction of output token positions identical),
  * sequence agreement (fraction of captions fully identical),
  * score max|delta|,
  * wall time for each variant (same-window, 3 reps median).

Gate (infer/generate gating note): int8 stays opt-in unless token agreement
>= 0.999 at bench shapes. Run serially — ONE TPU process at a time.
Env: BENCH_BATCH (default 32 — a b128 run needs ~2 compiles of the full
search; start with 32 for the quality read, then 128 for the speed read).
"""

from __future__ import annotations

import dataclasses
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("VACNIC_PALLAS_DECODE", "1")

import jax
import jax.numpy as jnp
import numpy as np

from vacnic_tpu.core.config import VacnicConfig
from vacnic_tpu.data.synthetic import synthetic_batch
from vacnic_tpu.models import fusion as F
from vacnic_tpu.train.train_step import create_mask, face_mask_from_emb

BATCH = int(os.environ.get("BENCH_BATCH", 32))


def main():
    from vacnic_tpu.infer.generate import generate_mm

    cfg = VacnicConfig.full_train()
    cfg = dataclasses.replace(
        cfg, decode=dataclasses.replace(cfg.decode,
                                        min_length=cfg.decode.max_length - 1))
    key = jax.random.PRNGKey(0)
    params = F.multimodal_bart_init(key, cfg.bart, cfg.fusion)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    batch = synthetic_batch(cfg, batch_size=BATCH, seed=0)

    def run():
        seqs, scores = generate_mm(
            params, batch["article_ids"], create_mask(batch["article_ids"]),
            batch["image_cls"], cfg.bart, cfg.fusion, cfg.decode,
            face_features=batch["face_emb"],
            face_mask=face_mask_from_emb(batch["face_emb"]),
            name_ids=batch["names_art_ids"],
            name_mask=create_mask(batch["names_art_ids"]),
            dtype=jnp.bfloat16,
        )
        return np.asarray(seqs), np.asarray(scores)

    def timed(run, n=3):
        out = run()
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        return out, statistics.median(times)

    results = {}
    for mode in ("bf16", "int8"):
        os.environ["VACNIC_CROSSKV_INT8"] = "1" if mode == "int8" else "0"
        jax.clear_caches()  # the flag is read at trace time
        print(f"compiling {mode}...", flush=True)
        (seqs, scores), t = timed(run)
        results[mode] = (seqs, scores, t)
        print(f"{mode}: {BATCH / t:.2f} captions/sec ({t*1e3:.1f} ms)", flush=True)

    s_b, sc_b, _ = results["bf16"]
    s_q, sc_q, _ = results["int8"]
    tok_agree = float((s_b == s_q).mean())
    seq_agree = float((s_b == s_q).all(axis=1).mean())
    dscore = float(np.max(np.abs(sc_b - sc_q)))
    print(f"token_agreement={tok_agree:.6f} seq_agreement={seq_agree:.4f} "
          f"max|dscore|={dscore:.5f}")
    print(f"speedup={results['bf16'][2] / results['int8'][2]:.3f}x")
    print(f"GATE {'PASS' if tok_agree >= 0.999 else 'FAIL'} (>=0.999 token agreement)")


if __name__ == "__main__":
    main()
