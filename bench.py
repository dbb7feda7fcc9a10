"""Benchmark: captions/sec/chip for full VACNIC BART-large beam-5 decode.

North-star metric (BASELINE.json): captions/sec/chip at beam 5, max_length 50,
length_penalty 2.0 on the full multimodal model (article 512 + visual prompt +
face + NER streams). The reference decodes batch-1 through HF's Python beam
loop on an A100 (README.md:8, utils/test_mmbart_clip_ddp.py); the repo
publishes no throughput number, so `vs_baseline` is computed against a
documented estimate of that path: ~1.4 captions/sec (≈0.7 s per beam-5
50-token caption with per-step host dispatch on one A100 — BASELINE.md notes
"reference throughput must be measured or estimated").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

# fused Pallas decode-stack kernel by default (kernels/decode_layer.py):
# measured 44.8 vs 40.0 captions/sec on v5e; on-chip parity in
# scripts/bench_decode_kernel.py. Opt out with VACNIC_PALLAS_DECODE=0.
os.environ.setdefault("VACNIC_PALLAS_DECODE", "1")

import jax
import jax.numpy as jnp

REFERENCE_CAPTIONS_PER_SEC = 1.4  # estimated A100 batch-1 HF-loop throughput


def main() -> None:
    from vacnic_tpu.core.config import VacnicConfig
    from vacnic_tpu.data.synthetic import synthetic_batch
    from vacnic_tpu.infer.generate import generate_mm
    from vacnic_tpu.models import fusion as F
    from vacnic_tpu.train.train_step import create_mask, face_mask_from_emb

    import dataclasses
    import os

    if os.environ.get("BENCH_TINY"):
        # CPU smoke mode: exercises the exact bench code path on tiny shapes
        # (tests/test_bench_smoke.py) so driver-side breakage is caught early
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        cfg = VacnicConfig.tiny()
    else:
        cfg = VacnicConfig.full_train()
    # min_length = max_length: random-weight models emit eos immediately, which
    # would measure a 2-step decode; force the full 50-token beam search so the
    # number reflects real caption-length decoding cost.
    cfg = dataclasses.replace(
        cfg, decode=dataclasses.replace(cfg.decode, min_length=cfg.decode.max_length - 1)
    )
    key = jax.random.PRNGKey(0)
    params = F.multimodal_bart_init(key, cfg.bart, cfg.fusion)
    compute_dtype = jnp.float32 if os.environ.get("BENCH_TINY") else jnp.bfloat16
    params = jax.tree_util.tree_map(lambda x: x.astype(compute_dtype), params)

    # default batch 128: best measured captions/sec/chip (115.3 vs 104.5 at
    # 64, ~91 at 32 — serving throughput at the operator's batch choice; the
    # decode config itself matches the reference: beam 5, len 50, lp 2.0)
    batch_size = 2 if os.environ.get("BENCH_TINY") else int(os.environ.get("BENCH_BATCH", 128))
    batch = synthetic_batch(cfg, batch_size=batch_size, seed=0)

    import numpy as np

    def run():
        seqs, scores = generate_mm(
            params,
            batch["article_ids"],
            create_mask(batch["article_ids"]),
            batch["image_cls"],
            cfg.bart,
            cfg.fusion,
            cfg.decode,
            face_features=batch["face_emb"],
            face_mask=face_mask_from_emb(batch["face_emb"]),
            name_ids=batch["names_art_ids"],
            name_mask=create_mask(batch["names_art_ids"]),
            dtype=compute_dtype,
        )
        # np.asarray forces a device→host transfer of the result: on tunneled
        # backends `block_until_ready` may not actually block, which would
        # time dispatch instead of execution.
        return np.asarray(seqs)

    run()  # compile + warmup
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = time.perf_counter() - t0
    cps = batch_size * iters / dt

    print(
        json.dumps(
            {
                "metric": "captions/sec/chip (BART-large full VACNIC, beam-5, len 50, lp 2.0)",
                "value": round(cps, 3),
                "unit": "captions/sec/chip",
                "batch": batch_size,
                "vs_baseline": round(cps / REFERENCE_CAPTIONS_PER_SEC, 2),
                # the reference publishes no throughput; the denominator is a
                # documented ESTIMATE of its A100 batch-1 HF loop (BASELINE.md)
                "baseline_basis": f"estimated {REFERENCE_CAPTIONS_PER_SEC} "
                                  "captions/sec (A100 batch-1 HF generate loop; "
                                  "repo publishes no number — see BASELINE.md)",
            }
        )
    )


if __name__ == "__main__":
    main()
