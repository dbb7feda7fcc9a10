"""Validate the suspicious b256 bench reading (324.8 cps vs 132.8 at b128).

Beam decode is batch-independent per item: decoding the same 32 items inside
a 256-batch must produce identical tokens to a 32-batch run. Reports token
agreement of the shared items plus wall times of both shapes in the SAME
window (the chip drifts in phases — cross-window ratios lie).
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vacnic_tpu.core.config import VacnicConfig
from vacnic_tpu.data.synthetic import synthetic_batch
from vacnic_tpu.models import fusion as F
from vacnic_tpu.train.train_step import create_mask, face_mask_from_emb


def main():
    from vacnic_tpu.infer.generate import generate_mm_robust as generate_mm

    cfg = VacnicConfig.full_train()
    cfg = dataclasses.replace(
        cfg, decode=dataclasses.replace(cfg.decode,
                                        min_length=cfg.decode.max_length - 1))
    key = jax.random.PRNGKey(0)
    params = F.multimodal_bart_init(key, cfg.bart, cfg.fusion)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    big = synthetic_batch(cfg, batch_size=256, seed=0)
    small = {k: v[:32] for k, v in big.items()}

    def run(b):
        seqs, scores = generate_mm(
            params, b["article_ids"], create_mask(b["article_ids"]),
            b["image_cls"], cfg.bart, cfg.fusion, cfg.decode,
            face_features=b["face_emb"],
            face_mask=face_mask_from_emb(b["face_emb"]),
            name_ids=b["names_art_ids"],
            name_mask=create_mask(b["names_art_ids"]),
            dtype=jnp.bfloat16,
        )
        return np.asarray(seqs), np.asarray(scores)

    for name, b in (("b32", small), ("b256", big)):
        print(f"compiling {name}...", flush=True)
        out = run(b)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(b)
            times.append(time.perf_counter() - t0)
        n = b["article_ids"].shape[0]
        print(f"{name}: times={[f'{t:.3f}' for t in times]} "
              f"cps={n / min(times):.1f} nonpad_tokens={int((out[0] != 1).sum())}",
              flush=True)
        if name == "b32":
            s32 = out
        else:
            s256 = out

    agree = float((s32[0] == s256[0][:32]).mean())
    full = float((s32[0] == s256[0][:32]).all(axis=1).mean())
    print(f"batch-invariance: token_agreement={agree:.6f} seq_agreement={full:.4f}")
    print(f"b32 sample row: {s32[0][0][:16].tolist()}")
    print(f"b256 same row:  {s256[0][0][:16].tolist()}")


if __name__ == "__main__":
    main()
