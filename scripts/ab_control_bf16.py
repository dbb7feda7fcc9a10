"""Control for the int8 quality gate: how much token agreement does the
EXISTING bf16 default lose vs f32 on the same random-weight proxy?

The int8 gate (scripts/ab_crosskv_int8.py) reads 0.748 token agreement with
max|dscore| < 0.001 — but random-init logits are near-uniform over 50k
tokens, so ANY sub-millibel numeric noise flips beam choices. If bf16-vs-f32
(the precision the bench has always used) scores similarly on this proxy,
the proxy saturates and cannot distinguish int8 noise from bf16 noise.

Compares generate_mm on the XLA decode path (VACNIC_PALLAS_DECODE=0) with
dtype=bf16 vs dtype=f32 at b32 bench config. Run serially on the chip.
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["VACNIC_PALLAS_DECODE"] = "0"

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
    params32 = F.multimodal_bart_init(key, cfg.bart, cfg.fusion)
    batch = synthetic_batch(cfg, batch_size=BATCH, seed=0)

    def run(dtype):
        p = jax.tree_util.tree_map(lambda x: x.astype(dtype), params32)
        seqs, scores = generate_mm(
            p, batch["article_ids"], create_mask(batch["article_ids"]),
            batch["image_cls"], cfg.bart, cfg.fusion, cfg.decode,
            face_features=batch["face_emb"],
            face_mask=face_mask_from_emb(batch["face_emb"]),
            name_ids=batch["names_art_ids"],
            name_mask=create_mask(batch["names_art_ids"]),
            dtype=dtype,
        )
        return np.asarray(seqs), np.asarray(scores)

    print("compiling bf16...", flush=True)
    s_b, sc_b = run(jnp.bfloat16)
    print("compiling f32...", flush=True)
    s_f, sc_f = run(jnp.float32)
    tok = float((s_b == s_f).mean())
    seq = float((s_b == s_f).all(axis=1).mean())
    print(f"CONTROL bf16-vs-f32: token_agreement={tok:.6f} "
          f"seq_agreement={seq:.4f} max|dscore|={np.max(np.abs(sc_b - sc_f)):.5f}")


if __name__ == "__main__":
    main()
