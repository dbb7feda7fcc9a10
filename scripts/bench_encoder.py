"""Time the multimodal fusion encoder forward at bench shapes (batch 32,
article 512, bf16) — the once-per-decode cost amortized over 50 beam steps."""

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
    cfg = VacnicConfig.full_train()
    key = jax.random.PRNGKey(0)
    params = F.multimodal_bart_init(key, cfg.bart, cfg.fusion)
    batch = synthetic_batch(cfg, batch_size=32, seed=0)

    @jax.jit
    def enc(params, batch):
        src = batch["article_ids"]
        out = F.mm_encoder_fwd(
            params, src, create_mask(src), batch["image_cls"], cfg.bart,
            cfg.fusion, face_features=batch["face_emb"],
            face_mask=face_mask_from_emb(batch["face_emb"]),
            name_ids=batch["names_art_ids"],
            name_mask=create_mask(batch["names_art_ids"]), dtype=jnp.bfloat16)
        return out["last_hidden"][0, 0, :8]

    print("compiling encoder...", file=sys.stderr, flush=True)
    _ = np.asarray(enc(params, batch))
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(enc(params, batch))
        best = min(best, time.perf_counter() - t0)
    print(f"mm encoder fwd (batch 32, S=512, bf16): {best*1e3:.1f} ms "
          f"= {best/50*1e3:.2f} ms per decode step amortized")


if __name__ == "__main__":
    main()
