"""Non-degenerate quality gate for the int8 self-KV cache.

Same protocol as gate_selfkv_fp8.py / gate_crosskv_int8_cpu.py (whose
docstring explains why the random-weight proxy saturates): decode the
OVERFIT gate model (reuses the int8 cross gate's trained params,
scripts/logs_r4/gate_params.npz — run that script's --phase train first if
absent) in three numerics:

  f32      : reference precision (the torch reference decodes fp32)
  bf16     : the accepted accelerator default (control distance)
  int8sim  : bf16 + VACNIC_SELFKV_INT8_SIM=1 — the kernel path's self-cache
             storage quantization (per-(L, t, row, H) scales,
             decode_fast.quantize_self_rows) applied as quantize->dequantize
             to the XLA path's cache writes. Slightly MORE lossy than the
             real kernel path: the sim's dequant re-rounds to bf16, while
             the kernel multiplies the f32 scores/probs by the f32 scale.

GATE: token_agreement(int8sim, bf16) >= token_agreement(bf16, f32).

Run on the TPU (the CPU runtime can't execute the bf16 dots):
  python scripts/gate_selfkv_int8.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# gate_crosskv_int8_cpu pins jax to CPU at import when argv lacks "--phase"
# (its train phase needs that before jax init) — this gate runs on the TPU
if "--phase" not in sys.argv:
    sys.argv += ["--phase", "decode"]

import jax
import jax.numpy as jnp
import numpy as np

from gate_crosskv_int8_cpu import GATE_PARAMS, DECODE_BATCH, gate_config


def main() -> None:
    from vacnic_tpu.data.synthetic import synthetic_batch
    from vacnic_tpu.models import fusion as F
    from vacnic_tpu.train.train_step import create_mask, face_mask_from_emb
    from vacnic_tpu.infer.generate import generate_mm

    cfg = gate_config()
    template = F.multimodal_bart_init(jax.random.PRNGKey(0), cfg.bart, cfg.fusion)
    _, treedef = jax.tree_util.tree_flatten(template)
    z = np.load(GATE_PARAMS)
    n = len([k for k in z.files if k.startswith("arr_")])
    trained = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(z[f"arr_{i}"]) for i in range(n)])
    first_loss, last_loss = float(z["first_loss"]), float(z["last_loss"])

    dbatch = synthetic_batch(cfg, batch_size=DECODE_BATCH, seed=0)

    def decode(dtype, int8_sim: bool):
        os.environ["VACNIC_PALLAS_DECODE"] = "0"
        if int8_sim:
            os.environ["VACNIC_SELFKV_INT8_SIM"] = "1"
        else:
            os.environ.pop("VACNIC_SELFKV_INT8_SIM", None)
        p = jax.tree_util.tree_map(lambda x: x.astype(dtype), trained)
        seqs, scores = generate_mm(
            p, dbatch["article_ids"], create_mask(dbatch["article_ids"]),
            dbatch["image_cls"], cfg.bart, cfg.fusion, cfg.decode,
            face_features=dbatch["face_emb"],
            face_mask=face_mask_from_emb(dbatch["face_emb"]),
            name_ids=dbatch["names_art_ids"],
            name_mask=create_mask(dbatch["names_art_ids"]),
            dtype=dtype)
        return np.asarray(seqs), np.asarray(scores)

    s_f32, sc_f32 = decode(jnp.float32, False)
    s_bf16, sc_bf16 = decode(jnp.bfloat16, False)
    s_int8, sc_int8 = decode(jnp.bfloat16, True)

    def agree(a, b):
        return float((a == b).mean())

    res = {
        "train_loss_first": round(first_loss, 4),
        "train_loss_last": round(last_loss, 4),
        "token_agree_bf16_vs_f32": round(agree(s_bf16, s_f32), 4),
        "token_agree_int8_vs_bf16": round(agree(s_int8, s_bf16), 4),
        "token_agree_int8_vs_f32": round(agree(s_int8, s_f32), 4),
        "seq_agree_bf16_vs_f32": round(float((s_bf16 == s_f32).all(axis=1).mean()), 4),
        "seq_agree_int8_vs_bf16": round(float((s_int8 == s_bf16).all(axis=1).mean()), 4),
        "max_dscore_int8_bf16": round(float(np.max(np.abs(sc_int8 - sc_bf16))), 6),
        "max_dscore_bf16_f32": round(float(np.max(np.abs(sc_bf16 - sc_f32))), 6),
    }
    res["gate_pass"] = bool(res["token_agree_int8_vs_bf16"]
                            >= res["token_agree_bf16_vs_f32"])
    print(json.dumps(res))


if __name__ == "__main__":
    main()
