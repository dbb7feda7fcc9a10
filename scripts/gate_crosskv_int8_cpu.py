"""Non-degenerate quality gate for int8 cross-KV (VERDICT r3 next #4).

The r3 random-weight proxy SATURATES: random-init logits are near-degenerate
(top-1/top-2 margins ~1e-3), so int8-vs-bf16 token agreement (0.748) and the
bf16-vs-f32 control (0.796) both measure tie-flipping noise, not quantization
damage. This gate manufactures non-degenerate logits the only way available
in this image (no real weights): OVERFIT a small config on a fixed synthetic
set until the model's token distributions are peaked, then compare decodes.

Variants (all the CPU XLA decode path — no chip needed):
  f32   : reference numerics (the precision the torch reference decodes in)
  bf16  : the accepted accelerator default (control distance)
  int8  : bf16 + VACNIC_CROSSKV_INT8_SIM=1 — the kernel's exact cross-KV
          quantization applied as quantize->dequantize (decode_fast.py);
          the dequant re-rounds to bf16, so if anything it carries MORE
          error than the kernel's folded-scale int8 math.

GATE: token_agreement(int8, bf16) >= token_agreement(bf16, f32).
If int8 adds no more instability than the already-accepted bf16 step down
from f32 — now measured on peaked, trained logits — the default-on posture
is justified; otherwise flip VACNIC_CROSSKV_INT8 default off.

Reference decode precision: utils/test_mmbart_clip_ddp.py loads the fp32
model and generates without autocast (fp32 end to end).

Phases (the CPU runtime in this image cannot execute bf16xbf16->f32 dots,
so the decode comparison runs on the TPU):
  --phase train  : CPU — overfit + save params to GATE_PARAMS npz
  --phase decode : TPU — load params, decode f32/bf16/int8-sim, print JSON
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

PHASE = (sys.argv[sys.argv.index("--phase") + 1]
         if "--phase" in sys.argv else "train")
if PHASE == "train":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

GATE_PARAMS = os.environ.get(
    "GATE_PARAMS",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "logs_r4", "gate_params.npz"))

from vacnic_tpu.core.config import (BartConfig, ClipVisionConfig, DataConfig,
                                    DecodeConfig, FusionConfig, TrainConfig,
                                    VacnicConfig)

N_STEPS = int(os.environ.get("GATE_STEPS", 400))
BATCH = int(os.environ.get("GATE_BATCH", 16))
N_FIXED = 4  # distinct batches cycled (overfit target)
DECODE_BATCH = 32
# Replicate seed (r4b): varies the init key AND the synthetic data stream so
# independent gate replicates exist (GATE_SEED=1,2 strengthen the single-
# point PASS backing the default-on posture). Seed 0 = the original gate.
GATE_SEED = int(os.environ.get("GATE_SEED", 0))


def gate_config() -> VacnicConfig:
    """Between tiny and full: big enough for structured attention (8 heads,
    hd=16, 4+4 layers), small enough to overfit on CPU in minutes."""
    return VacnicConfig(
        bart=BartConfig.tiny(
            vocab_size=512, d_model=128, encoder_layers=4, decoder_layers=4,
            encoder_attention_heads=8, decoder_attention_heads=8,
            encoder_ffn_dim=256, decoder_ffn_dim=256,
            max_position_embeddings=128),
        clip=ClipVisionConfig.tiny(),
        fusion=FusionConfig.tiny(dim_common=128, img_size=128,
                                 fusion_layers=(0, 1, 2, 3),
                                 ner_vocab_size=512),
        data=DataConfig(article_max_length=32, caption_max_length=12),
        train=TrainConfig(train_batch_size=BATCH, compute_dtype="float32",
                          grad_checkpoint=False, lr_bart=3e-4),
        decode=DecodeConfig(num_beams=5, max_length=12, length_penalty=2.0),
    )


def train_phase() -> None:
    from vacnic_tpu.data.synthetic import synthetic_batch
    from vacnic_tpu.models import bart as B
    from vacnic_tpu.models import fusion as F
    from vacnic_tpu.train.train_step import make_train_step

    cfg = gate_config()
    key = jax.random.PRNGKey(GATE_SEED)
    params = {"model": F.multimodal_bart_init(key, cfg.bart, cfg.fusion)}
    teacher = B.bart_init(jax.random.fold_in(key, 1), cfg.bart)
    init_fn, step_fn = make_train_step(cfg, num_training_steps=N_STEPS)
    state = init_fn(params, teacher, jax.random.fold_in(key, 2))
    step_fn = jax.jit(step_fn, donate_argnums=0)

    batches = [synthetic_batch(cfg, batch_size=BATCH, seed=GATE_SEED * 100 + s)
               for s in range(N_FIXED)]
    first_loss = None
    for i in range(N_STEPS):
        state, metrics = step_fn(state, batches[i % N_FIXED])
        if i == 0:
            first_loss = float(metrics["loss"])
        if i % 100 == 0:
            print(f"step {i}: loss {float(metrics['loss']):.4f}", flush=True)
    last_loss = float(metrics["loss"])

    leaves, _ = jax.tree_util.tree_flatten(state.params["model"])
    os.makedirs(os.path.dirname(GATE_PARAMS), exist_ok=True)
    np.savez(GATE_PARAMS, first_loss=first_loss, last_loss=last_loss,
             **{f"arr_{i}": np.asarray(x) for i, x in enumerate(leaves)})
    print(f"saved {len(leaves)} arrays to {GATE_PARAMS} "
          f"(loss {first_loss:.4f} -> {last_loss:.4f})")


def decode_phase() -> None:
    from vacnic_tpu.data.synthetic import synthetic_batch
    from vacnic_tpu.models import fusion as F
    from vacnic_tpu.train.train_step import create_mask, face_mask_from_emb

    cfg = gate_config()
    # rebuild the treedef from an identically-configured init, then load
    template = F.multimodal_bart_init(jax.random.PRNGKey(0), cfg.bart, cfg.fusion)
    _, treedef = jax.tree_util.tree_flatten(template)
    z = np.load(GATE_PARAMS)
    n = len([k for k in z.files if k.startswith("arr_")])
    trained = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(z[f"arr_{i}"]) for i in range(n)])
    first_loss, last_loss = float(z["first_loss"]), float(z["last_loss"])

    # decode data drawn from the first train batch's seed. NOTE: the batch
    # size differs (32 vs the trained 16) and synthetic_batch draws from one
    # RandomState stream, so only the early token bodies coincide with
    # trained data — the decode set is related-but-not-identical. That is
    # fine for the gate: what it needs is PEAKED logits from a trained
    # model (the saturation fix), and the printed first-step top1-top2
    # margin verifies peakedness directly on the decode inputs.
    dbatch = synthetic_batch(cfg, batch_size=DECODE_BATCH, seed=GATE_SEED * 100)

    def decode(dtype, int8_sim: bool):
        from vacnic_tpu.infer.generate import generate_mm

        os.environ["VACNIC_PALLAS_DECODE"] = "0"
        if int8_sim:
            os.environ["VACNIC_CROSSKV_INT8_SIM"] = "1"
        else:
            os.environ.pop("VACNIC_CROSSKV_INT8_SIM", None)
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

    # degeneracy check: mean top1-top2 margin of the first decode step's
    # logprobs (trained model must be peaked, else the gate is void)
    from vacnic_tpu.infer import decode_fast as DF
    from vacnic_tpu.models.layers import expand_mask

    enc = F.mm_encoder_fwd(
        trained, dbatch["article_ids"], create_mask(dbatch["article_ids"]),
        dbatch["image_cls"], cfg.bart, cfg.fusion,
        face_features=dbatch["face_emb"],
        face_mask=face_mask_from_emb(dbatch["face_emb"]),
        name_ids=dbatch["names_art_ids"],
        name_mask=create_mask(dbatch["names_art_ids"]),
        add_ner_ffn=True, dtype=jnp.float32)["last_hidden"]
    dp = DF.build_decode_params(trained, jnp.float32)
    cache = DF.build_decode_cache(trained, enc, 1, cfg.decode.max_length,
                                  cfg.bart, jnp.float32)
    tok = jnp.full((DECODE_BATCH, 1), cfg.bart.decoder_start_token_id, jnp.int32)
    logits, _ = DF.decode_step(dp, trained, cache, tok, jnp.int32(0),
                               expand_mask(create_mask(dbatch["article_ids"]), 1),
                               cfg.bart, jnp.float32)
    top2 = jax.lax.top_k(logits[:, 0] if logits.ndim == 3 else logits, 2)[0]
    margin = float(jnp.mean(top2[:, 0] - top2[:, 1]))

    def agree(a, b):
        return float((a == b).mean())

    res = {
        "train_loss_first": round(first_loss, 4),
        "train_loss_last": round(last_loss, 4),
        "first_step_top1_top2_margin": round(margin, 4),
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
    if PHASE == "train":
        train_phase()
    else:
        decode_phase()
