"""Mini-corpus quality-parity rehearsal (VERDICT r4 next #4).

One command that rehearses the ENTIRE corpus-quality-parity pipeline on CPU
with synthetic data, so that when real weights/corpora appear the real run is
one flag change:

  1. build the ACTUAL reference torch model (read-only import from
     /root/reference, clip stubbed, .cuda() no-op'd) at a small config,
  2. briefly train it (torch AdamW, LM loss, eos-start shift — the reference
     recipe's loss core, train...match.py:267,287) on fixed synthetic
     batches so decode logits are peaked, not random-degenerate
     (the saturation trap documented in scripts/gate_crosskv_int8_cpu.py),
  3. convert the trained state dict with the production converter
     (weights_io.convert_multimodal_bart — same path as real checkpoints),
  4. beam-decode a HELD-OUT synthetic split through BOTH the reference
     (transformers generate, beam 5 / lp 2.0 / ngram 3, the README.md:8
     decode config) and this repo (infer.generate.generate_mm),
  5. detokenize with a synthetic entity-bearing vocab and run the FULL eval
     stack on both outputs: BLEU-1..4 / ROUGE-L / CIDEr-D
     (eval.caption_metrics), entity P/R (eval.entity_eval, HeuristicNER),
     and the {face,noface}x{name,noname} group analysis (eval.face_groups —
     reference evaluate_entity.py:376-497),
  6. assert metric identity between the two reports.

Token-identical captions make every downstream metric identical; a mismatch
pinpoints which stage diverged (decode vs scoring). This is the CI-time
stand-in for the reference's GoodNews/NYTimes800k evaluation
(evaluate_entity.py:509-510) that this image cannot run (no weights, no
corpora, no spaCy model, no METEOR jar).
"""

from __future__ import annotations

import json
import os
import sys
import types

import numpy as np

_REF_DIR = "/root/reference"

# deterministic synthetic vocab: interleave entity-shaped surface forms so
# HeuristicNER finds PERSON/ORG/GPE/DATE entities in both GT and generated
# captions and the entity-P/R + face-group stages score non-trivially
_PERSON = ["Alice Navarro", "Bob Okafor", "Carla Jensen", "David Liu",
           "Elena Petrova", "Frank Moreau", "Grace Tanaka", "Hugo Alvarez"]
_ORG = ["Acme Corp", "Globex Company", "Initech Group", "Umbrella Agency"]
_GPE = ["Paris", "Nairobi", "Osaka", "Lima", "Oslo", "Quito"]
_DATE = ["January 2019", "March 4", "October 1987", "2015"]


def detok_id(i: int) -> str:
    """id -> deterministic surface word (entity-bearing synthetic vocab)."""
    r = i % 29
    if r == 0:
        return _PERSON[i % len(_PERSON)]
    if r == 1:
        return _ORG[i % len(_ORG)]
    if r == 2:
        return _GPE[i % len(_GPE)]
    if r == 3:
        return _DATE[i % len(_DATE)]
    return f"w{i}"


def detok_row(row, pad_id: int = 1, specials=(0, 1, 2)) -> str:
    words = [detok_id(int(t)) for t in row
             if int(t) not in specials and int(t) < 50265]
    return " ".join(words)


def _load_reference_model(cfg, fcfg, ref_dir: str, seed: int):
    """Instantiate the reference BartForMultiModalGeneration with the same
    shims the golden-parity tests use (clip stub, .cuda() no-op)."""
    import torch

    if ref_dir not in sys.path:
        sys.path.insert(0, ref_dir)
    sys.modules.setdefault("clip", types.ModuleType("clip"))
    torch.Tensor.cuda = lambda self, *a, **k: self  # reference hard-calls it
    from transformers.models.bart.configuration_bart import (
        BartConfig as HFBartConfig,
    )

    from src.models.modeling_mmbart_clip_inside_vis_clipcap_ent_type_final_fix_len_enc_self_face_name_ids_crossattn import (  # noqa: E501
        BartForMultiModalGeneration,
    )

    torch.manual_seed(seed)
    hf_cfg = HFBartConfig(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model,
        encoder_layers=cfg.encoder_layers, decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.encoder_attention_heads,
        decoder_attention_heads=cfg.decoder_attention_heads,
        encoder_ffn_dim=cfg.encoder_ffn_dim,
        decoder_ffn_dim=cfg.decoder_ffn_dim,
        max_position_embeddings=cfg.max_position_embeddings,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        activation_function="gelu", scale_embedding=False,
        pad_token_id=1, bos_token_id=0, eos_token_id=2,
        decoder_start_token_id=2, output_hidden_states=False,
        return_dict=True,
    )
    model = BartForMultiModalGeneration(
        hf_cfg,
        enc_fusion_layer=list(fcfg.fusion_layers), dim_common=fcfg.dim_common,
        img_size=fcfg.img_size, prompt_mlp_type="clipcap",
        prompt_size=fcfg.prompt_size, clip_model=None, freeze_clip=False,
        max_ner_type_len=fcfg.max_ner_type_len,
        max_ner_type_len_gt=fcfg.max_ner_type_len_gt,
        only_image=fcfg.only_image, init_attn_weight=False,
    )
    model.eval()
    return model


def _torch_batch(batch):
    import torch

    return {k: torch.tensor(np.asarray(v)) for k, v in batch.items()}


def _train_reference(model, cfg, batches, steps: int, lr: float = 3e-4):
    """Brief torch-side overfit: LM CE with the reference's eos-start shift
    (train...match.py:196-209, 267, 287). Peaks the decode logits so beam
    comparisons measure real behavior, not random tie-flipping."""
    import torch

    opt = torch.optim.AdamW(model.parameters(), lr=lr)
    ce = torch.nn.CrossEntropyLoss(ignore_index=cfg.pad_token_id)
    model.train()
    first = last = None
    for i in range(steps):
        b = batches[i % len(batches)]
        cap = b["caption_ids"]
        # shift_tokens_right with decoder_start = eos (reference semantics)
        dec_in = torch.full_like(cap, cfg.pad_token_id)
        dec_in[:, 1:] = cap[:, :-1]
        dec_in[:, 0] = cfg.eos_token_id
        out = model(
            input_ids=b["article_ids"],
            attention_mask=(b["article_ids"] != cfg.pad_token_id).long(),
            decoder_input_ids=dec_in,
            image_features=b["image_cls"].float(),
            face_features=b["face_emb"].float(),
            face_mask=(b["face_emb"][:, :, -1] != 1).long(),
            name_ids=b["names_art_ids"],
            name_mask=(b["names_art_ids"] != cfg.pad_token_id).long(),
            add_ner_ffn=True,
        )
        loss = ce(out.logits.reshape(-1, out.logits.shape[-1]),
                  cap.reshape(-1).long())
        opt.zero_grad()
        loss.backward()
        opt.step()
        if i == 0:
            first = float(loss)
        last = float(loss)
    model.eval()
    return first, last


def _full_eval(out_dict: dict, data_dict: dict) -> dict:
    """The complete eval stack the reference runs (minus java METEOR /
    spaCy, which are env-absent and identical-by-construction anyway)."""
    from vacnic_tpu.eval.caption_metrics import compute_caption_metrics
    from vacnic_tpu.eval.entity_eval import evaluate_entity
    from vacnic_tpu.eval.face_groups import score_face_groups

    pairs = [(v["gen"], v["gt"]) for k, v in out_dict.items()
             if k not in ("bleu", "other metrics")]
    report = compute_caption_metrics(pairs)
    report["entities"] = evaluate_entity(out_dict)
    report["face_groups"] = score_face_groups(out_dict, data_dict)
    return report


def run_quality_rehearsal(out_dir: str, *, n_samples: int = 16,
                          train_steps: int = 120, seed: int = 0,
                          ref_dir: str = _REF_DIR) -> dict:
    """Run the rehearsal; writes caption JSONs + reports under out_dir and
    returns the summary dict (keys: token_identity, metrics_identical,
    reports...). Raises SystemExit(3) when the reference snapshot or torch
    is unavailable (env-blocked, not a failure)."""
    if train_steps < 1:
        # the whole point is peaked (trained) logits; fail at entry, not
        # after minutes of model build + decode (round(None) crash)
        raise ValueError(f"train_steps must be >= 1, got {train_steps}")
    try:
        import torch  # noqa: F401
    except Exception as e:  # pragma: no cover - torch is baked in
        raise SystemExit(f"quality-rehearsal needs torch: {e}")
    ref_model_file = os.path.join(
        ref_dir, "src", "models",
        "modeling_mmbart_clip_inside_vis_clipcap_ent_type_final_fix_len_enc_self_face_name_ids_crossattn.py",  # noqa: E501
    )
    if not os.path.isfile(ref_model_file):
        raise SystemExit(3)

    import jax.numpy as jnp
    import torch

    from vacnic_tpu.core.config import (BartConfig, DataConfig, DecodeConfig,
                                        FusionConfig, VacnicConfig)
    from vacnic_tpu.data.synthetic import synthetic_batch
    from vacnic_tpu.infer.generate import generate_mm
    from vacnic_tpu.models.weights_io import convert_multimodal_bart
    from vacnic_tpu.train.train_step import create_mask, face_mask_from_emb

    # reference hardcodes: 768-dim ClipCap mapper (model file :1136) and the
    # 50267-row NER table (:1150) — vocab/d_model are pinned, layers tiny
    cfg = BartConfig.tiny(
        vocab_size=50267, d_model=768, encoder_attention_heads=12,
        decoder_attention_heads=12, encoder_ffn_dim=256, decoder_ffn_dim=256,
    )
    fcfg = FusionConfig.tiny(
        fusion_layers=(0, 1), dim_common=768, img_size=768, prompt_size=4,
        face_feature_dim=512, max_faces=3, max_ner_type_len=12,
        max_ner_type_len_gt=6, ner_vocab_size=50267,
    )
    dcfg = DecodeConfig(num_beams=5, max_length=12, length_penalty=2.0)
    vcfg = VacnicConfig(
        bart=cfg, fusion=fcfg, decode=dcfg,
        data=DataConfig(article_max_length=32, caption_max_length=12),
    )

    os.makedirs(out_dir, exist_ok=True)
    model = _load_reference_model(cfg, fcfg, ref_dir, seed)

    # 2. brief reference-side training on fixed synthetic batches
    train_batches = [
        _torch_batch(synthetic_batch(vcfg, batch_size=8, seed=seed * 100 + s))
        for s in range(2)
    ]
    loss_first, loss_last = _train_reference(model, cfg, train_batches,
                                             train_steps)

    # 3. production converter on the trained state dict
    params = convert_multimodal_bart(model.state_dict(), cfg, fcfg)

    # 4. held-out decode through both stacks (f32 both sides — the precision
    # the reference decodes in, utils/test_mmbart_clip_ddp.py)
    held = synthetic_batch(vcfg, batch_size=n_samples, seed=seed * 100 + 7)
    seqs, _ = generate_mm(
        params, held["article_ids"], create_mask(held["article_ids"]),
        held["image_cls"], cfg, fcfg, dcfg,
        face_features=held["face_emb"],
        face_mask=face_mask_from_emb(held["face_emb"]),
        name_ids=held["names_art_ids"],
        name_mask=create_mask(held["names_art_ids"]),
        dtype=jnp.float32,
    )
    ours = np.asarray(seqs)

    from transformers.generation import GenerationMixin

    # the reference class predates the 4.50 GenerationMixin split; shim the
    # mixin back in (same pattern as tests/test_fusion_parity.py)
    GenClass = type("RefGen", (type(model), GenerationMixin), {})
    gen_ref = GenClass(
        model.config, enc_fusion_layer=list(fcfg.fusion_layers),
        dim_common=fcfg.dim_common, img_size=fcfg.img_size,
        prompt_mlp_type="clipcap", prompt_size=fcfg.prompt_size,
        clip_model=None, freeze_clip=False,
        max_ner_type_len=fcfg.max_ner_type_len,
        max_ner_type_len_gt=fcfg.max_ner_type_len_gt, only_image=False,
        init_attn_weight=False,
    )
    gen_ref.load_state_dict(model.state_dict())
    gen_ref.eval()
    tb = _torch_batch(held)
    with torch.no_grad():
        out = gen_ref.generate(
            input_ids=tb["article_ids"],
            attention_mask=(tb["article_ids"] != cfg.pad_token_id).long(),
            num_beams=dcfg.num_beams, max_length=dcfg.max_length,
            length_penalty=dcfg.length_penalty, early_stopping=True,
            no_repeat_ngram_size=dcfg.no_repeat_ngram_size,
            forced_bos_token_id=cfg.bos_token_id,
            decoder_start_token_id=cfg.eos_token_id, use_cache=False,
            image_features=tb["image_cls"].float(),
            face_features=tb["face_emb"].float(),
            face_mask=(tb["face_emb"][:, :, -1] != 1).long(),
            name_ids=tb["names_art_ids"],
            name_mask=(tb["names_art_ids"] != cfg.pad_token_id).long(),
            add_ner_ffn=True,
        )
    ref_seqs = (out.sequences if hasattr(out, "sequences") else out).numpy()

    # token identity (pad-stripped, the parity tests' comparison)
    ident = 0
    for i in range(n_samples):
        a = [int(t) for t in ours[i] if int(t) != cfg.pad_token_id]
        b = [int(t) for t in ref_seqs[i] if int(t) != cfg.pad_token_id]
        ident += int(a == b)
    token_identity = ident / n_samples

    # 5. detokenize + full eval stack on both outputs
    gts = [detok_row(np.asarray(held["caption_ids"])[i])
           for i in range(n_samples)]
    out_ours = {str(i): {"gt": gts[i], "gen": detok_row(ours[i])}
                for i in range(n_samples)}
    out_ref = {str(i): {"gt": gts[i], "gen": detok_row(ref_seqs[i])}
               for i in range(n_samples)}
    # face-group data dict: alternate faces / names presence so all four
    # {face,noface}x{name,noname} groups are populated
    data_dict = {
        f"hash{i}": {
            "face_emb_dir": (f"faces/{i}.npy" if i % 2 == 0 else []),
            "names": ([gts[i].split()[0]] if i % 4 < 2 else []),
        }
        for i in range(n_samples)
    }
    report_ours = _full_eval(out_ours, data_dict)
    report_ref = _full_eval(out_ref, data_dict)

    summary = {
        "n_samples": n_samples,
        "train_steps": train_steps,
        "train_loss_first": round(loss_first, 4),
        "train_loss_last": round(loss_last, 4),
        "token_identity": round(token_identity, 4),
        "metrics_identical": report_ours == report_ref,
        "ner_engine": report_ours["entities"].get("ner_engine"),
        "metrics": {
            "bleu4": report_ours["bleu"]["bleu4"],
            "rouge": report_ours["other metrics"]["rouge"],
            "cider": report_ours["other metrics"]["cider"],
            "meteor": report_ours["other metrics"]["meteor"],
        },
    }
    for name, obj in (("captions_ours.json", out_ours),
                      ("captions_reference.json", out_ref),
                      ("report_ours.json", report_ours),
                      ("report_reference.json", report_ref),
                      ("summary.json", summary)):
        with open(os.path.join(out_dir, name), "w") as f:
            json.dump(obj, f, indent=2)
    return summary
