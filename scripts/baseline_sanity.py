"""Sanity-check the 1.4 captions/sec A100 baseline estimate (VERDICT r1
weak #5) by timing the REFERENCE decode path itself — the actual
BartForMultiModalGeneration.generate HF loop from /root/reference — on CPU
torch at full bart-large scale, batch 1, beam 5, max_length 50, lp 2.0
(README.md:8). The A100 estimate then only has to be plausible relative to a
measured CPU number (GPU speedups for this Python-step-bound loop are
typically 5-20x), rather than standing alone.

Writes the measurement to stdout; BASELINE.md records it.
"""

from __future__ import annotations

import os
import sys
import time
import types

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import torch

sys.modules.setdefault("clip", types.ModuleType("clip"))
torch.Tensor.cuda = lambda self, *a, **k: self  # reference hard-calls .cuda()

from transformers.generation import GenerationMixin
from transformers.models.bart.configuration_bart import BartConfig as HFBartConfig

from src.models.modeling_mmbart_clip_inside_vis_clipcap_ent_type_final_fix_len_enc_self_face_name_ids_crossattn import (  # noqa: E501
    BartForMultiModalGeneration,
)


def main():
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)
    hf_cfg = HFBartConfig(
        vocab_size=50267, d_model=1024, encoder_layers=12, decoder_layers=12,
        encoder_attention_heads=16, decoder_attention_heads=16,
        encoder_ffn_dim=4096, decoder_ffn_dim=4096,
        max_position_embeddings=1024, dropout=0.0,
        activation_function="gelu", scale_embedding=False,
        pad_token_id=1, bos_token_id=0, eos_token_id=2, decoder_start_token_id=2,
        forced_bos_token_id=0, forced_eos_token_id=2, no_repeat_ngram_size=3,
        early_stopping=True, return_dict=True,
    )
    GenClass = type("RefGen", (BartForMultiModalGeneration, GenerationMixin), {})
    model = GenClass(
        hf_cfg, enc_fusion_layer=list(range(12)), dim_common=1024, img_size=768,
        prompt_mlp_type="clipcap", prompt_size=20, clip_model=None,
        freeze_clip=False, max_ner_type_len=80, max_ner_type_len_gt=20,
        only_image=False, init_attn_weight=False,
    )
    model.eval()

    rng = np.random.RandomState(0)
    src = torch.tensor(rng.randint(10, 40000, (1, 512)), dtype=torch.long)
    mask = torch.ones_like(src)
    img = torch.tensor(rng.randn(1, 768), dtype=torch.float32)
    face = torch.tensor(rng.randn(1, 4, 512), dtype=torch.float32)
    fmask = torch.ones(1, 4)
    nids = torch.tensor(rng.randint(10, 40000, (1, 80)), dtype=torch.long)
    nmask = torch.ones_like(nids)

    def decode_once(min_len):
        with torch.no_grad():
            return model.generate(
                input_ids=src, attention_mask=mask, num_beams=5, max_length=50,
                min_length=min_len, length_penalty=2.0, use_cache=True,
                image_features=img, face_features=face, face_mask=fmask,
                name_ids=nids, name_mask=nmask, add_ner_ffn=True)

    decode_once(0)  # warm-up
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        out = decode_once(49)  # force full-length decode like bench.py
    dt = (time.perf_counter() - t0) / n
    print(f"reference HF beam-5 len-50 decode, CPU torch ({torch.get_num_threads()} "
          f"threads): {dt:.2f} s/caption = {1/dt:.3f} captions/sec "
          f"(seq len {out.shape[-1] if hasattr(out, 'shape') else out.sequences.shape[-1]})")
    print(f"A100 estimate 1.4 cps implies a {1.4*dt:.1f}x GPU-over-CPU speedup "
          "for this loop — plausible for a Python-per-step HF decode")


if __name__ == "__main__":
    main()
