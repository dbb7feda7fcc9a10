"""GOLDEN PARITY: our JAX fusion model vs the actual reference torch model.

Imports the reference `BartForMultiModalGeneration` (read-only, from
/root/reference) with random weights, converts its state dict, and compares
full-forward logits and every stream output. This pins the hardest parts of
SURVEY §7: mask semantics, stream threading, NER length-compression, the
ClipCap prompt path, and the decoder over the fused encoder output.

Skipped when the reference snapshot is not mounted.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference snapshot not mounted")

from vacnic_tpu.core.config import BartConfig, FusionConfig
from vacnic_tpu.models import fusion as F
from vacnic_tpu.models.weights_io import convert_multimodal_bart

# Reference quirks: d_model must match the hardcoded 768-dim ClipCap mapper
# (model file :1136) and vocab must cover the hardcoded 50267-row NER table
# (:1150); tiny layer counts keep it fast.
CFG = BartConfig.tiny(
    vocab_size=50267, d_model=768, encoder_attention_heads=12,
    decoder_attention_heads=12, encoder_ffn_dim=256, decoder_ffn_dim=256,
)
FCFG = FusionConfig.tiny(
    fusion_layers=(0, 1), dim_common=768, img_size=768, prompt_size=4,
    face_feature_dim=512, max_faces=3, max_ner_type_len=12, max_ner_type_len_gt=6,
    ner_vocab_size=50267,
)


@pytest.fixture(scope="module")
def ref_model():
    sys.path.insert(0, REF)
    # the reference imports `clip` (OpenAI) at module top; only ClipViTFeat
    # uses it, which we never construct — a stub module satisfies the import
    sys.modules.setdefault("clip", types.ModuleType("clip"))
    # the reference hard-calls .cuda() inside forward; make it a no-op on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    from transformers.models.bart.configuration_bart import BartConfig as HFBartConfig

    from src.models.modeling_mmbart_clip_inside_vis_clipcap_ent_type_final_fix_len_enc_self_face_name_ids_crossattn import (  # noqa: E501
        BartForMultiModalGeneration,
    )

    torch.manual_seed(0)
    hf_cfg = HFBartConfig(
        vocab_size=CFG.vocab_size, d_model=CFG.d_model,
        encoder_layers=CFG.encoder_layers, decoder_layers=CFG.decoder_layers,
        encoder_attention_heads=CFG.encoder_attention_heads,
        decoder_attention_heads=CFG.decoder_attention_heads,
        encoder_ffn_dim=CFG.encoder_ffn_dim, decoder_ffn_dim=CFG.decoder_ffn_dim,
        max_position_embeddings=CFG.max_position_embeddings,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        activation_function="gelu", scale_embedding=False,
        pad_token_id=1, bos_token_id=0, eos_token_id=2, decoder_start_token_id=2,
        output_hidden_states=True, return_dict=True,
    )
    model = BartForMultiModalGeneration(
        hf_cfg,
        enc_fusion_layer=list(FCFG.fusion_layers),
        dim_common=FCFG.dim_common,
        img_size=FCFG.img_size,
        prompt_mlp_type="clipcap",
        prompt_size=FCFG.prompt_size,
        clip_model=None,
        freeze_clip=False,
        max_ner_type_len=FCFG.max_ner_type_len,
        max_ner_type_len_gt=FCFG.max_ner_type_len_gt,
        only_image=FCFG.only_image,
        init_attn_weight=False,
    )
    model.eval()
    return model


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(7)
    b, s, t = 2, 14, 9
    src = rng.randint(4, 50000, size=(b, s))
    src[0, -3:] = 1
    src_mask = (src != 1).astype(np.int64)
    tgt_in = rng.randint(4, 50000, size=(b, t))
    tgt_in[:, 0] = 2
    img_cls = rng.randn(b, 768).astype(np.float32)
    face = rng.randn(b, FCFG.max_faces, 512).astype(np.float32)
    face[1, -1, :] = 1.0  # padded face row
    face_mask = (face[:, :, -1] != 1).astype(np.int64)
    name_ids = rng.randint(4, 50000, size=(b, FCFG.max_ner_type_len))
    name_ids[:, -2:] = 1
    name_mask = (name_ids != 1).astype(np.int64)
    return src, src_mask, tgt_in, img_cls, face, face_mask, name_ids, name_mask


def test_full_forward_parity(ref_model, inputs):
    src, src_mask, tgt_in, img_cls, face, face_mask, name_ids, name_mask = inputs
    with torch.no_grad():
        ref = ref_model(
            input_ids=torch.tensor(src),
            attention_mask=torch.tensor(src_mask),
            decoder_input_ids=torch.tensor(tgt_in),
            image_features=torch.tensor(img_cls),
            face_features=torch.tensor(face),
            face_mask=torch.tensor(face_mask),
            name_ids=torch.tensor(name_ids),
            name_mask=torch.tensor(name_mask),
            add_ner_ffn=True,
        )
    params = convert_multimodal_bart(ref_model.state_dict(), CFG, FCFG)
    ours = F.mm_forward(
        params, jnp.asarray(src), jnp.asarray(src_mask), jnp.asarray(tgt_in),
        jnp.asarray(img_cls), CFG, FCFG,
        face_features=jnp.asarray(face), face_mask=jnp.asarray(face_mask),
        name_ids=jnp.asarray(name_ids), name_mask=jnp.asarray(name_mask),
        add_ner_ffn=True,
    )
    np.testing.assert_allclose(
        np.asarray(ours["hidden_states_img"]), ref.hidden_states_img.numpy(),
        atol=2e-4, rtol=2e-4, err_msg="img stream",
    )
    np.testing.assert_allclose(
        np.asarray(ours["hidden_states_face"]), ref.hidden_states_face.numpy(),
        atol=2e-4, rtol=2e-4, err_msg="face stream",
    )
    np.testing.assert_allclose(
        np.asarray(ours["hidden_states_ner"]), ref.hidden_states_ner.numpy(),
        atol=2e-4, rtol=2e-4, err_msg="ner stream",
    )
    np.testing.assert_allclose(
        np.asarray(ours["logits"]), ref.logits.numpy(), atol=5e-4, rtol=5e-4,
        err_msg="lm logits",
    )


def test_caption_bit_compatibility(ref_model, inputs):
    """The BASELINE.json target: token-identical beam-5 captions vs the
    reference model end-to-end (fusion encoder + beam search + length penalty)."""
    from transformers.generation import GenerationMixin

    from vacnic_tpu.core.config import DecodeConfig
    from vacnic_tpu.infer.generate import generate_mm

    src, src_mask, _, img_cls, face, face_mask, name_ids, name_mask = inputs

    # the reference class predates the 4.50 GenerationMixin split; shim it back
    GenClass = type("RefGen", (type(ref_model), GenerationMixin), {})
    gen_ref = GenClass(
        ref_model.config, enc_fusion_layer=list(FCFG.fusion_layers),
        dim_common=FCFG.dim_common, img_size=FCFG.img_size,
        prompt_mlp_type="clipcap", prompt_size=FCFG.prompt_size, clip_model=None,
        freeze_clip=False, max_ner_type_len=FCFG.max_ner_type_len,
        max_ner_type_len_gt=FCFG.max_ner_type_len_gt, only_image=False,
        init_attn_weight=False,
    )
    gen_ref.load_state_dict(ref_model.state_dict())
    gen_ref.eval()
    gen_ref.generation_config.output_hidden_states = False

    dcfg = DecodeConfig(num_beams=5, max_length=12, length_penalty=2.0)
    params = convert_multimodal_bart(ref_model.state_dict(), CFG, FCFG)
    seqs, _ = generate_mm(
        params, jnp.asarray(src), jnp.asarray(src_mask), jnp.asarray(img_cls),
        CFG, FCFG, dcfg,
        face_features=jnp.asarray(face), face_mask=jnp.asarray(face_mask),
        name_ids=jnp.asarray(name_ids), name_mask=jnp.asarray(name_mask),
    )
    with torch.no_grad():
        out = gen_ref.generate(
            input_ids=torch.tensor(src), attention_mask=torch.tensor(src_mask),
            num_beams=5, max_length=12, length_penalty=2.0, early_stopping=True,
            no_repeat_ngram_size=3, forced_bos_token_id=0,
            decoder_start_token_id=2, use_cache=False,
            image_features=torch.tensor(img_cls), face_features=torch.tensor(face),
            face_mask=torch.tensor(face_mask), name_ids=torch.tensor(name_ids),
            name_mask=torch.tensor(name_mask), add_ner_ffn=True,
        )
    out = out.sequences if hasattr(out, "sequences") else out
    for i in range(src.shape[0]):
        ours_row = [t for t in np.asarray(seqs)[i] if t != 1]
        ref_row = [t for t in out.numpy()[i] if t != 1]
        assert ours_row == ref_row, f"row {i}: {ours_row} != {ref_row}"
