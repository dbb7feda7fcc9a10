"""Golden parity for the ONLY-VISUAL variant vs the reference's second model
file (...enc_self_crossattn.py, SURVEY §2.2) — our `only_image=True` path must
reproduce it exactly (the reference ships it as a separate 1925-LoC fork)."""

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

CFG = BartConfig.tiny(
    vocab_size=50267, d_model=768, encoder_attention_heads=12,
    decoder_attention_heads=12, encoder_ffn_dim=256, decoder_ffn_dim=256,
)
FCFG = FusionConfig.tiny(
    fusion_layers=(0, 1), dim_common=768, img_size=768, prompt_size=4,
    only_image=True, ner_vocab_size=50267,
)


def test_onlyvis_forward_parity():
    sys.path.insert(0, REF)
    sys.modules.setdefault("clip", types.ModuleType("clip"))
    torch.Tensor.cuda = lambda self, *a, **k: self
    from transformers.models.bart.configuration_bart import BartConfig as HFBartConfig

    from src.models.modeling_mmbart_clip_inside_vis_clipcap_ent_type_final_fix_len_enc_self_crossattn import (  # noqa: E501
        BartForMultiModalGeneration as OnlyVisModel,
    )

    torch.manual_seed(1)
    hf_cfg = HFBartConfig(
        vocab_size=CFG.vocab_size, d_model=CFG.d_model,
        encoder_layers=CFG.encoder_layers, decoder_layers=CFG.decoder_layers,
        encoder_attention_heads=CFG.encoder_attention_heads,
        decoder_attention_heads=CFG.decoder_attention_heads,
        encoder_ffn_dim=CFG.encoder_ffn_dim, decoder_ffn_dim=CFG.decoder_ffn_dim,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        activation_function="gelu", scale_embedding=False,
        pad_token_id=1, bos_token_id=0, eos_token_id=2, decoder_start_token_id=2,
        return_dict=True,
    )
    ref = OnlyVisModel(
        hf_cfg, enc_fusion_layer=list(FCFG.fusion_layers), dim_common=FCFG.dim_common,
        img_size=FCFG.img_size, prompt_mlp_type="clipcap", prompt_size=FCFG.prompt_size,
        clip_model=None, freeze_clip=False, max_ner_type_len=FCFG.max_ner_type_len,
        max_ner_type_len_gt=FCFG.max_ner_type_len_gt, only_image=True,
        init_attn_weight=False,
    )
    ref.eval()

    rng = np.random.RandomState(9)
    b, s, t = 2, 12, 7
    src = rng.randint(4, 50000, size=(b, s))
    src[1, -3:] = 1
    mask = (src != 1).astype(np.int64)
    tgt_in = rng.randint(4, 50000, size=(b, t))
    tgt_in[:, 0] = 2
    img_cls = rng.randn(b, 768).astype(np.float32)

    with torch.no_grad():
        out = ref(
            input_ids=torch.tensor(src), attention_mask=torch.tensor(mask),
            decoder_input_ids=torch.tensor(tgt_in),
            image_features=torch.tensor(img_cls),
        )

    params = convert_multimodal_bart(ref.state_dict(), CFG, FCFG)
    ours = F.mm_forward(
        params, jnp.asarray(src), jnp.asarray(mask), jnp.asarray(tgt_in),
        jnp.asarray(img_cls), CFG, FCFG,
    )
    np.testing.assert_allclose(
        np.asarray(ours["hidden_states_img"]), out.hidden_states_img.numpy(),
        atol=2e-4, rtol=2e-4, err_msg="img stream",
    )
    np.testing.assert_allclose(
        np.asarray(ours["logits"]), out.logits.numpy(), atol=5e-4, rtol=5e-4,
        err_msg="lm logits",
    )
