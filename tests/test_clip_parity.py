"""CLIP ViT parity vs the installed HF CLIPVisionModel (tiny random config).

Pins the patch/CLS extraction semantics of `extract_clip_img_feat`
(train...match.py:220-240): ln_post applied to CLS and to the patch tokens
separately.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from vacnic_tpu.core.config import ClipVisionConfig
from vacnic_tpu.models.clip_vit import clip_vision_fwd
from vacnic_tpu.models.weights_io import convert_clip_vision_hf

CFG = ClipVisionConfig(image_size=32, patch_size=16, width=32, layers=2, heads=4, output_dim=16)


@pytest.fixture(scope="module")
def pair():
    from transformers import CLIPVisionConfig as HFCfg, CLIPVisionModel

    torch.manual_seed(0)
    hf = CLIPVisionModel(
        HFCfg(
            hidden_size=CFG.width,
            intermediate_size=CFG.width * 4,
            num_hidden_layers=CFG.layers,
            num_attention_heads=CFG.heads,
            image_size=CFG.image_size,
            patch_size=CFG.patch_size,
            hidden_act="quick_gelu",
            attention_dropout=0.0,
        )
    )
    hf.eval()
    params = convert_clip_vision_hf(hf.state_dict(), CFG)
    return hf, params


def test_cls_and_patch_parity(pair, rng):
    hf, params = pair
    pixels = rng.randn(2, CFG.image_size, CFG.image_size, 3).astype(np.float32)
    with torch.no_grad():
        out = hf(pixel_values=torch.tensor(pixels.transpose(0, 3, 1, 2)))
    patches, cls = clip_vision_fwd(params, jnp.asarray(pixels), CFG)
    np.testing.assert_allclose(np.asarray(cls), out.pooler_output.numpy(), atol=1e-4, rtol=1e-4)
    with torch.no_grad():
        ref_patches = hf.vision_model.post_layernorm(out.last_hidden_state[:, 1:, :])
    np.testing.assert_allclose(np.asarray(patches), ref_patches.numpy(), atol=1e-4, rtol=1e-4)
