"""End-to-end checkpoint seam (VERDICT r2 #7/#8): a real torch BART state
dict → scripts/convert_checkpoint.py → .npz → `cli train --init-bart` →
`cli generate`, asserting the converted weights actually flow into the decode
(reference flow: torch.save/torch.load of the pickled module,
utils/test_mmbart_clip_ddp.py:1087). Also the tuned-CLIP load path
(`--clip-ckpt`, reference --trained_clip train...match.py:736-739).
"""

import importlib.util
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from vacnic_tpu.cli import main as cli_main
from tests.test_cli_end_to_end import _write_dataset, _write_vocab


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(os.path.dirname(__file__), "..", "scripts", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tiny_hf_bart(vocab_size, seed=0):
    from transformers import BartConfig as HFBartConfig, BartForConditionalGeneration

    torch.manual_seed(seed)
    cfg = HFBartConfig(
        vocab_size=vocab_size, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_position_embeddings=128,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        activation_function="gelu", scale_embedding=False,
        pad_token_id=1, bos_token_id=0, eos_token_id=2,
        decoder_start_token_id=2, forced_bos_token_id=0,
    )
    model = BartForConditionalGeneration(cfg)
    model.eval()
    return model


def test_torch_sd_to_train_to_generate(tmp_path, capsys):
    cc = _load_script("convert_checkpoint")
    vocab, merges, vocab_size = _write_vocab(tmp_path)
    data_dir = _write_dataset(tmp_path)
    model_vocab = vocab_size + 8

    # 1. torch BART checkpoint on disk (the artifact a real user starts from)
    hf = _tiny_hf_bart(model_vocab - 2)
    sd_path = str(tmp_path / "bart_sd.pt")
    torch.save(hf.state_dict(), sd_path)

    # 2. convert via the CLI script (argv path, not the python API)
    npz_path = str(tmp_path / "bart.npz")
    rc = cc.main([
        "bart", sd_path, npz_path,
        "--vocab-size", str(model_vocab - 2), "--resize-to", str(model_vocab),
        "--layers", "2", "--d-model", "32", "--ffn-dim", "64",
        "--heads", "4", "--max-pos", "128",
    ])
    assert rc == 0 and os.path.exists(npz_path)
    converted = cc.load_tree(npz_path)
    assert converted["shared"]["weight"].shape[0] == model_vocab

    # 3. train one step seeded from the converted npz
    out_dir = str(tmp_path / "out")
    common = [
        "--set", f"bart.vocab_size={model_vocab}",
        "--set", f"fusion.ner_vocab_size={model_vocab}",
        "--set", "fusion.face_feature_dim=8",
        "--set", "train.train_batch_size=2",
        "--set", "train.val_batch_size=2",
        "--set", "train.num_epochs=1",
        "--set", "data.num_workers=2",
        "--set", "data.dataset=goodnews",
        "--set", "clip.image_size=32",
        "--set", "clip.patch_size=16",
        "--set", "clip.width=32",
        "--set", "clip.layers=1",
        "--set", "clip.heads=4",
        "--set", "decode.num_beams=2",
        "--set", "decode.max_length=8",
    ]
    rc = cli_main([
        "train", "--config", "tiny",
        "--data-dir", data_dir, "--out-dir", out_dir,
        "--vocab", vocab, "--merges", merges,
        "--init-bart", npz_path, "--max-steps", "1",
    ] + common)
    assert rc == 0
    capsys.readouterr()

    # 4. the converted weights reached the train state: the frozen CoLaM
    # teacher is exactly the converted tree (never stepped), restored from
    # the saved checkpoint
    from vacnic_tpu.train.checkpoints import CheckpointManager

    ckpt_dir = os.path.join(out_dir, "best")
    from vacnic_tpu.core.config import VacnicConfig

    with open(os.path.join(ckpt_dir, "config.json")) as f:
        assert json.load(f)["bart"]["vocab_size"] == model_vocab
    mgr = CheckpointManager(ckpt_dir)
    state, _ = mgr.restore(None)
    np.testing.assert_allclose(
        np.asarray(state["teacher"]["shared"]["weight"]),
        np.asarray(converted["shared"]["weight"]), rtol=0, atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(state["teacher"]["decoder"]["layers"][1]["fc1"]["kernel"]),
        np.asarray(converted["decoder"]["layers"][1]["fc1"]["kernel"]),
        rtol=0, atol=0,
    )
    # and seeded the trainable model (one tiny Adam step away from converted)
    diff = np.abs(
        np.asarray(state["params"]["model"]["decoder"]["layers"][1]["fc1"]["kernel"])
        - np.asarray(converted["decoder"]["layers"][1]["fc1"]["kernel"])
    )
    assert diff.max() < 1e-2  # moved by at most ~lr-scale, not re-initialized

    # 5. decode from the saved checkpoint (the converted weights feed the
    # beam search through the normal user path)
    gen_out = str(tmp_path / "gen.json")
    rc = cli_main([
        "generate", "--ckpt-dir", ckpt_dir,
        "--data-dict", os.path.join(
            data_dir, "GoodNews", "test_dict_newsmep_ent_clip8sent_contras_name_pos.json"
        ),
        "--vocab", vocab, "--merges", merges,
        "--out", gen_out,
    ])
    assert rc == 0
    with open(gen_out) as f:
        gen = json.load(f)
    assert any(k not in ("bleu", "other metrics") for k in gen)


def _tiny_openai_clip_sd(width=32, layers=1, heads=4, image_size=32,
                         patch_size=16, seed=3):
    """OpenAI-format `visual.*` state dict with random (i.e. 'tuned') values."""
    g = torch.Generator().manual_seed(seed)
    grid = (image_size // patch_size) ** 2

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    sd = {
        "visual.conv1.weight": r(width, 3, patch_size, patch_size),
        "visual.class_embedding": r(width),
        "visual.positional_embedding": r(grid + 1, width),
        "visual.ln_pre.weight": torch.ones(width), "visual.ln_pre.bias": r(width),
        "visual.ln_post.weight": torch.ones(width), "visual.ln_post.bias": r(width),
        "visual.proj": r(width, 16),
    }
    for i in range(layers):
        pre = f"visual.transformer.resblocks.{i}"
        sd |= {
            f"{pre}.attn.in_proj_weight": r(3 * width, width),
            f"{pre}.attn.in_proj_bias": r(3 * width),
            f"{pre}.attn.out_proj.weight": r(width, width),
            f"{pre}.attn.out_proj.bias": r(width),
            f"{pre}.ln_1.weight": torch.ones(width), f"{pre}.ln_1.bias": r(width),
            f"{pre}.ln_2.weight": torch.ones(width), f"{pre}.ln_2.bias": r(width),
            f"{pre}.mlp.c_fc.weight": r(4 * width, width),
            f"{pre}.mlp.c_fc.bias": r(4 * width),
            f"{pre}.mlp.c_proj.weight": r(width, 4 * width),
            f"{pre}.mlp.c_proj.bias": r(width),
        }
    return sd


def test_clip_ckpt_flag_loads_tuned_weights(tmp_path):
    """--clip-ckpt accepts a perturbed ('fine-tuned') OpenAI .pt and the
    values land in the vision tower (reference --trained_clip)."""
    from vacnic_tpu.cli import _load_clip_vision_ckpt
    from vacnic_tpu.core.config import ClipVisionConfig

    vcfg = ClipVisionConfig.tiny(layers=1)
    sd = _tiny_openai_clip_sd()
    # perturb one tensor to a recognizable value (a tuned checkpoint differs
    # from stock — the loader must carry the exact tuned values through)
    sd["visual.transformer.resblocks.0.mlp.c_fc.bias"] += 0.5
    pt_path = str(tmp_path / "CLIPNAME.pt")
    torch.save(sd, pt_path)

    tree = _load_clip_vision_ckpt(pt_path, vcfg)
    got = np.asarray(tree["layers"][0]["mlp"]["c_fc"]["bias"])
    want = sd["visual.transformer.resblocks.0.mlp.c_fc.bias"].numpy()
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-7)
    assert np.asarray(tree["conv1"]["kernel"]).shape == (16, 16, 3, 32)

    # the .npz path (converted tree) round-trips identically
    cc = _load_script("convert_checkpoint")
    npz_path = str(tmp_path / "clip.npz")
    cc.save_tree({"vision": tree}, npz_path)
    tree2 = _load_clip_vision_ckpt(npz_path, vcfg)
    np.testing.assert_allclose(
        np.asarray(tree2["layers"][0]["mlp"]["c_fc"]["bias"]), want, atol=1e-7)


def _tiny_openai_text_sd(width=32, layers=1, vocab=64, ctx=16, seed=5):
    """OpenAI-format text-tower keys (`transformer.resblocks.*` + embeddings)."""
    g = torch.Generator().manual_seed(seed)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    sd = {
        "token_embedding.weight": r(vocab, width),
        "positional_embedding": r(ctx, width),
        "ln_final.weight": torch.ones(width), "ln_final.bias": r(width),
        "text_projection": r(width, 16),
        "logit_scale": torch.tensor(2.6593),
    }
    for i in range(layers):
        pre = f"transformer.resblocks.{i}"
        sd |= {
            f"{pre}.attn.in_proj_weight": r(3 * width, width),
            f"{pre}.attn.in_proj_bias": r(3 * width),
            f"{pre}.attn.out_proj.weight": r(width, width),
            f"{pre}.attn.out_proj.bias": r(width),
            f"{pre}.ln_1.weight": torch.ones(width), f"{pre}.ln_1.bias": r(width),
            f"{pre}.ln_2.weight": torch.ones(width), f"{pre}.ln_2.bias": r(width),
            f"{pre}.mlp.c_fc.weight": r(4 * width, width),
            f"{pre}.mlp.c_fc.bias": r(4 * width),
            f"{pre}.mlp.c_proj.weight": r(width, 4 * width),
            f"{pre}.mlp.c_proj.bias": r(width),
        }
    return sd


def test_retrieve_ckpt_loader_formats(tmp_path):
    """`cli retrieve --clip-ckpt` loading: a full OpenAI .pt yields both
    towers; a vision-only .pt exits with a clear message (not a KeyError
    deep in the converter); the converted .npz tree loads as-is."""
    from vacnic_tpu.cli import _load_clip_retrieval_ckpt
    from vacnic_tpu.core.config import ClipVisionConfig

    vcfg = ClipVisionConfig.tiny(layers=1)

    # full OpenAI checkpoint (vision + text towers in one sd)
    sd = _tiny_openai_clip_sd() | _tiny_openai_text_sd()
    pt = str(tmp_path / "clip_full.pt")
    torch.save(sd, pt)
    params = _load_clip_retrieval_ckpt(pt, vcfg, text_layers=1, text_heads=4)
    assert set(params) >= {"vision", "text"}
    np.testing.assert_allclose(
        np.asarray(params["text"]["token_embedding"]["weight"]),
        sd["token_embedding.weight"].numpy(), atol=1e-7)

    # vision-only checkpoint: clear SystemExit, not a converter KeyError
    pt_v = str(tmp_path / "clip_vis.pt")
    torch.save(_tiny_openai_clip_sd(), pt_v)
    with pytest.raises(SystemExit, match="no text tower"):
        _load_clip_retrieval_ckpt(pt_v, vcfg, text_layers=1, text_heads=4)

    # converted .npz tree passes through untouched
    cc = _load_script("convert_checkpoint")
    npz = str(tmp_path / "clip_full.npz")
    cc.save_tree({"vision": params["vision"], "text": params["text"]}, npz)
    params2 = _load_clip_retrieval_ckpt(npz, vcfg)
    np.testing.assert_allclose(
        np.asarray(params2["text"]["token_embedding"]["weight"]),
        sd["token_embedding.weight"].numpy(), atol=1e-7)
