"""Full-stack CLI integration: on-disk dataset + real BPE vocab → train →
generate from checkpoint → evaluate. This is the closest thing to a user
running the framework end to end."""

import json
import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

from vacnic_tpu.cli import main as cli_main
from vacnic_tpu.data.tokenize import _bytes_to_unicode

WORDS = ["the", "press", "photo", "shows", "alice", "smith", "waving", "in",
         "paris", "today", "crowd", "gathered"]


def _write_vocab(d):
    b2u = _bytes_to_unicode()
    base = ["<s>", "<pad>", "</s>", "<unk>"]
    chars = sorted(set(b2u.values()))
    merges, extra, seen = [], [], set(chars)
    for w in WORDS:
        for seq in ([b2u[b] for b in w.encode()], [b2u[b] for b in (" " + w).encode()]):
            cur = list(seq)
            while len(cur) > 1:
                merges.append(f"{cur[0]} {cur[1]}")
                cur = [cur[0] + cur[1]] + cur[2:]
                if cur[0] not in seen:
                    extra.append(cur[0])
                    seen.add(cur[0])
    vocab = {t: i for i, t in enumerate(base + chars + extra)}
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n" + "\n".join(dict.fromkeys(merges)))
    return str(d / "vocab.json"), str(d / "merges.txt"), len(vocab)


def _write_dataset(root):
    base = root / "GoodNews" / "goodnews"
    for sub in ("images_processed", "faces"):
        os.makedirs(base / sub, exist_ok=True)
    rng = np.random.RandomState(0)
    dd = {}
    for i in range(6):
        h = f"h{i}"
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            base / "images_processed" / f"{h}.jpg"
        )
        if i % 2 == 0:
            np.save(base / "faces" / f"{h}.npy", rng.randn(2, 8).astype(np.float32))
        dd[h] = {
            "caption": f"alice smith waving in paris {WORDS[i]}",
            "names": ["alice smith"] if i % 2 == 0 else [],
            "org_norp": [], "gpe_loc": ["paris"],
            "names_art": ["alice smith"], "org_norp_art": [], "gpe_loc_art": ["paris"],
            "sents_byclip": f"the press photo shows alice smith in paris {WORDS[i]}.",
            "face_emb_dir": [f"faces/{h}.npy"] if i % 2 == 0 else [],
            "obj_emb_dir": [],
            "name_pos_cap": [[1, 2]],
        }
    for split in ("train", "val", "test"):
        with open(root / "GoodNews" / f"{split}_dict_newsmep_ent_clip8sent_contras_name_pos.json", "w") as f:
            json.dump(dd, f)
    return str(root)


def test_cli_train_generate_evaluate(tmp_path, capsys):
    vocab, merges, vocab_size = _write_vocab(tmp_path)
    data_dir = _write_dataset(tmp_path)
    out_dir = str(tmp_path / "out")
    model_vocab = vocab_size + 8  # room for the 5 added special tokens

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
        "--max-steps", "3",
    ] + common)
    assert rc == 0
    assert os.path.exists(os.path.join(out_dir, "test_captions.json"))
    with open(os.path.join(out_dir, "test_captions.json")) as f:
        caps = json.load(f)
    assert "bleu" in caps and "other metrics" in caps
    train_out = capsys.readouterr().out
    assert "bleu1" in train_out

    # generate from the saved checkpoint
    gen_out = str(tmp_path / "gen.json")
    rc = cli_main([
        "generate",
        "--ckpt-dir", os.path.join(out_dir, "best"),
        "--data-dict", os.path.join(
            data_dir, "GoodNews", "test_dict_newsmep_ent_clip8sent_contras_name_pos.json"
        ),
        "--vocab", vocab, "--merges", merges,
        "--out", gen_out,
    ])
    assert rc == 0
    with open(gen_out) as f:
        gen = json.load(f)
    sample = [v for k, v in gen.items() if k not in ("bleu", "other metrics")][0]
    assert set(sample) == {"gt", "gen"}
    assert "alice" in sample["gt"]

    # evaluate the generated captions
    rc = cli_main(["evaluate", "--results", gen_out, "--out", str(tmp_path / "report.json")])
    assert rc == 0
    with open(tmp_path / "report.json") as f:
        report = json.load(f)
    assert "entities" in report and report["entities"]["ner_engine"] == "heuristic"


def test_cli_main_honors_env_platform(monkeypatch):
    """cli.main must re-assert JAX_PLATFORMS into jax.config before doing any
    work: the TPU image's sitecustomize overrides jax_platforms via
    jax.config at interpreter start, so without this `JAX_PLATFORMS=cpu
    python -m vacnic_tpu.cli smoke` silently ran against the tunneled TPU
    (minutes of remote compile for a tiny self-check)."""
    import jax

    calls = []
    real_update = jax.config.update

    def spy(name, value):
        calls.append((name, value))
        real_update(name, value)

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setattr(jax.config, "update", spy)
    with pytest.raises(SystemExit):  # bad subcommand — parse happens AFTER
        cli_main(["no-such-command"])
    assert ("jax_platforms", "cpu") in calls
