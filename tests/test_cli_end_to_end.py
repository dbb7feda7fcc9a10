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


def test_prune_to_structure():
    """Watcher restore normalization (ADVICE r4 #2): extra checkpoint
    subtrees are dropped, lists are coerced to the served tuple containers,
    and a checkpoint MISSING a served subtree fails loudly."""
    from vacnic_tpu.cli import _prune_to_structure

    served = {"model": {"layers": ({"w": 1}, {"w": 2}), "emb": 3}, "clip": 4}
    ckpt = {"model": {"layers": [{"w": 10, "junk": 0}, {"w": 20}],
                      "emb": 30, "clip_text": {"tower": 9}},
            "clip": 40, "extra": 5}
    out = _prune_to_structure(ckpt, served)
    assert out == {"model": {"layers": ({"w": 10}, {"w": 20}), "emb": 30},
                   "clip": 40}
    assert isinstance(out["model"]["layers"], tuple)
    with pytest.raises(KeyError):
        _prune_to_structure({"model": {}}, served)
    with pytest.raises(ValueError, match="length"):
        _prune_to_structure(
            {"model": {"layers": [{"w": 1}], "emb": 3}, "clip": 4}, served)


def test_restore_watch_params_raw_roundtrip(tmp_path):
    """_restore_watch_params: template-free orbax restore of the requested
    step, pruned to the served structure — no train-state template, no
    device-side init work (ADVICE r4 #1)."""
    import numpy as np

    from vacnic_tpu.cli import _restore_watch_params
    from vacnic_tpu.train.checkpoints import CheckpointManager

    state = {"params": {"model": {"layers": [{"w": np.ones((2, 2))},
                                             {"w": np.full((2, 2), 2.0)}]},
                        "clip": {"p": np.zeros(3)},
                        "clip_text": {"tower": np.zeros(1)}},
             "opt": {"mu": np.zeros(4)}, "step": np.int32(7)}
    ckpt_dir = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(7, state)
    mgr.wait()
    mgr.close()

    served = {"model": {"layers": ({"w": np.zeros((2, 2))},
                                   {"w": np.zeros((2, 2))})},
              "clip": {"p": np.zeros(3)}}
    got = _restore_watch_params(ckpt_dir, 7, served)
    assert set(got) == {"model", "clip"}  # clip_text pruned
    assert isinstance(got["model"]["layers"], tuple)
    np.testing.assert_allclose(got["model"]["layers"][1]["w"],
                               np.full((2, 2), 2.0))
    with pytest.raises(Exception):
        _restore_watch_params(ckpt_dir, 99, served)  # no such step
