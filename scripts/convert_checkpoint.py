#!/usr/bin/env python
"""Convert pretrained checkpoints to vacnic_tpu param trees (.npz).

Sources:
  * HF BART (`patrickvonplaten/bart-large-fp32` directory with
    model.safetensors / pytorch_model.bin) → text BART tree (CoLaM teacher /
    init), with vocab resized 50265→50267 (<ENT>, <NONAME>;
    train...match.py:753).
  * OpenAI CLIP state dict (ViT-B/16 .pt) → vision (+ text) towers.
  * A reference VACNIC pickled checkpoint (`torch.save(model)`,
    train...match.py:467) → the full multimodal tree.

Usage:
  python scripts/convert_checkpoint.py bart /path/to/bart-large out_bart.npz
  python scripts/convert_checkpoint.py clip /path/to/ViT-B-16.pt out_clip.npz
  python scripts/convert_checkpoint.py vacnic /path/to/model.pt out_mm.npz
"""

from __future__ import annotations

import sys

import numpy as np


def flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif isinstance(tree, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        return {prefix.rstrip("/"): np.asarray(tree)}
    for k, v in items:
        out.update(flatten(v, f"{prefix}{k}/"))
    return out


def unflatten(flat: dict):
    tree: dict = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return _listify(tree)


def _listify(node):
    if isinstance(node, dict):
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return tuple(_listify(node[str(i)]) for i in range(len(keys)))
        return {k: _listify(v) for k, v in node.items()}
    return node


def save_tree(tree, path: str):
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in flatten(tree).items()})


def load_tree(path: str):
    with np.load(path) as z:
        return unflatten({k: z[k] for k in z.files})


def main() -> int:
    from vacnic_tpu.core.config import BartConfig, ClipVisionConfig, FusionConfig
    from vacnic_tpu.models import weights_io as W

    kind, src, dst = sys.argv[1], sys.argv[2], sys.argv[3]
    sd = W.load_state_dict(src)
    if kind == "bart":
        cfg = BartConfig(vocab_size=50265)
        params = W.convert_bart(sd, cfg)
        params = W.resize_vocab(params, 50267)
    elif kind == "clip":
        params = {
            "vision": W.convert_clip_vision_openai(sd, ClipVisionConfig()),
        }
        try:
            from vacnic_tpu.models.clip_text import convert_clip_text_openai

            params["text"] = convert_clip_text_openai(sd)
        except KeyError:
            pass
    elif kind == "vacnic":
        params = W.convert_multimodal_bart(sd, BartConfig(), FusionConfig())
    else:
        raise SystemExit(f"unknown kind {kind}")
    save_tree(params, dst)
    print(f"wrote {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
