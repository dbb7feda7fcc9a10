"""Input-pipeline feed benchmark (VERDICT r1 #8): prove the loader can feed
the chip at the measured train rate.

Generates ~2k GoodNews-format samples on disk (224x224 JPEGs, ~400-word
articles from a 20k-word zipf vocabulary, FaceNet-like .npy files), builds a
realistic byte-BPE vocab (full merge chains for the frequent words + byte
fallback), and runs the REAL NewsCaptionDataset -> collate -> PrefetchLoader
stack end to end, reporting samples/sec.

Pass/fail context: the measured train step is 49.1 samples/sec/chip at batch
32 (CLAUDE.md); the pipeline must sustain >= 2x that so the TPU never starves
(reference equivalent: DataLoader(num_workers=16), SURVEY §3.1 boundary #2).

Usage: python scripts/bench_pipeline.py [--samples 2048] [--workers N]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# This measures HOST-side pipeline throughput: force the CPU backend so
# device_put lands in host RAM, not across the 25 MB/s TPU tunnel (the
# sitecustomize overrides JAX_PLATFORMS — must re-force after import).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from vacnic_tpu.data.collate import collate  # noqa: E402
from vacnic_tpu.data.datasets import NewsCaptionDataset  # noqa: E402
from vacnic_tpu.data.pipeline import PrefetchLoader  # noqa: E402
from vacnic_tpu.data.tokenize import BartBpeTokenizer, _bytes_to_unicode  # noqa: E402

TRAIN_RATE = 49.1  # measured samples/sec/chip at batch 32 (CLAUDE.md)


def make_words(rng, n=20000):
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    return ["".join(rng.choice(letters, rng.randint(3, 11))) for _ in range(n)]


def write_vocab(words, path):
    """Byte-BPE vocab with full merge chains for the top words (with and
    without leading space) — representative merge-table size (~50k)."""
    b2u = _bytes_to_unicode()
    base = ["<s>", "<pad>", "</s>", "<unk>"]
    chars = sorted(set(b2u.values()))
    merges, extra, seen = [], [], set(chars)
    for w in words:
        for seq in ([b2u[b] for b in w.encode()], [b2u[b] for b in (" " + w).encode()]):
            cur = list(seq)
            while len(cur) > 1:
                merges.append(f"{cur[0]} {cur[1]}")
                cur = [cur[0] + cur[1]] + cur[2:]
                if cur[0] not in seen:
                    extra.append(cur[0])
                    seen.add(cur[0])
    vocab = {t: i for i, t in enumerate(base + chars + extra)}
    with open(os.path.join(path, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(path, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n" + "\n".join(dict.fromkeys(merges)))
    return len(vocab), len(set(merges))


def build_corpus(root, n_samples, rng):
    from PIL import Image

    base = os.path.join(root, "GoodNews", "goodnews")
    for sub in ("images_processed", "faces", "articles_full"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    words = make_words(rng)
    # zipf-distributed word choice: heavy head (cache-friendly) + long tail
    # (cache-miss BPE work), like real news text
    zipf_p = 1.0 / np.arange(1, len(words) + 1)
    zipf_p /= zipf_p.sum()

    dd = {}
    for i in range(n_samples):
        h = f"s{i:05d}"
        img = rng.randint(0, 255, (224, 224, 3), np.uint8)
        Image.fromarray(img).save(os.path.join(base, "images_processed", f"{h}.jpg"),
                                  quality=85)
        art_words = [words[j] for j in rng.choice(len(words), 400, p=zipf_p)]
        article = " ".join(art_words)
        with open(os.path.join(base, "articles_full", f"{h}.txt"), "w") as f:
            f.write(article)
        has_face = i % 2 == 0
        if has_face:
            np.save(os.path.join(base, "faces", f"{h}.npy"),
                    rng.randn(rng.randint(1, 5), 512).astype(np.float32))
        name = f"{art_words[0]} {art_words[1]}"
        dd[h] = {
            "caption": " ".join(art_words[:12]),
            "names": [name] if has_face else [],
            "org_norp": [], "gpe_loc": [art_words[2]],
            "names_art": [name], "org_norp_art": [], "gpe_loc_art": [art_words[2]],
            "sents_byclip": " ".join(art_words[:80]),
            "face_emb_dir": [f"faces/{h}.npy"] if has_face else [],
            "obj_emb_dir": [],
            "name_pos_cap": [[0, 2]],
        }
    dict_path = os.path.join(root, "GoodNews", "dict.json")
    with open(dict_path, "w") as f:
        json.dump(dd, f)
    return base, dict_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=2048)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--retrieved", action="store_true",
                    help="use sents_byclip (80 words) instead of full articles")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    root = tempfile.mkdtemp(prefix="vacnic_pipe_bench_")
    try:
        t0 = time.time()
        base, dict_path = build_corpus(root, args.samples, rng)
        nv, nm = write_vocab(make_words(np.random.RandomState(1), 4000), root)
        print(f"corpus: {args.samples} samples, vocab {nv} / merges {nm} "
              f"({time.time()-t0:.1f}s to generate)", file=sys.stderr)

        tok = BartBpeTokenizer(os.path.join(root, "vocab.json"),
                               os.path.join(root, "merges.txt"))
        tok.add_special_tokens(["<ENT>", "<NONAME>", "<PERSON>", "<ORGNORP>", "<GPELOC>"])
        with open(dict_path) as f:
            dd = json.load(f)
        ds = NewsCaptionDataset(dd, base, tok, dataset="goodnews",
                                retrieved_sent=args.retrieved, train=True,
                                max_article_len=512)
        loader = PrefetchLoader(
            ds, args.batch_size,
            lambda s: collate(s, article_len=512, caption_len=100, ner_len=80,
                              ner_len_gt=20, max_faces=4, face_dim=512,
                              noname_id=tok.added_tokens["<NONAME>"]),
            shuffle=True, num_workers=args.workers, drop_last=True)

        # one warm epoch fills the tokenizer word cache the way a real run's
        # first epoch does; measure the steady state on the second epoch
        for ep in range(2):
            n, t0 = 0, time.perf_counter()
            for batch in loader:
                n += batch["article_ids"].shape[0]
            dt = time.perf_counter() - t0
            rate = n / dt
            label = "warm" if ep == 0 else "steady"
            print(f"{label}: {n} samples in {dt:.2f}s -> {rate:.1f} samples/sec "
                  f"({rate/TRAIN_RATE:.1f}x the {TRAIN_RATE} samples/sec train step)")
        print(json.dumps({"metric": "pipeline samples/sec", "value": round(rate, 1),
                          "unit": "samples/sec",
                          "vs_train_step": round(rate / TRAIN_RATE, 2)}))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
