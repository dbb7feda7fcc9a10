"""On-disk dataset fixture: exercise NewsCaptionDataset end-to-end from real
files (jpg + npy + txt + dict JSON), covering retrieval on/off, missing faces,
missing NER-mask artifacts, and the raw LMM mode."""

import json
import os

import numpy as np
import pytest

from vacnic_tpu.data.collate import collate
from vacnic_tpu.data.datasets import NewsCaptionDataset
from vacnic_tpu.data.tokenize import HashWordTokenizer

PIL = pytest.importorskip("PIL")
from PIL import Image


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("goodnews")
    for sub in ("images_processed", "faces", "objects", "articles_full",
                "articles_full_newsmep_ent_by_count"):
        os.makedirs(root / sub, exist_ok=True)

    rng = np.random.RandomState(0)
    data_dict = {}
    for i, (has_face, names) in enumerate([(True, ["Alice Smith"]), (False, [])]):
        h = f"hash{i}"
        Image.fromarray(rng.randint(0, 255, (224, 224, 3), np.uint8)).save(
            root / "images_processed" / f"{h}.jpg"
        )
        if has_face:
            np.save(root / "faces" / f"{h}.npy", rng.randn(2, 512).astype(np.float32))
        (root / "articles_full" / f"{h}.txt").write_text(
            f"Article {i} text about Alice Smith and the world."
        )
        with open(root / "articles_full_newsmep_ent_by_count" / f"{h}.json", "w") as f:
            json.dump({"input_ids": [0, 50267, 50267, 5, 2]}, f)
        data_dict[h] = {
            "caption": f"Alice Smith in photo {i} — café",
            "names": names,
            "org_norp": [], "gpe_loc": ["Paris"],
            "names_art": ["Alice Smith"], "org_norp_art": [], "gpe_loc_art": ["Paris"],
            "sents_byclip": f"Retrieved sentence {i} about Alice Smith.",
            "face_emb_dir": [f"faces/{h}.npy"] if has_face else [],
            "obj_emb_dir": [],
            "name_pos_cap": [[1, 2]],
        }
    return str(root), data_dict


@pytest.fixture(scope="module")
def tok():
    t = HashWordTokenizer(50265)
    t.add_special_tokens(["<ENT>", "<NONAME>", "<PERSON>", "<ORGNORP>", "<GPELOC>"])
    return t


def test_dataset_retrieved(data_root, tok):
    root, dd = data_root
    ds = NewsCaptionDataset(dd, root, tok, dataset="goodnews", retrieved_sent=True,
                            max_article_len=32, max_ner_type_len=12, max_ner_type_len_gt=6)
    s0 = ds[0]
    assert s0["pixels"].shape == (224, 224, 3)
    assert s0["face_emb"].shape == (2, 512)
    assert len(s0["names_art_ids"]) == 12
    assert s0["person_id_positions"] == [[1, 2]]
    # caption unidecoded: no non-ascii survives
    assert all(ord(c) < 128 for c in s0["caption"])
    s1 = ds[1]
    assert s1["face_emb"].shape == (0, 512)  # no faces

    batch = collate([s0, s1], article_len=32, caption_len=16, ner_len=12,
                    ner_len_gt=6, max_faces=4, num_names=3, name_len=5)
    assert batch["article_ids"].shape == (2, 32)
    np.testing.assert_array_equal(batch["face_emb"][1], np.ones((4, 512)))


def test_dataset_full_article(data_root, tok):
    root, dd = data_root
    ds = NewsCaptionDataset(dd, root, tok, dataset="goodnews", retrieved_sent=False,
                            max_article_len=32)
    s = ds[0]
    assert "Article 0" in s["article"]


def test_dataset_nytimes_key_spellings(data_root, tok):
    """NYTimes dicts spell the entity keys name_art/name_cap/org_norp_cap/
    gpe_loc_cap (nytimes...py:636-641); the unified reader must not silently
    drop those entities (regression: names_art previously read as [] for
    every NYTimes record)."""
    root, dd = data_root
    dd_nyt = {}
    for h, rec in dd.items():
        r = dict(rec)
        r["name_cap"] = r.pop("names")
        r["org_norp_cap"] = r.pop("org_norp")
        r["gpe_loc_cap"] = r.pop("gpe_loc")
        r["name_art"] = r.pop("names_art")
        dd_nyt[h] = r
    kw = dict(retrieved_sent=True, max_article_len=32, max_ner_type_len=12,
              max_ner_type_len_gt=6)
    ds_g = NewsCaptionDataset(dd, root, tok, dataset="goodnews", **kw)
    ds_n = NewsCaptionDataset(dd_nyt, root, tok, dataset="nytimes", **kw)
    for i in range(2):
        sg, sn = ds_g[i], ds_n[i]
        assert sn["names"] == sg["names"]
        assert sn["all_gt_ner"] == sg["all_gt_ner"]
        np.testing.assert_array_equal(sn["names_art_ids"], sg["names_art_ids"])
        np.testing.assert_array_equal(
            sn["org_norp_gpe_loc_art_ids"], sg["org_norp_gpe_loc_art_ids"])
        np.testing.assert_array_equal(
            sn["names_ids_flatten"], sg["names_ids_flatten"])
    # the aliased record must actually contain real (non-<NONAME>) entities
    assert not np.array_equal(
        ds_n[0]["names_art_ids"],
        NewsCaptionDataset({h: {**r, "name_art": []} for h, r in dd_nyt.items()},
                           root, tok, dataset="nytimes", **kw)[0]["names_art_ids"])


def test_dataset_raw_mode(data_root, tok):
    root, dd = data_root
    ds = NewsCaptionDataset(dd, root, None, dataset="goodnews", retrieved_sent=True,
                            raw_mode=True)
    s = ds[0]
    assert set(s) == {"article", "caption", "raw_img"}
    assert s["raw_img"].size == (224, 224)
