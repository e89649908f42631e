"""Raw-data parsers exercised against synthetic fixtures that match the
Rico semantic-annotation and PubLayNet COCO schemas."""

import json
import os
import zipfile

import numpy as np
import pytest

from layoutdm_tpu.data.datasets import (
    load_dataset,
    parse_publaynet,
    parse_rico,
)
from layoutdm_tpu.registry import PUBLAYNET_LABELS, RICO25_LABELS


def make_rico_zip(path, n_screens=20, seed=0):
    rng = np.random.RandomState(seed)
    with zipfile.ZipFile(path, "w") as z:
        for i in range(n_screens):
            W, H = 1440, 2560
            k = rng.randint(1, 6)
            children = []
            for _ in range(k):
                x1, y1 = rng.randint(0, 1000, 2)
                w, h = rng.randint(50, 400, 2)
                children.append(
                    {
                        "componentLabel": RICO25_LABELS[rng.randint(0, 25)],
                        "bounds": [int(x1), int(y1), int(x1 + w), int(y1 + h)],
                    }
                )
            # one invalid child that must be filtered
            children.append(
                {"componentLabel": "NotALabel", "bounds": [0, 0, 10, 10]}
            )
            ann = {"bounds": [0, 0, W, H], "children": children}
            z.writestr(f"{i}.json", json.dumps(ann))
        # a landscape screen that must be dropped entirely
        z.writestr(
            "landscape.json",
            json.dumps({"bounds": [0, 0, 2560, 1440], "children": []}),
        )


def test_parse_rico(tmp_path):
    zpath = str(tmp_path / "rico_dataset_v0.1_semantic_annotations.zip")
    make_rico_zip(zpath)
    layouts = parse_rico(zpath, RICO25_LABELS, max_seq_length=25)
    assert len(layouts) == 20  # landscape dropped; invalid children filtered
    for bbox, label, _name in layouts:
        assert bbox.shape[1] == 4
        assert (bbox >= 0).all() and (bbox <= 1).all()
        assert (label >= 0).all() and (label < 25).all()
        # center-xywh: w,h strictly positive
        assert (bbox[:, 2:] > 0).all()


def make_coco_json(path, n_images=12, seed=0):
    rng = np.random.RandomState(seed)
    cats = [
        {"id": i + 1, "name": name} for i, name in enumerate(PUBLAYNET_LABELS)
    ]
    images, anns = [], []
    aid = 0
    for i in range(n_images):
        W, H = 612, 792
        images.append({"id": i, "width": W, "height": H})
        for _ in range(rng.randint(1, 5)):
            x1, y1 = rng.randint(0, 400, 2)
            w, h = rng.randint(20, 200, 2)
            aid += 1
            anns.append(
                {
                    "id": aid,
                    "image_id": i,
                    "category_id": int(rng.randint(1, 6)),
                    "bbox": [float(x1), float(y1), float(w), float(h)],
                }
            )
    with open(path, "w") as f:
        json.dump({"categories": cats, "images": images, "annotations": anns}, f)


def test_parse_publaynet(tmp_path):
    path = str(tmp_path / "train.json")
    make_coco_json(path)
    layouts = parse_publaynet(path, PUBLAYNET_LABELS, max_seq_length=25)
    assert len(layouts) == 12
    for bbox, label, _name in layouts:
        assert (bbox >= 0).all() and (bbox <= 1).all()
        assert (label >= 0).all() and (label < 5).all()


def test_load_dataset_rico_end_to_end(tmp_path):
    """Raw zip -> processed npz with the 85/5/10 seeded split
    (`rico.py:160-173`), then cache-hit reload."""
    base = tmp_path / "datasets" / "rico25-max25" / "raw"
    os.makedirs(base)
    make_rico_zip(
        str(base / "rico_dataset_v0.1_semantic_annotations.zip"),
        n_screens=40,
    )
    data_dir = str(tmp_path / "datasets")
    train = load_dataset("rico25", data_dir, "train", 25)
    val = load_dataset("rico25", data_dir, "val", 25)
    test = load_dataset("rico25", data_dir, "test", 25)
    assert len(train) == int(40 * 0.85)
    assert len(val) == int(40 * 0.90) - int(40 * 0.85)
    assert len(train) + len(val) + len(test) == 40
    assert train.bbox.shape[1:] == (25, 4)
    # processed cache exists and reloads identically
    train2 = load_dataset("rico25", data_dir, "train", 25)
    np.testing.assert_array_equal(train.bbox, train2.bbox)
