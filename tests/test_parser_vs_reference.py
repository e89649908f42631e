"""Parser cross-validation: run the REFERENCE'S OWN dataset `process()`
(`datasets/rico.py:83-173`, `datasets/publaynet.py:28-116`, imported
unmodified) on fixture archives and byte-compare its split outputs with
ours (round-1 VERDICT, next-round item 4)."""

import json
import os
import zipfile

import numpy as np
import pytest
import torch

from layoutdm_tpu.data.datasets import load_dataset
from layoutdm_tpu.registry import PUBLAYNET_LABELS, RICO25_LABELS

from tests import ref_shim

ref_shim.install_stubs()

import trainer.datasets.publaynet as ref_publaynet  # noqa: E402
import trainer.datasets.rico as ref_rico  # noqa: E402


def _drive(cls, raw_dir, processed_paths, max_seq_length):
    """Instantiate a reference dataset class with its heavyweight
    InMemoryDataset machinery bypassed: plain raw/processed paths and an
    identity collate, so `process()` runs the genuine parsing/filtering/
    split logic and dumps raw lists."""

    class Drive(cls):
        def __init__(self):
            self._rd, self._pp = raw_dir, processed_paths
            self.max_seq_length = max_seq_length

        @property
        def raw_dir(self):
            return self._rd

        @property
        def processed_paths(self):
            return self._pp

        def collate(self, data_list):
            return data_list

    return Drive()


def _load_ref_split(path):
    out, names = [], []
    for d in torch.load(path, weights_only=False):
        out.append((d.x.numpy(), d.y.numpy()))
        names.append(d.attr["name"])
    return out, names


def _compare_split(ref_layouts, mine, ref_names=None):
    assert len(ref_layouts) == len(mine), (len(ref_layouts), len(mine))
    for i, (rb, rl) in enumerate(ref_layouts):
        n = len(rl)
        m = np.asarray(mine.mask[i])
        assert m.sum() == n
        np.testing.assert_array_equal(np.asarray(mine.label[i])[:n], rl)
        np.testing.assert_allclose(
            np.asarray(mine.bbox[i])[:n], rb, atol=1e-7, rtol=0
        )
        if ref_names is not None:
            # source-name provenance matches the reference's attr["name"]
            assert str(mine.names[i]) == str(ref_names[i])


# ---------------------------------------------------------------------------
# fixtures with the edge cases that distinguish filter-vs-drop semantics
# ---------------------------------------------------------------------------


def make_rico_fixture(path, n_screens=40, seed=0):
    rng = np.random.RandomState(seed)
    with zipfile.ZipFile(path, "w") as z:
        for i in range(n_screens):
            W, H = 1440, 2560
            children = []
            for _ in range(rng.randint(1, 8)):
                x1, y1 = rng.randint(0, 1000, 2)
                w, h = rng.randint(50, 400, 2)
                child = {
                    "componentLabel": RICO25_LABELS[rng.randint(0, 25)],
                    "bounds": [int(x1), int(y1), int(x1 + w), int(y1 + h)],
                }
                # nested children (recursive flattening, `rico.py:71-76`)
                if rng.rand() < 0.3:
                    child["children"] = [
                        {
                            "componentLabel": RICO25_LABELS[
                                rng.randint(0, 25)
                            ],
                            "bounds": [10, 10, 200, 300],
                        }
                    ]
                children.append(child)
            # invalid elements that must be FILTERED, page kept:
            children.append(
                {"componentLabel": "NotALabel", "bounds": [0, 0, 10, 10]}
            )
            children.append(
                {"componentLabel": "Text", "bounds": [-5, 0, 10, 10]}
            )
            children.append(
                {"componentLabel": "Icon", "bounds": [50, 50, 50, 90]}
            )  # zero width
            ann = {"bounds": [0, 0, W, H], "children": children}
            z.writestr(f"{i}.json", json.dumps(ann))
        # pages dropped entirely: landscape, nonzero origin, too many elems
        z.writestr(
            "landscape.json",
            json.dumps({"bounds": [0, 0, 2560, 1440], "children": []}),
        )
        z.writestr(
            "offset.json",
            json.dumps({"bounds": [10, 0, 1440, 2560], "children": []}),
        )
        big = {
            "bounds": [0, 0, 1440, 2560],
            "children": [
                {"componentLabel": "Text", "bounds": [0, 0, 100, 100]}
                for _ in range(30)
            ],
        }
        z.writestr("toobig.json", json.dumps(big))


def make_publaynet_fixture(dirpath, n_train=30, n_val=8, seed=0):
    rng = np.random.RandomState(seed)

    def one(n_images, start_id):
        cats = [
            {"id": i + 1, "name": name}
            for i, name in enumerate(PUBLAYNET_LABELS)
        ]
        images, anns = [], []
        aid = start_id * 1000
        for i in range(n_images):
            img_id = start_id + i
            if i == 0:
                images.append(
                    {"id": img_id, "width": 800, "height": 600,
                     "file_name": f"land{img_id}.jpg"}
                )  # landscape -> dropped
                continue
            W, H = 612, 792
            images.append(
                {"id": img_id, "width": W, "height": H,
                 "file_name": f"p{img_id}.jpg"}
            )
            for _ in range(rng.randint(1, 6)):
                x1, y1 = rng.randint(0, 400, 2)
                w, h = rng.randint(20, 200, 2)
                aid += 1
                anns.append(
                    {
                        "id": aid,
                        "image_id": img_id,
                        "category_id": int(rng.randint(1, 6)),
                        "bbox": [float(x1), float(y1), float(w), float(h)],
                    }
                )
            # an invalid annotation: filtered, page kept
            aid += 1
            anns.append(
                {
                    "id": aid,
                    "image_id": img_id,
                    "category_id": 1,
                    "bbox": [-3.0, 5.0, 50.0, 50.0],
                }
            )
        return {"categories": cats, "images": images, "annotations": anns}

    os.makedirs(os.path.join(dirpath, "publaynet"), exist_ok=True)
    with open(os.path.join(dirpath, "publaynet", "train.json"), "w") as f:
        json.dump(one(n_train, 0), f)
    with open(os.path.join(dirpath, "publaynet", "val.json"), "w") as f:
        json.dump(one(n_val, 10000), f)


# ---------------------------------------------------------------------------


def test_rico_parser_matches_reference(tmp_path):
    raw_dir = tmp_path / "datasets" / "rico25-max25" / "raw"
    os.makedirs(raw_dir)
    make_rico_fixture(
        str(raw_dir / "rico_dataset_v0.1_semantic_annotations.zip")
    )

    ref_out = [str(tmp_path / f"ref_{s}.pt") for s in ("train", "val", "test")]
    ds = _drive(ref_rico.Rico25Dataset, str(raw_dir), ref_out, 25)
    ds.process()

    data_dir = str(tmp_path / "datasets")
    for i, split in enumerate(("train", "val", "test")):
        ref_layouts, ref_names = _load_ref_split(ref_out[i])
        mine = load_dataset("rico25", data_dir, split, 25)
        _compare_split(ref_layouts, mine, ref_names)


def test_publaynet_parser_matches_reference(tmp_path):
    raw_dir = tmp_path / "datasets" / "publaynet-max25" / "raw"
    os.makedirs(raw_dir)
    make_publaynet_fixture(str(raw_dir))
    # our loader reads train.json/val.json at the raw root
    for s in ("train", "val"):
        os.rename(
            os.path.join(str(raw_dir), "publaynet", f"{s}.json"),
            os.path.join(str(raw_dir), f"{s}.json"),
        )
        os.makedirs(os.path.join(str(raw_dir), "publaynet"), exist_ok=True)
        # reference reads from raw_dir/publaynet/
        os.link(
            os.path.join(str(raw_dir), f"{s}.json"),
            os.path.join(str(raw_dir), "publaynet", f"{s}.json"),
        )

    ref_out = [str(tmp_path / f"ref_{s}.pt") for s in ("train", "val", "test")]
    ds = _drive(ref_publaynet.PubLayNetDataset, str(raw_dir), ref_out, 25)
    ds.process()

    data_dir = str(tmp_path / "datasets")
    for i, split in enumerate(("train", "val", "test")):
        ref_layouts, ref_names = _load_ref_split(ref_out[i])
        mine = load_dataset("publaynet", data_dir, split, 25)
        _compare_split(ref_layouts, mine, ref_names)


def test_ingest_cli_smoke(tmp_path, capsys):
    """One-command ingest: schema probe + split report + checksums."""
    from layoutdm_tpu.data.ingest import main as ingest_main

    raw_dir = tmp_path / "datasets" / "rico25-max25" / "raw"
    os.makedirs(raw_dir)
    make_rico_fixture(
        str(raw_dir / "rico_dataset_v0.1_semantic_annotations.zip")
    )
    rc = ingest_main(
        ["rico25", "--data_dir", str(tmp_path / "datasets")]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "raw ok:" in out and "train:" in out and "total:" in out
    assert "sha" in out


def test_ingest_cli_missing_raw(tmp_path, capsys):
    from layoutdm_tpu.data.ingest import main as ingest_main

    os.makedirs(tmp_path / "datasets" / "rico25-max25" / "raw")
    with pytest.raises(SystemExit):
        ingest_main(["rico25", "--data_dir", str(tmp_path / "datasets")])
    assert "missing raw file" in capsys.readouterr().out
