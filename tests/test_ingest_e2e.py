"""Real-archive dress rehearsal (round-3 VERDICT missing #3).

Builds miniature raw fixtures STRUCTURE-IDENTICAL to the real archives —
a `rico_dataset_v0.1_semantic_annotations.zip` with nested semantic
annotation JSONs (`rico.py:83-173` schema) and COCO `train.json`/`val.json`
(`publaynet.py:28-116` schema) — then drives the full production path:

    ingest (schema probe + parse + npz + report/checksums)
      -> train 2 epochs  ->  sample cond=c  ->  eval

so the one seam no synthetic test crossed (raw archive bytes -> processed
splits -> training) is exercised end-to-end.  FID parity on the REAL
archives still needs the real data (no-egress environment), but every code
path those archives will take runs here.
"""

import glob
import json
import os
import pickle
import zipfile

import numpy as np
import pytest

from layoutdm_tpu.registry import DATASET_LABELS

RICO_ZIP = "rico_dataset_v0.1_semantic_annotations.zip"


def _rico_screen(rng, labels, n_elems, W=1440, H=2560, nest=False):
    """One semantic-annotation JSON: root bounds + recursive children."""
    children = []
    for _ in range(n_elems):
        x1 = int(rng.randint(0, W - 100))
        y1 = int(rng.randint(0, H - 100))
        x2 = int(x1 + rng.randint(50, W - x1))
        y2 = int(y1 + rng.randint(50, H - y1))
        children.append({
            "componentLabel": labels[rng.randint(0, len(labels))],
            "bounds": [x1, y1, x2, y2],
            "children": [],
        })
    if nest and children:
        # exercise the recursive flattening (`rico.py:71-76`)
        inner = dict(children[-1])
        children[-1] = {
            "componentLabel": labels[0],
            "bounds": children[-1]["bounds"],
            "children": [inner],
        }
    # an element the validity filter must drop: out-of-canvas bounds
    children.append({
        "componentLabel": labels[0],
        "bounds": [-10, 0, 50, 50],
        "children": [],
    })
    # and one with a label outside the taxonomy
    children.append({
        "componentLabel": "NotARealLabel",
        "bounds": [0, 0, 100, 100],
        "children": [],
    })
    return {"bounds": [0, 0, W, H], "children": children}


def _write_rico_fixture(raw_dir, n_screens=40, max_elems=4, seed=0):
    rng = np.random.RandomState(seed)
    labels = DATASET_LABELS["rico25"]
    os.makedirs(raw_dir, exist_ok=True)
    path = os.path.join(raw_dir, RICO_ZIP)
    with zipfile.ZipFile(path, "w") as z:
        for i in range(n_screens):
            ann = _rico_screen(
                rng, labels, int(rng.randint(1, max_elems + 1)),
                nest=(i % 5 == 0),
            )
            z.writestr(f"semantic_annotations/{i}.json", json.dumps(ann))
        # screens the parser must SKIP: landscape, overfull, nonzero origin
        z.writestr(
            "semantic_annotations/landscape.json",
            json.dumps(_rico_screen(rng, labels, 2, W=2560, H=1440)),
        )
        big = _rico_screen(rng, labels, max_elems + 10)
        z.writestr("semantic_annotations/overfull.json", json.dumps(big))
        shifted = _rico_screen(rng, labels, 2)
        shifted["bounds"] = [10, 0, 1440, 2560]
        z.writestr("semantic_annotations/shifted.json", json.dumps(shifted))
    return path


def _write_coco_fixture(raw_dir, n_pages=30, max_elems=4, seed=0):
    rng = np.random.RandomState(seed)
    labels = DATASET_LABELS["publaynet"]
    cats = [{"id": i + 1, "name": n} for i, n in enumerate(labels)]
    os.makedirs(raw_dir, exist_ok=True)

    def one_file(path, n, offset):
        images, anns = [], []
        aid = 1
        for i in range(n):
            img_id = offset + i
            W, H = 612.0, 792.0
            images.append({
                "id": img_id, "width": W, "height": H,
                "file_name": f"page_{img_id}.jpg",
            })
            for _ in range(int(rng.randint(1, max_elems + 1))):
                x = float(rng.uniform(0, W - 60))
                y = float(rng.uniform(0, H - 60))
                w = float(rng.uniform(20, W - x))
                h = float(rng.uniform(20, H - y))
                anns.append({
                    "id": aid, "image_id": img_id,
                    "category_id": int(rng.randint(1, len(labels) + 1)),
                    "bbox": [x, y, w, h],
                })
                aid += 1
            # an annotation the filter must drop (degenerate box)
            anns.append({
                "id": aid, "image_id": img_id,
                "category_id": 1, "bbox": [10.0, 10.0, 0.0, 5.0],
            })
            aid += 1
        # a landscape page the parser must skip
        images.append({
            "id": offset + n, "width": 792.0, "height": 612.0,
            "file_name": "landscape.jpg",
        })
        anns.append({
            "id": aid, "image_id": offset + n, "category_id": 1,
            "bbox": [1.0, 1.0, 50.0, 50.0],
        })
        with open(path, "w") as f:
            json.dump(
                {"images": images, "annotations": anns, "categories": cats},
                f,
            )

    one_file(os.path.join(raw_dir, "train.json"), n_pages, 0)
    one_file(os.path.join(raw_dir, "val.json"), max(n_pages // 5, 2), 1000)


@pytest.fixture(scope="module")
def rico_data_dir(tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("datasets"))
    _write_rico_fixture(
        os.path.join(data_dir, "rico25-max4", "raw"), n_screens=40
    )
    return data_dir


def test_ingest_rico_report(rico_data_dir, capsys):
    """`python -m layoutdm_tpu.data.ingest rico25` on the fixture archive:
    schema probe passes, all three splits are parsed/written with the
    reference's 85/5/10 seeded split, and the report carries checksums."""
    from layoutdm_tpu.data.ingest import main as ingest_main

    rc = ingest_main(
        ["rico25", "--data_dir", rico_data_dir, "--max_seq_length", "4"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "raw ok:" in out and "sha" in out
    assert "bbox in [0,1]: True" in out

    proc = os.path.join(rico_data_dir, "rico25-max4", "processed")
    sizes = {}
    for s in ("train", "val", "test"):
        path = os.path.join(proc, f"{s}.npz")
        assert os.path.exists(path)
        z = np.load(path)
        sizes[s] = z["label"].shape[0]
        if sizes[s]:
            assert z["bbox"][z["mask"]].min() >= 0
            assert z["bbox"][z["mask"]].max() <= 1
            assert z["label"].max() < len(DATASET_LABELS["rico25"])
    # landscape/overfull/shifted screens skipped; the nest wrapper can push
    # a full screen past max_seq_length, so compare against the parser's
    # own count rather than a hardcoded total
    from layoutdm_tpu.data.datasets import parse_rico

    parsed = parse_rico(
        os.path.join(rico_data_dir, "rico25-max4", "raw", RICO_ZIP),
        DATASET_LABELS["rico25"], 4,
    )
    N = len(parsed)
    total = sum(sizes.values())
    assert total == N and N >= 30, (sizes, N)
    # the reference's 85/5/10 seeded split (`rico.py:160-173`)
    assert sizes["train"] == int(N * 0.85)
    assert sizes["val"] == int(N * 0.90) - int(N * 0.85)
    assert sizes["test"] == N - int(N * 0.90)
    assert sizes["val"] >= 1 and sizes["test"] >= 2


def test_ingest_publaynet_report(tmp_path, capsys):
    from layoutdm_tpu.data.ingest import main as ingest_main

    data_dir = str(tmp_path / "datasets")
    _write_coco_fixture(os.path.join(data_dir, "publaynet-max4", "raw"))
    rc = ingest_main(
        ["publaynet", "--data_dir", data_dir, "--max_seq_length", "4"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "raw ok:" in out and "images" in out

    proc = os.path.join(data_dir, "publaynet-max4", "processed")
    train = np.load(os.path.join(proc, "train.npz"))
    test = np.load(os.path.join(proc, "test.npz"))
    # official val becomes the test split (`publaynet.py:105-116`);
    # landscape page skipped -> 6 val pages
    assert test["label"].shape[0] == 6
    assert train["label"].shape[0] == 28  # 95% of 30 train pages
    assert train["bbox"][train["mask"]].max() <= 1


def test_ingest_missing_archive_fails_loudly(tmp_path, capsys):
    from layoutdm_tpu.data.ingest import main as ingest_main

    data_dir = str(tmp_path / "empty")
    os.makedirs(os.path.join(data_dir, "rico25-max4", "raw"))
    with pytest.raises(SystemExit):
        ingest_main(["rico25", "--data_dir", data_dir,
                     "--max_seq_length", "4"])
    assert "missing raw file" in capsys.readouterr().out


def test_rico_archive_to_eval_pipeline(rico_data_dir, tmp_path, capsys):
    """The full dress rehearsal: the ingested fixture archive feeds
    train -> sample (cond=c) -> eval exactly as real Rico would."""
    from layoutdm_tpu.configs import build_train_config
    from layoutdm_tpu.eval_cli import main as eval_main
    from layoutdm_tpu.sample_cli import main as sample_main
    from layoutdm_tpu.train.loop import train

    job_dir = str(tmp_path / "job")
    cfg = build_train_config(
        "layoutdm",
        "rico25",
        [
            f"job_dir={job_dir}",
            f"dataset.dir={rico_data_dir}",
            "debug=true",
            "dataset.max_seq_length=4",
            "data.batch_size=8",
            "backbone.d_model=128",
            "backbone.nhead=4",
            "backbone.dim_feedforward=64",
            "backbone.num_layers=1",
            "model.num_timesteps=4",
            "backbone.diffusion_step=4",
        ],
    )
    cfg.data.bbox_quantization = "linear"  # no kmeans fit in CI
    result = train(cfg)
    assert np.isfinite(result["best_val_loss"])

    result_dir = str(tmp_path / "results")
    sample_main(
        [
            f"job_dir={job_dir}",
            f"result_dir={result_dir}",
            "cond=c",
            "num_timesteps=4",
            "max_batch_size=4",
        ]
    )
    pkls = glob.glob(os.path.join(result_dir, "c_*.pkl"))
    assert len(pkls) == 1
    with open(pkls[0], "rb") as f:
        res = pickle.load(f)
    assert len(res["results"]) >= 1
    for bbox, label in res["results"]:
        assert bbox.shape[1] == 4 and label.max() < 25

    eval_main([result_dir])
    out = capsys.readouterr().out
    assert "maximum_iou" in out
