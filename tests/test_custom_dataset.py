"""Custom-dataset extension path, end-to-end (docs/custom_dataset.md).

The reference documents a subclass-and-edit recipe
(`/root/reference/docs/custom_dataset.md:1-40`); our counterpart is
`registry.register_dataset` + `dataset.register_module`.  This test is the
executable version of the doc: a THIRD toy dataset (not rico/publaynet/
synthetic) defined entirely in a temp-dir module goes through
register -> ingest CLI -> train -> sample -> eval without touching any
core file.
"""

import glob
import json
import os
import pickle
import textwrap

import numpy as np
import pytest


TOY_MODULE = textwrap.dedent(
    '''
    """Toy custom dataset: three-label synthetic posters."""
    import json, os
    import numpy as np
    from layoutdm_tpu.registry import register_dataset


    def parse(raw_dir, max_seq_length):
        with open(os.path.join(raw_dir, "layouts.json")) as f:
            raw = json.load(f)
        out = []
        for item in raw:
            bbox = np.asarray(item["bbox"], np.float32)
            label = np.asarray(item["label"], np.int32)
            if 0 < len(label) <= max_seq_length:
                out.append((bbox, label, item.get("name", "")))
        return out


    register_dataset(
        "toyposters",
        labels=("header", "body", "image"),
        canvas=(400, 600),
        parser=parse,
    )
    '''
)


def _write_raw(raw_dir: str, n: int = 96, max_elements: int = 4) -> None:
    rng = np.random.RandomState(7)
    os.makedirs(raw_dir, exist_ok=True)
    items = []
    for i in range(n):
        k = rng.randint(1, max_elements + 1)
        label = rng.randint(0, 3, size=k)
        bbox = np.stack(
            [
                np.clip(0.5 + 0.1 * rng.randn(k), 0.1, 0.9),
                np.sort(rng.rand(k)).clip(0.05, 0.95),
                np.clip(0.2 + 0.2 * label, 0.05, 0.95),
                np.clip(0.05 + 0.05 * label, 0.02, 0.5),
            ],
            axis=1,
        )
        items.append(
            {
                "bbox": bbox.tolist(),
                "label": label.tolist(),
                "name": f"poster_{i}",
            }
        )
    # one invalid layout the parser must skip (0 elements)
    items.append({"bbox": [], "label": [], "name": "empty"})
    with open(os.path.join(raw_dir, "layouts.json"), "w") as f:
        json.dump(items, f)


@pytest.fixture(scope="module")
def toy_env(tmp_path_factory):
    base = tmp_path_factory.mktemp("custom_ds")
    mod_path = str(base / "toy_dataset.py")
    with open(mod_path, "w") as f:
        f.write(TOY_MODULE)
    data_dir = str(base / "datasets")
    _write_raw(os.path.join(data_dir, "toyposters-max4", "raw"))
    return {"module": mod_path, "data_dir": data_dir, "base": str(base)}


def test_register_and_ingest_cli(toy_env):
    from layoutdm_tpu.data.ingest import main as ingest_main

    rc = ingest_main(
        [
            "toyposters",
            "--data_dir",
            toy_env["data_dir"],
            "--max_seq_length",
            "4",
            "--register_module",
            toy_env["module"],
        ]
    )
    assert rc == 0
    proc = os.path.join(toy_env["data_dir"], "toyposters-max4", "processed")
    for split in ("train", "val", "test"):
        z = np.load(os.path.join(proc, f"{split}.npz"))
        assert z["bbox"].shape[1:] == (4, 4)
        assert z["label"].max() < 3
    # flat-list parser output -> the reference's 85/5/10 split
    n_train = len(np.load(os.path.join(proc, "train.npz"))["mask"])
    n_val = len(np.load(os.path.join(proc, "val.npz"))["mask"])
    n_test = len(np.load(os.path.join(proc, "test.npz"))["mask"])
    total = n_train + n_val + n_test
    assert total == 96  # the empty layout was skipped
    assert n_train == int(total * 0.85)


def test_unknown_dataset_message():
    from layoutdm_tpu.data.datasets import load_dataset

    with pytest.raises(KeyError, match="register_dataset"):
        load_dataset("nosuchdata", "/tmp/nowhere", "train", 4)


def test_register_guards():
    from layoutdm_tpu.registry import DATASET_LABELS, register_dataset

    with pytest.raises(ValueError, match="already registered"):
        register_dataset("rico25", labels=("a", "b"))
    with pytest.raises(ValueError, match="reserved"):
        register_dataset("synthetic", labels=("a",))
    # same-labels re-registration is an idempotent no-op
    register_dataset("rico25", labels=DATASET_LABELS["rico25"])


@pytest.fixture(scope="module")
def toy_job(toy_env, tmp_path_factory):
    """Train on the custom dataset through the standard config surface —
    `dataset.register_module` is the only custom-dataset-specific knob."""
    from layoutdm_tpu.configs import build_train_config
    from layoutdm_tpu.train.loop import train

    job_dir = str(tmp_path_factory.mktemp("toy_job"))
    cfg = build_train_config(
        "layoutdm",
        "toyposters",
        [
            f"dataset.register_module={toy_env['module']}",
            f"dataset.dir={toy_env['data_dir']}",
            f"job_dir={job_dir}",
            "debug=true",
            "dataset.max_seq_length=4",
            "data.batch_size=16",
            "backbone.d_model=128",
            "backbone.nhead=4",
            "backbone.dim_feedforward=64",
            "backbone.num_layers=1",
            "model.num_timesteps=4",
            "backbone.diffusion_step=4",
        ],
    )
    cfg.data.bbox_quantization = "linear"
    assert cfg.dataset.num_categories == 3  # from the registration
    result = train(cfg)
    assert np.isfinite(result["best_val_loss"])
    return job_dir


def test_custom_train_sample_eval(toy_job, tmp_path, capsys):
    """sample + eval reload the persisted config; `register_module` rides
    in config.json so the registration is re-imported automatically."""
    from layoutdm_tpu.eval_cli import main as eval_main
    from layoutdm_tpu.sample_cli import main as sample_main

    with open(os.path.join(toy_job, "config.json")) as f:
        persisted = json.load(f)
    assert persisted["dataset"]["name"] == "toyposters"
    assert persisted["dataset"]["register_module"].endswith("toy_dataset.py")

    result_dir = str(tmp_path / "results")
    sample_main(
        [
            f"job_dir={toy_job}",
            f"result_dir={result_dir}",
            "cond=c",
            "num_timesteps=4",
            "max_batch_size=8",
            "debug_num_samples=8",
        ]
    )
    pkls = glob.glob(os.path.join(result_dir, "c_*.pkl"))
    assert len(pkls) == 1
    with open(pkls[0], "rb") as f:
        res = pickle.load(f)
    assert len(res["results"]) >= 8
    for bbox, label in res["results"]:
        assert label.max(initial=0) < 3

    eval_main([result_dir])
    outp = capsys.readouterr().out
    assert "maximum_iou" in outp
