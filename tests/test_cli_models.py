"""Train->sample CLI pipeline across model families (tiny/debug)."""

import glob
import os
import pickle

import numpy as np
import pytest


@pytest.mark.parametrize("experiment,cond", [
    ("maskgit", "c"),
    ("autoreg", "unconditional"),
    ("diffusionlm", "unconditional"),
])
def test_train_and_sample_family(tmp_path, experiment, cond):
    from layoutdm_tpu.configs import build_train_config
    from layoutdm_tpu.sample_cli import main as sample_main
    from layoutdm_tpu.train.loop import train

    job_dir = str(tmp_path / experiment)
    cfg = build_train_config(
        experiment,
        "synthetic",
        [
            f"job_dir={job_dir}",
            "debug=true",
            "dataset.max_seq_length=4",
            "data.batch_size=16",
            "data.bbox_quantization=linear",
            "backbone.d_model=128",
            "backbone.nhead=4",
            "backbone.dim_feedforward=64",
            "backbone.num_layers=1",
            "model.num_timesteps=4",
            "backbone.diffusion_step=4",
            "training.sample_plot_epoch_interval=0",
        ],
    )
    result = train(cfg)
    assert np.isfinite(result["best_val_loss"])

    result_dir = str(tmp_path / "results")
    sample_main(
        [
            f"job_dir={job_dir}",
            f"result_dir={result_dir}",
            f"cond={cond}",
            "num_timesteps=4" if experiment != "autoreg" else "num_timesteps=20",
            "num_uncond_samples=8",
            "max_batch_size=8",
            "debug_num_samples=8",
        ]
    )
    pkls = glob.glob(os.path.join(result_dir, f"{cond}_*.pkl"))
    assert len(pkls) == 1
    with open(pkls[0], "rb") as f:
        res = pickle.load(f)
    assert len(res["results"]) >= 8


def test_multiseed_sweep_and_discovery(tmp_path):
    from layoutdm_tpu.sample_cli import resolve_seed_dirs
    from layoutdm_tpu.train.loop import main as train_main

    job_dir = str(tmp_path / "sweep")
    train_main(
        [
            "layoutdm",
            "synthetic",
            f"job_dir={job_dir}",
            "seed=0,1",
            "debug=true",
            "dataset.max_seq_length=4",
            "data.batch_size=16",
            "data.bbox_quantization=linear",
            "backbone.d_model=128",
            "backbone.nhead=4",
            "backbone.dim_feedforward=64",
            "backbone.num_layers=1",
            "model.num_timesteps=4",
            "backbone.diffusion_step=4",
            "training.sample_plot_epoch_interval=0",
        ]
    )
    dirs = resolve_seed_dirs(job_dir)
    assert len(dirs) == 2
    assert all(os.path.exists(os.path.join(d, "best_model.msgpack"))
               for d in dirs)
