"""End-to-end CLI pipeline: train -> sample (tasks) -> eval -> render."""

import glob
import os
import pickle

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained_job(tmp_path_factory):
    from layoutdm_tpu.configs import build_train_config
    from layoutdm_tpu.train.loop import train

    job_dir = str(tmp_path_factory.mktemp("job"))
    cfg = build_train_config(
        "layoutdm",
        "synthetic",
        [
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
    # synthetic uses linear quantization (no kmeans fit in CI)
    cfg.data.bbox_quantization = "linear"
    result = train(cfg)
    assert np.isfinite(result["best_val_loss"])
    return job_dir


def test_train_writes_artifacts(trained_job):
    assert os.path.exists(os.path.join(trained_job, "config.json"))
    assert os.path.exists(os.path.join(trained_job, "best_model.msgpack"))
    assert os.path.exists(os.path.join(trained_job, "final_model.msgpack"))
    assert os.path.exists(os.path.join(trained_job, "last_state.msgpack"))
    assert os.path.exists(os.path.join(trained_job, "metrics.jsonl"))


@pytest.mark.parametrize("cond", ["unconditional", "c", "cwh", "partial",
                                  "refinement", "relation"])
def test_sample_cli_all_tasks(trained_job, tmp_path, cond):
    from layoutdm_tpu.sample_cli import main as sample_main

    result_dir = str(tmp_path / "results")
    sample_main(
        [
            f"job_dir={trained_job}",
            f"result_dir={result_dir}",
            f"cond={cond}",
            "num_timesteps=4",
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
    assert res["ms_per_sample"] > 0
    for bbox, label in res["results"]:
        assert bbox.shape[1] == 4 and bbox.shape[0] == label.shape[0]
    if cond == "relation":
        assert "violation_rate" in res


def test_eval_and_render_cli(trained_job, tmp_path, capsys):
    from layoutdm_tpu.eval_cli import main as eval_main
    from layoutdm_tpu.render_cli import main as render_main
    from layoutdm_tpu.sample_cli import main as sample_main

    result_dir = str(tmp_path / "results")
    sample_main(
        [
            f"job_dir={trained_job}",
            f"result_dir={result_dir}",
            "cond=c",
            "num_timesteps=4",
            "max_batch_size=16",
            "debug_num_samples=16",
        ]
    )
    eval_main([result_dir])
    outp = capsys.readouterr().out
    assert "alignment-LayoutGAN++" in outp
    assert "maximum_iou" in outp

    pkl = glob.glob(os.path.join(result_dir, "*.pkl"))[0]
    render_main([pkl, "--num_samples", "8"])
    out_dir = os.path.splitext(pkl)[0] + "_render"
    assert os.path.exists(os.path.join(out_dir, "generated.png"))
    assert os.path.exists(os.path.join(out_dir, "scores.csv"))


def test_train_resume(tmp_path):
    """Interrupted training resumes from the checkpointed epoch."""
    import json

    from layoutdm_tpu.configs import build_train_config
    from layoutdm_tpu.train.loop import train

    job_dir = str(tmp_path / "resume_job")
    overrides = [
        f"job_dir={job_dir}",
        "dataset.max_seq_length=4",
        "data.batch_size=32",
        "data.bbox_quantization=linear",
        "backbone.d_model=128",
        "backbone.nhead=4",
        "backbone.dim_feedforward=64",
        "backbone.num_layers=1",
        "model.num_timesteps=4",
        "backbone.diffusion_step=4",
        "training.sample_plot_epoch_interval=0",
        "training.epochs=2",
    ]
    cfg = build_train_config("layoutdm", "synthetic", overrides)
    train(cfg)
    rows = [
        json.loads(l)
        for l in open(os.path.join(job_dir, "metrics.jsonl"))
        if "val_loss" in l
    ]
    assert [r["epoch"] for r in rows] == [0, 1]

    cfg2 = build_train_config("layoutdm", "synthetic", overrides)
    cfg2.training.epochs = 4
    train(cfg2)
    rows = [
        json.loads(l)
        for l in open(os.path.join(job_dir, "metrics.jsonl"))
        if "val_loss" in l
    ]
    # epochs 2,3 appended — 0,1 were NOT retrained
    assert [r["epoch"] for r in rows] == [0, 1, 2, 3]


def test_resume_restores_scheduler_lr(tmp_path):
    """Preemption resume continues the DECAYED learning rate — no silent
    warm restart at base LR."""
    import json

    from layoutdm_tpu.configs import build_train_config
    from layoutdm_tpu.train.loop import train

    job_dir = str(tmp_path / "job")
    args = [f"job_dir={job_dir}", "seed=0"]
    cfg = build_train_config("layoutdm", "synthetic", args)
    cfg.dataset.max_seq_length = 4
    cfg.backbone.d_model = 64  # shrinks 29/32 -> 58, divisible by nhead
    cfg.backbone.nhead = 2
    cfg.backbone.dim_feedforward = 32
    cfg.backbone.num_layers = 1
    cfg.model.num_timesteps = 4
    cfg.backbone.diffusion_step = 4
    cfg.training.epochs = 3
    cfg.training.sample_plot_epoch_interval = 0
    cfg.data.batch_size = 64
    cfg.scheduler.patience = 0  # decay aggressively so lr moves
    cfg.scheduler.threshold = 0.9  # nearly always "no improvement"
    train(cfg)
    with open(f"{job_dir}/resume.json") as f:
        meta = json.load(f)
    assert meta["scheduler"]["lr"] < cfg.optimizer.lr  # decay happened

    # run 2 more epochs from the checkpoint; first logged lr must continue
    # from the decayed value, not restart at base
    cfg.training.epochs = 5
    train(cfg)
    rows = [
        json.loads(l)
        for l in open(f"{job_dir}/metrics.jsonl")
        if "lr" in json.loads(l)
    ]
    resumed = [r for r in rows if r["epoch"] == 3][0]
    assert resumed["lr"] <= meta["scheduler"]["lr"]


def test_build_sampling_config_merges_train_defaults():
    """Sampling knobs left at their TestConfig default inherit the train
    job's saved sampling config (so `layoutdm_relation_strong`'s lambda
    reaches sample time); explicit test-side overrides always win."""
    from layoutdm_tpu.configs import (
        TestConfig,
        build_sampling_config,
        build_train_config,
    )

    strong = build_train_config("layoutdm_relation_strong", "synthetic", [])

    # untouched test args -> inherit the preset's operating point
    s = build_sampling_config(TestConfig(cond="relation"), strong)
    assert s.relation_lambda == 1e7

    # explicit CLI override beats the preset
    s = build_sampling_config(
        TestConfig(cond="relation", relation_lambda=5e5), strong
    )
    assert s.relation_lambda == 5e5

    # no train config -> pure test args
    s = build_sampling_config(TestConfig(top_k=7))
    assert s.top_k == 7 and s.relation_lambda == 3e6

    # num_timesteps always comes from the test args
    s = build_sampling_config(TestConfig(num_timesteps=25), strong)
    assert s.num_timesteps == 25


def test_demo_untrained_smoke(tmp_path):
    """`notebooks/demo.py --untrained` — the §3.4 product-API parity target
    (reference `notebooks/demo.ipynb`) — runs end-to-end and writes every
    artifact: GT round-trip, unconditional, 4 conditional tasks, GIF."""
    import subprocess
    import sys

    out = str(tmp_path / "demo")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "notebooks", "demo.py"),
            "--untrained",
            "--out_dir", out,
            "--num_samples", "2",
            "backbone.d_model=64", "backbone.nhead=2",
            "backbone.dim_feedforward=32", "backbone.num_layers=1",
            "model.num_timesteps=4", "backbone.diffusion_step=4",
        ],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    for name in (
        "gt_roundtrip.png", "unconditional.png", "c.png", "cwh.png",
        "partial.png", "refinement.png", "diffusion.gif",
    ):
        assert os.path.exists(os.path.join(out, name)), name
