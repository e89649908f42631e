"""Factory: kmeans auto-fit + cache, model construction per family."""

import os

import numpy as np
import pytest

from layoutdm_tpu.configs import build_train_config
from layoutdm_tpu.factory import build_model, build_tokenizer, resolve_centers


def test_kmeans_autofit_and_cache(tmp_path):
    cfg = build_train_config(
        "layoutdm", "synthetic",
        [f"dataset.dir={tmp_path}/datasets", "dataset.max_seq_length=4"],
    )
    assert cfg.data.bbox_quantization == "kmeans"
    centers = resolve_centers(cfg)
    assert centers.shape == (4, 32)
    assert (np.diff(centers, axis=1) >= 0).all()  # sorted
    cache = os.path.join(
        str(tmp_path), "clustering_weights",
        "synthetic_max4_kmeans_train_clusters.npz",
    )
    assert os.path.exists(cache)
    # second call loads the cache (identical values)
    centers2 = resolve_centers(cfg)
    np.testing.assert_allclose(centers, centers2)


@pytest.mark.parametrize("experiment", [
    "layoutdm", "vqdiffusion", "maskgit", "blt", "autoreg", "ruite",
    "diffusionlm", "bitdiffusion",
])
def test_build_model_all_experiments(tmp_path, experiment):
    cfg = build_train_config(
        experiment, "synthetic",
        [
            f"dataset.dir={tmp_path}/d", "dataset.max_seq_length=4",
            "data.bbox_quantization=linear",
            "backbone.d_model=128", "backbone.nhead=4",
            "backbone.dim_feedforward=64", "backbone.num_layers=1",
            "model.num_timesteps=4", "backbone.diffusion_step=4",
        ],
    )
    model = build_model(cfg)
    assert model.tokenizer.N_total > 0


def test_build_bart(tmp_path):
    cfg = build_train_config(
        "bart", "synthetic",
        [
            f"dataset.dir={tmp_path}/d", "dataset.max_seq_length=4",
            "data.bbox_quantization=linear",
            "backbone.d_model=128", "backbone.nhead=4",
            "backbone.dim_feedforward=64", "backbone.num_layers=1",
        ],
    )
    model = build_model(cfg)
    assert model.tokenizer.var_names == ("c", "w", "h", "x", "y")
