"""Builders wiring configs -> tokenizer -> model (the hydra-instantiate
replacement).  Mirrors the assembly in `main.py:79-97` / `test.py:105-118`."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from layoutdm_tpu.configs import TrainConfig
from layoutdm_tpu.data.datasets import LayoutData, load_dataset
from layoutdm_tpu.tokenizer.bbox import BboxTokenizer, load_kmeans_centers
from layoutdm_tpu.tokenizer.clustering import fit_coordinate_clusters
from layoutdm_tpu.tokenizer.sequence import LayoutSequenceTokenizer


def resolve_centers(
    cfg: TrainConfig, train_data: Optional[LayoutData] = None
) -> Optional[np.ndarray]:
    """Find or fit per-coordinate cluster centers (kmeans/percentile).

    Search order: cached npz -> reference-style pickle -> fit from train
    split (and cache).  Mirrors the weight path scheme
    `{dataset}_max{S}_{method}_train_clusters.pkl` (`bbox_tokenizer.py:54-55`).
    """
    method = cfg.data.bbox_quantization
    if method == "linear":
        return None
    base = os.path.join(
        os.path.dirname(cfg.dataset.dir.rstrip("/")), "clustering_weights"
    )
    stem = f"{cfg.dataset.name}_max{cfg.dataset.max_seq_length}_{method}_train_clusters"
    nb = cfg.data.num_bin_bboxes
    for ext in (".npz", ".pkl"):
        path = os.path.join(base, stem + ext)
        if os.path.exists(path):
            return load_kmeans_centers(path, nb)

    if train_data is None:
        train_data = load_dataset(
            cfg.dataset.name, cfg.dataset.dir, "train",
            cfg.dataset.max_seq_length,
        )
    boxes = train_data.bbox[train_data.mask]
    fitted = fit_coordinate_clusters(boxes, (nb,), method)
    centers = np.stack([fitted[f"{k}-{nb}"] for k in ("x", "y", "w", "h")])
    os.makedirs(base, exist_ok=True)
    np.savez(
        os.path.join(base, stem + ".npz"),
        **{f"{k}-{nb}": centers[i] for i, k in enumerate(("x", "y", "w", "h"))},
    )
    return centers


def build_tokenizer(
    cfg: TrainConfig, train_data: Optional[LayoutData] = None
) -> LayoutSequenceTokenizer:
    centers = resolve_centers(cfg, train_data)
    var_order = tuple(cfg.data.var_order.split("-")[1:])
    bb = BboxTokenizer(
        num_bins=cfg.data.num_bin_bboxes,
        var_order=var_order,
        shared_vocab=cfg.data.shared_bbox_vocab,
        quantization=cfg.data.bbox_quantization,
        centers=centers,
    )
    return LayoutSequenceTokenizer(
        bbox_tokenizer=bb,
        num_categories=cfg.dataset.num_categories,
        max_elements=cfg.dataset.max_seq_length,
        special_tokens=tuple(cfg.data.special_tokens),
        pad_until_max=cfg.data.pad_until_max,
    )


def build_model(cfg: TrainConfig, tokenizer=None, train_data=None):
    import jax.numpy as jnp

    if tokenizer is None:
        tokenizer = build_tokenizer(cfg, train_data)
    name = cfg.model.name
    dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32
    if name == "layoutdm":
        from layoutdm_tpu.models.layoutdm import LayoutDM

        return LayoutDM(cfg.backbone, tokenizer, cfg.model, dtype=dtype)
    if name == "maskgit":
        from layoutdm_tpu.models.maskgit import MaskGIT

        return MaskGIT(cfg.backbone, tokenizer, cfg.model, dtype=dtype)
    if name == "blt":
        from layoutdm_tpu.models.blt import BLT

        return BLT(cfg.backbone, tokenizer, cfg.model, dtype=dtype)
    if name in ("autoreg", "elem_wise_autoreg"):
        from layoutdm_tpu.models.autoreg import ElemWiseAutoreg

        return ElemWiseAutoreg(cfg.backbone, tokenizer, cfg.model, dtype=dtype)
    if name == "ruite":
        from layoutdm_tpu.models.ruite import RUITE

        return RUITE(cfg.backbone, tokenizer, cfg.model, dtype=dtype)
    if name == "bart":
        from layoutdm_tpu.models.bart import BART

        return BART(cfg.backbone, tokenizer, cfg.model, dtype=dtype)
    if name in ("diffusionlm", "bitdiffusion"):
        from layoutdm_tpu.models.continuous.models import (
            LayoutContinuousDiffusion,
        )

        return LayoutContinuousDiffusion(
            cfg.backbone, tokenizer, cfg.model, dtype=dtype
        )
    raise KeyError(name)
