"""Mask utilities — static-shape JAX versions of `helpers/mask.py` and
`helpers/util.py:25-64`."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sequence_mask(length: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """(B,) lengths -> (B, maxlen) bool (`helpers/mask.py:10-18`)."""
    return jnp.arange(maxlen)[None, :] < length[:, None]


def batch_topk_mask(
    scores: jnp.ndarray,
    topk: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
):
    """Row-wise mask of the top-k scores (`helpers/util.py:25-47`).

    Mirrors the reference semantics (the k-th largest valid score is the
    exclusive threshold, so exactly ``topk`` entries are True for distinct
    scores) and additionally handles ``topk >= #valid``, where the
    reference's gather would be out of bounds: all valid entries are
    selected instead of silently dropping one.
    """
    if mask is not None:
        scores = jnp.where(mask, scores, -jnp.inf)
    S = scores.shape[-1]
    n_valid = (
        mask.sum(axis=1) if mask is not None else jnp.full(scores.shape[0], S)
    )
    sorted_desc = jnp.sort(scores, axis=-1)[:, ::-1]
    idx = jnp.clip(topk[:, None], 0, S - 1)  # OOB gather fills NaN in jax
    kth = jnp.take_along_axis(sorted_desc, idx, axis=1)
    select_all = (topk >= n_valid)[:, None]
    out = jnp.where(
        select_all, jnp.isfinite(scores), scores > kth
    )
    return out, kth


def sample_mask(rng: jax.Array, mask: jnp.ndarray, ratio: jnp.ndarray) -> jnp.ndarray:
    """Bernoulli-ish subset of ``mask`` with per-row rate (`mask.py:21-33`)."""
    if jnp.ndim(ratio) == 0:
        ratio = jnp.full((mask.shape[0],), ratio)
    scores = jax.random.uniform(rng, mask.shape)
    n_elem = mask.sum(axis=1)
    topk = (ratio * n_elem).astype(jnp.int32)
    sampled, _ = batch_topk_mask(scores, topk, mask=mask)
    return sampled


def convert_xywh_to_ltrb(bbox: jnp.ndarray):
    """(..., 4) center-xywh -> l,t,r,b tuple (`helpers/util.py:16-22`)."""
    xc, yc, w, h = bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3]
    return xc - w / 2, yc - h / 2, xc + w / 2, yc + h / 2
