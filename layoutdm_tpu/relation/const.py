"""Differentiable relational-constraint penalties (CLG-LO style).

Re-design of `models/clg/const.py:51-235`: the reference evaluates 14 hinge
penalties over a sparse PyG edge list with `to_dense_adj` aggregation; here
edges are STATIC padded arrays (B, E) and every penalty is a masked
vectorized expression, so the whole stack differentiates inside jit (it runs
within the sampling scan for guidance).

Convention: ``bbox_all`` is (B, S+1, 4) with the canvas box at index 0;
``edge_index`` holds (src, dst) into that array; ``src_is_canvas`` marks
edges whose source is the canvas (label 0).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from layoutdm_tpu.data.relations import REL_SIZE_ALPHA, RelLoc, RelSize


def beautify_alignment(
    bbox: jnp.ndarray, mask: jnp.ndarray, threshold: float = 0.004
) -> jnp.ndarray:
    """Differentiable alignment cost per layout (`const.py:11-27`):
    the LayoutGAN++ -log(1-d) closest-edge distance, thresholded."""
    B, S = mask.shape
    xl = bbox[..., 0] - bbox[..., 2] / 2
    xr = bbox[..., 0] + bbox[..., 2] / 2
    yt = bbox[..., 1] - bbox[..., 3] / 2
    yb = bbox[..., 1] + bbox[..., 3] / 2
    X = jnp.stack(
        [xl, bbox[..., 0], xr, yt, bbox[..., 1], yb], axis=1
    )  # (B, 6, S)
    D = jnp.abs(X[:, :, :, None] - X[:, :, None, :])
    eye = jnp.eye(S, dtype=bool)
    D = jnp.where(eye[None, None], 1.0, D)
    D = jnp.where(mask[:, None, :, None], D, 1.0)
    closest = D.min(axis=(1, 3))  # (B, S)
    closest = jnp.where(closest >= 1.0, 0.0, closest)
    cost = -jnp.log1p(-jnp.clip(closest, 0.0, 0.9999)).sum(-1)
    return jnp.where(cost <= threshold, 0.0, cost)


def beautify_non_overlap(bbox: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Differentiable total pairwise overlap ratio per layout
    (`const.py:30-45`)."""
    bbox = jnp.where(mask[..., None], bbox, 0.0)
    l = bbox[..., 0] - bbox[..., 2] / 2
    r = bbox[..., 0] + bbox[..., 2] / 2
    t = bbox[..., 1] - bbox[..., 3] / 2
    b = bbox[..., 1] + bbox[..., 3] / 2
    a1 = ((r - l) * (b - t))[:, :, None]
    lmax = jnp.maximum(l[:, :, None], l[:, None, :])
    rmin = jnp.minimum(r[:, :, None], r[:, None, :])
    tmax = jnp.maximum(t[:, :, None], t[:, None, :])
    bmin = jnp.minimum(b[:, :, None], b[:, None, :])
    inter = jnp.maximum(rmin - lmax, 0.0) * jnp.maximum(bmin - tmax, 0.0)
    S = mask.shape[1]
    pair_ok = mask[:, :, None] & mask[:, None, :] & ~jnp.eye(S, dtype=bool)
    ratio = jnp.where(pair_ok & (a1 > 0), inter / jnp.maximum(a1, 1e-8), 0.0)
    return ratio.sum(axis=(1, 2))


# guidance losses used by CLG-LO-style "beautify" mode (`const.py:48`)
beautify = (beautify_alignment, beautify_non_overlap)


def _leq(a, b):
    """penalty for requiring a <= b (`const.py:51-52`)."""
    return jnp.maximum(a - b, 0.0)


def _lt(a, b, eps=1e-8):
    return jnp.maximum(a - b + eps, 0.0)


def _gather_edge(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(B, S1, ...) gathered at (B, E) -> (B, E, ...)."""
    if x.ndim == 2:
        return jnp.take_along_axis(x, idx, axis=1)
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def relation_losses(
    bbox_all: jnp.ndarray,  # (B, S1, 4) xywh, canvas at 0
    edge_index: jnp.ndarray,  # (B, E, 2)
    edge_attr: jnp.ndarray,  # (B, E) bit flags
    edge_mask: jnp.ndarray,  # (B, E)
    src_is_canvas: jnp.ndarray,  # (B, E)
) -> jnp.ndarray:
    """All 14 penalties, summed per graph -> (B, 14).

    Term order mirrors the `relation` list (`const.py:220-235`):
    size sm/eq/lg x {element, canvas}, canvas-loc t/c/b, loc t/b/l/r/c.
    """
    src, dst = edge_index[..., 0], edge_index[..., 1]
    bi = _gather_edge(bbox_all, src)  # (B, E, 4)
    bj = _gather_edge(bbox_all, dst)

    ai = bi[..., 2] * bi[..., 3]
    aj = bj[..., 2] * bj[..., 3]

    def ltrb(b):
        return (
            b[..., 0] - b[..., 2] / 2,
            b[..., 1] - b[..., 3] / 2,
            b[..., 0] + b[..., 2] / 2,
            b[..., 1] + b[..., 3] / 2,
        )

    li, ti, ri, bbi = ltrb(bi)
    lj, tj, rj, bbj = ltrb(bj)
    ycj = bj[..., 1]

    def has(rel):
        return (edge_attr & (1 << int(rel))) != 0

    terms = []
    # --- size (element-sourced and canvas-sourced variants) ---------------
    a_sm, a_lg = (1 - REL_SIZE_ALPHA) * ai, (1 + REL_SIZE_ALPHA) * ai
    for canvas in (False, True):
        src_ok = src_is_canvas if canvas else ~src_is_canvas
        terms.append(_leq(aj, a_sm) * (has(RelSize.SMALLER) & src_ok))
        terms.append(
            (_lt(a_sm, aj) + _lt(aj, a_lg)) * (has(RelSize.EQUAL) & src_ok)
        )
        terms.append(_leq(a_lg, aj) * (has(RelSize.LARGER) & src_ok))
    # reorder to the reference's sm/sm_c/eq/eq_c/lg/lg_c sequence
    terms = [terms[0], terms[3], terms[1], terms[4], terms[2], terms[5]]

    # --- location w.r.t. canvas (`const.py:106-149`) ----------------------
    cv = src_is_canvas
    terms.append(_leq(ycj, 1 / 3) * (has(RelLoc.TOP) & cv))
    terms.append((_lt(1 / 3, ycj) + _lt(ycj, 2 / 3)) * (has(RelLoc.CENTER) & cv))
    terms.append(_leq(2 / 3, ycj) * (has(RelLoc.BOTTOM) & cv))

    # --- location between elements (`const.py:152-217`) -------------------
    ncv = ~src_is_canvas
    overlap_band = _lt(ti, bbj) + _lt(tj, bbi)  # same horizontal band
    terms.append(_leq(bbj, ti) * (has(RelLoc.TOP) & ncv))
    terms.append(_leq(bbi, tj) * (has(RelLoc.BOTTOM) & ncv))
    terms.append((_leq(rj, li) + overlap_band) * (has(RelLoc.LEFT) & ncv))
    terms.append((_leq(ri, lj) + overlap_band) * (has(RelLoc.RIGHT) & ncv))
    terms.append(
        (_lt(li, rj) + _lt(lj, ri) + overlap_band) * (has(RelLoc.CENTER) & ncv)
    )

    stacked = jnp.stack(terms, axis=-1)  # (B, E, 14)
    stacked = jnp.where(edge_mask[..., None], stacked, 0.0)
    return stacked.sum(axis=1)  # (B, 14)
