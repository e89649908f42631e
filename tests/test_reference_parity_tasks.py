"""Conditioning / relation-guidance parity against the REFERENCE'S OWN code.

Round-2 VERDICT item 1: `tasks.py`, `relation/const.py`, and
`relation/guidance.py` were only self/twin-verified.  This file drives the
genuine `/root/reference` modules (`helpers/task.py`, `models/clg/const.py`,
`models/categorical_diffusion/logit_adjustment.py`, imported unmodified via
tests/ref_shim.py) with identical inputs and asserts:

  (a) `get_cond` seq/mask token-identical for all six task types on identical
      batches — shared injected randomness where sampling is involved
      (partial topk+scores, random ratio+scores, refinement gaussian noise)
  (b) the refinement smoothed-onehot weak prior equal <=1e-6 for all three
      modes (`task.py:154-224`), incl. the assembled weak_logits/weak_mask
  (c) all 14 relation penalties equal <=1e-6 on identical padded graphs
      (`clg/const.py:59-235`)
  (d) the relation-guided update (K SGD steps, Eq.7) matching the reference's
      `logit_adjustment.update` <=1e-4 under the flagship lambda
"""

import random as py_random
from types import SimpleNamespace

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from layoutdm_tpu import tasks
from layoutdm_tpu.configs import SamplingConfig
from layoutdm_tpu.registry import DATASET_LABELS
from layoutdm_tpu.relation.const import relation_losses
from layoutdm_tpu.relation.guidance import (
    RelationData,
    expected_bbox,
    make_relation_guidance,
)
from layoutdm_tpu.tokenizer.bbox import BboxTokenizer
from layoutdm_tpu.tokenizer.sequence import LayoutSequenceTokenizer

from tests import ref_shim

ref_shim.install_stubs()

import trainer.data.util as ref_data_util  # noqa: E402
import trainer.helpers.task as ref_task  # noqa: E402
import trainer.models.categorical_diffusion.logit_adjustment as ref_la  # noqa: E402
import trainer.models.clg.const as ref_const  # noqa: E402


def make_my_tokenizer():
    bb = BboxTokenizer(
        num_bins=32,
        var_order=("x", "y", "w", "h"),
        shared_vocab="x-y-w-h",
        quantization="linear",
    )
    return LayoutSequenceTokenizer(
        bbox_tokenizer=bb,
        num_categories=len(DATASET_LABELS["rico25"]),
        max_elements=25,
        special_tokens=("pad", "mask"),
        pad_until_max=True,
    )


@pytest.fixture(scope="module")
def toks():
    return ref_shim.make_ref_tokenizer(), make_my_tokenizer()


def _random_layouts(rng, B=6, S=25, n_cat=25, n_min=1):
    n = rng.randint(n_min, S + 1, size=(B,))
    mask = np.arange(S)[None, :] < n[:, None]
    label = (rng.randint(0, n_cat, size=(B, S)) * mask).astype(np.int64)
    bbox = rng.rand(B, S, 4).astype(np.float32) * mask[..., None]
    return label, bbox, mask


def _ref_cond(label, bbox, mask, ref_tok, cond_type, **kw):
    batch = ref_shim.dense_to_sparse_batch(
        label, bbox, mask, add_canvas=(cond_type == "relation")
    )
    return ref_task.get_cond(batch, ref_tok, cond_type, **kw)


def _my_cond(label, bbox, mask, my_tok, cond_type, key=0, **kw):
    return tasks.get_cond(
        jax.random.PRNGKey(key),
        {"label": label, "bbox": bbox, "mask": mask},
        my_tok,
        cond_type,
        **kw,
    )


def _assert_cond_equal(my, ref, check_num_element=True):
    np.testing.assert_array_equal(
        np.asarray(my["seq"]), ref["seq"].numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(my["mask"]), ref["mask"].numpy()
    )
    if check_num_element and "num_element" in ref:
        np.testing.assert_array_equal(
            np.asarray(my["num_element"]), ref["num_element"].numpy()
        )


# ---------------------------------------------------------------------------
# (a) get_cond parity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cond_type", ["c", "cwh", "gt", "relation"])
def test_get_cond_deterministic_parity(toks, rng, cond_type):
    ref_tok, my_tok = toks
    label, bbox, mask = _random_layouts(rng)
    ref = _ref_cond(label, bbox, mask, ref_tok, cond_type)
    my = _my_cond(label, bbox, mask, my_tok, cond_type)
    _assert_cond_equal(my, ref)


def test_get_cond_partial_parity(toks, rng, monkeypatch):
    """`task.py:62-92`: inject identical keep-scores and per-row topk into
    both implementations, then require identical seq/mask."""
    ref_tok, my_tok = toks
    B = 8
    label, bbox, mask = _random_layouts(rng, B=B)  # n_valid in [1, 25]
    n_valid = mask.sum(1)
    n_elem = 25

    scores_np = rng.rand(B, n_elem).astype(np.float32)
    vmax = ((n_valid - 1).astype(np.float32) * tasks.MAX_PARTIAL_RATIO).astype(
        np.int64
    )
    topk_np = np.asarray(
        [rng.randint(1, v + 1) if v > 1 else 1 for v in vmax], np.int64
    )

    # reference side: torch.rand -> scores; random.randint -> topk (only
    # consulted for rows with vmax > 1, in batch order)
    monkeypatch.setattr(
        torch, "rand", lambda *a, **kw: torch.from_numpy(scores_np)
    )
    pending = iter([int(k) for k, v in zip(topk_np, vmax) if v > 1])
    monkeypatch.setattr(
        py_random, "randint", lambda a, b: next(pending)
    )
    ref = _ref_cond(label, bbox, mask, ref_tok, "partial")

    # our side: same scores; randint arranged so (x % vmax) + 1 == topk
    monkeypatch.setattr(
        jax.random, "uniform", lambda key, shape=(), **kw: jnp.asarray(scores_np)
    )
    monkeypatch.setattr(
        jax.random,
        "randint",
        lambda key, shape, lo, hi, **kw: jnp.asarray(topk_np - 1, jnp.int32),
    )
    my = _my_cond(label, bbox, mask, my_tok, "partial")
    _assert_cond_equal(my, ref)


def test_get_cond_random_parity(toks, rng, monkeypatch):
    """`task.py:119-124`: shared per-row ratio and mask-scores."""
    ref_tok, my_tok = toks
    B = 6
    label, bbox, mask = _random_layouts(rng, B=B)
    S_tok = ref_tok.max_token_length
    ratio_np = rng.rand(B).astype(np.float32)
    scores_np = rng.rand(B, S_tok).astype(np.float32)

    def fake_torch_rand(*a, **kw):
        shape = tuple(a[0]) if len(a) == 1 and not isinstance(a[0], int) else a
        return torch.from_numpy(ratio_np if shape == (B,) else scores_np)

    monkeypatch.setattr(torch, "rand", fake_torch_rand)
    ref = _ref_cond(label, bbox, mask, ref_tok, "random")

    def fake_jax_uniform(key, shape=(), **kw):
        return jnp.asarray(ratio_np if tuple(shape) == (B,) else scores_np)

    monkeypatch.setattr(jax.random, "uniform", fake_jax_uniform)
    my = _my_cond(label, bbox, mask, my_tok, "random")
    _assert_cond_equal(my, ref)


@pytest.mark.parametrize("model_type", ["LayoutDM", "RUITE"])
def test_get_cond_refinement_parity(toks, rng, monkeypatch, model_type):
    """`task.py:126-140`: identical injected gaussian noise -> identical
    seq/mask/seq_orig, for both the masked (LayoutDM) and the full-noisy
    (one-shot refiner) variants."""
    ref_tok, my_tok = toks
    label, bbox, mask = _random_layouts(rng)
    base = rng.randn(*bbox.shape).astype(np.float32)
    W = int(mask.sum(1).max())  # the reference's dense width is max(n)

    monkeypatch.setattr(
        torch, "normal", lambda *a, **kw: torch.from_numpy(0.1 * base[:, :W])
    )
    ref = _ref_cond(label, bbox, mask, ref_tok, "refinement",
                    model_type=model_type)

    monkeypatch.setattr(
        jax.random, "normal", lambda key, shape=(), **kw: jnp.asarray(base)
    )
    my = _my_cond(label, bbox, mask, my_tok, "refinement",
                  model_type=model_type)
    _assert_cond_equal(my, ref)
    if model_type == "LayoutDM":
        np.testing.assert_array_equal(
            np.asarray(my["seq_orig"]), ref["seq_orig"].numpy()
        )


# ---------------------------------------------------------------------------
# (b) refinement weak prior
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["uniform", "gaussian", "negative"])
def test_smoothed_onehot_prior_parity(toks, rng, mode):
    ref_tok, my_tok = toks
    label, bbox, mask = _random_layouts(rng, B=3)
    seq = np.asarray(
        my_tok.encode({"label": label, "bbox": bbox, "mask": mask})["seq"]
    )
    ref_logits = ref_task._index_to_smoothed_log_onehot(
        torch.from_numpy(seq.astype(np.int64)), ref_tok,
        mode=mode, offset_ratio=0.2,
    ).numpy()  # (B, V, S)
    table = tasks.smoothed_onehot_matrix(my_tok, mode=mode, offset_ratio=0.2)
    mine = table[seq]  # (B, S, V)
    np.testing.assert_allclose(
        mine.transpose(0, 2, 1), ref_logits, atol=1e-6
    )


def test_refinement_weak_logits_assembled_parity(toks, rng, monkeypatch):
    """`set_additional_conditions_for_refinement` (`task.py:204-224`) vs our
    `to_sampler_cond` weak fields, on the SAME refinement cond."""
    ref_tok, my_tok = toks
    label, bbox, mask = _random_layouts(rng)
    base = rng.randn(*bbox.shape).astype(np.float32)
    W = int(mask.sum(1).max())

    monkeypatch.setattr(
        torch, "normal", lambda *a, **kw: torch.from_numpy(0.1 * base[:, :W])
    )
    ref = _ref_cond(label, bbox, mask, ref_tok, "refinement",
                    model_type="LayoutDM")
    ref_cfg = ref_shim.AttrDict(
        refine_lambda=3.0, refine_mode="uniform", refine_offset_ratio=0.2
    )
    ref = ref_task.set_additional_conditions_for_refinement(
        ref, ref_tok, ref_cfg
    )

    monkeypatch.setattr(
        jax.random, "normal", lambda key, shape=(), **kw: jnp.asarray(base)
    )
    my = _my_cond(label, bbox, mask, my_tok, "refinement")
    sc = tasks.to_sampler_cond(
        my, my_tok,
        SamplingConfig(refine_lambda=3.0, refine_mode="uniform",
                       refine_offset_ratio=0.2),
    )
    np.testing.assert_allclose(
        np.asarray(sc.weak_logits).transpose(0, 2, 1),
        ref["weak_logits"].numpy(),
        atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(sc.weak_mask), ref["weak_mask"][:, 0, :].numpy()
    )


# ---------------------------------------------------------------------------
# (c) the 14 relation penalties
# ---------------------------------------------------------------------------


def _random_relation_graphs(rng, B=5, S=8, E_max=24):
    """Random canvas-rooted graphs in BOTH encodings.

    Returns (boxes (B,S+1,4) canvas at 0, labels (B,S+1), local padded edges)
    plus the reference-side flattened tensors (x, y, batch, edge_index (2,E),
    edge_attr) with global node indices.
    """
    n = rng.randint(2, S + 1, size=(B,))
    boxes = (rng.rand(B, S + 1, 4) * 0.6 + 0.05).astype(np.float32)
    boxes[:, 0] = np.asarray([0.5, 0.5, 1.0, 1.0], np.float32)
    labels = rng.randint(1, 25, size=(B, S + 1)).astype(np.int64)
    labels[:, 0] = 0

    edge_index = np.zeros((B, E_max, 2), np.int64)
    edge_attr = np.zeros((B, E_max), np.int64)
    edge_mask = np.zeros((B, E_max), bool)

    flat_x, flat_y, flat_b = [], [], []
    g_edge_index, g_edge_attr = [], []
    offset = 0
    for b in range(B):
        nb = int(n[b]) + 1  # canvas + elements
        flat_x.append(boxes[b, :nb])
        flat_y.append(labels[b, :nb])
        flat_b.append(np.full(nb, b, np.int64))
        e = 0
        for i in range(nb):
            for j in range(i + 1, nb):
                if e >= E_max:
                    break
                want_size = rng.rand() < 0.5
                want_loc = rng.rand() < 0.5
                if not (want_size or want_loc):
                    continue
                bi = torch.from_numpy(boxes[b, i])
                bj = torch.from_numpy(boxes[b, j])
                canvas = i == 0
                rel = 0
                rel |= (
                    1 << int(ref_data_util.detect_size_relation(bi, bj))
                    if want_size
                    else 1 << int(ref_data_util.RelSize.UNKNOWN)
                )
                rel |= (
                    1 << int(ref_data_util.detect_loc_relation(bi, bj, canvas))
                    if want_loc
                    else 1 << int(ref_data_util.RelLoc.UNKNOWN)
                )
                edge_index[b, e] = (i, j)
                edge_attr[b, e] = rel
                edge_mask[b, e] = True
                g_edge_index.append((offset + i, offset + j))
                g_edge_attr.append(rel)
                e += 1
        offset += nb

    ref_batch = ref_shim.SparseBatch(
        x=torch.from_numpy(np.concatenate(flat_x, axis=0)),
        y=torch.from_numpy(np.concatenate(flat_y)),
        batch=torch.from_numpy(np.concatenate(flat_b)),
        attr={"has_canvas_element": True},
        edge_index=torch.from_numpy(np.asarray(g_edge_index, np.int64).T),
        edge_attr=torch.from_numpy(np.asarray(g_edge_attr, np.int64)),
    )
    mine = dict(
        boxes=boxes,
        labels=labels,
        n=n,
        edge_index=edge_index,
        edge_attr=edge_attr,
        edge_mask=edge_mask,
    )
    return mine, ref_batch


def test_relation_losses_parity(rng):
    # relations are DETECTED on the fixture's boxes (zero penalty by
    # construction), so evaluate the penalties on an independent second set
    # of boxes — that violates plenty of them
    mine, ref_batch = _random_relation_graphs(rng)
    B, S1 = mine["boxes"].shape[:2]
    boxes2 = (rng.rand(B, S1, 4) * 0.6 + 0.05).astype(np.float32)
    boxes2[:, 0] = np.asarray([0.5, 0.5, 1.0, 1.0], np.float32)
    flat2 = np.concatenate(
        [boxes2[b, : int(mine["n"][b]) + 1] for b in range(B)], axis=0
    )

    ref_losses = torch.stack(
        [f(torch.from_numpy(flat2), ref_batch) for f in ref_const.relation],
        dim=-1,
    ).numpy()  # (B, 14)

    my_losses = np.asarray(
        relation_losses(
            jnp.asarray(boxes2),
            jnp.asarray(mine["edge_index"], jnp.int32),
            jnp.asarray(mine["edge_attr"], jnp.int32),
            jnp.asarray(mine["edge_mask"]),
            jnp.asarray(mine["edge_index"][..., 0] == 0),
        )
    )
    assert ref_losses.sum() > 0  # the fixture actually violates something
    assert (ref_losses > 0).sum(axis=0).astype(bool).sum() >= 8  # many kinds
    np.testing.assert_allclose(my_losses, ref_losses, atol=1e-6)


# ---------------------------------------------------------------------------
# (d) the relation-guided update (Eq.7)
# ---------------------------------------------------------------------------


def _log_softmax_np(rng, B, S, V):
    z = rng.randn(B, S, V).astype(np.float32) * 3.0
    m = z.max(-1, keepdims=True)
    return (z - m - np.log(np.exp(z - m).sum(-1, keepdims=True))).astype(
        np.float32
    )


@pytest.mark.parametrize("t,lam", [(57, 1.0), (57, 3e6), (5, 3e6)])
def test_guided_update_parity(toks, rng, t, lam):
    """K=3 SGD steps on the mean of the 14 penalties
    (`logit_adjustment.py:88-126`) vs our fori_loop of jax.grad steps; the
    t<10 gate must also agree (`logit_adjustment.py:107`)."""
    ref_tok, my_tok = toks
    B, S_elem = 3, 25
    mine, ref_batch = _random_relation_graphs(rng, B=B, S=S_elem)
    # layouts consistent with the graphs: element boxes/labels from the
    # fixture (labels-1 to undo the canvas shift), masked beyond n
    label = mine["labels"][:, 1:] - 1
    bbox = mine["boxes"][:, 1:]
    mask = np.arange(S_elem)[None, :] < mine["n"][:, None]

    my = _my_cond(label, bbox, mask, my_tok, "relation")
    seq = np.asarray(my["seq"])
    ref_cond = {
        "seq": torch.from_numpy(seq.astype(np.int64)),
        "batch_w_canvas": ref_batch,
        "type": "relation",
    }

    V, S_tok = my_tok.N_total, my_tok.max_token_length
    lp = _log_softmax_np(rng, B, S_tok, V)

    ref_cfg = ref_shim.AttrDict(
        relation_lambda=lam, relation_num_update=3, relation_tau=1.0,
        relation_mode="average",
    )
    ref_out = (
        ref_la.update(
            t=t,
            cond=ref_cond,
            model_log_prob=torch.from_numpy(lp).permute(0, 2, 1).contiguous(),
            tokenizer=ref_tok,
            sampling_cfg=ref_cfg,
        )
        .numpy()
        .transpose(0, 2, 1)
    )

    rel = RelationData(
        edge_index=jnp.asarray(mine["edge_index"], jnp.int32),
        edge_attr=jnp.asarray(mine["edge_attr"], jnp.int32),
        edge_mask=jnp.asarray(mine["edge_mask"]),
        src_is_canvas=jnp.asarray(mine["edge_index"][..., 0] == 0),
    )
    guidance = make_relation_guidance(
        my_tok,
        SamplingConfig(relation_lambda=lam, relation_num_update=3),
        rel,
    )
    cond_ns = SimpleNamespace(seq=jnp.asarray(seq), relation=None)
    my_out = np.asarray(
        guidance(jnp.asarray(lp), jnp.asarray(t), cond_ns)
    )

    if t < 10:
        np.testing.assert_array_equal(my_out, lp)
        np.testing.assert_allclose(ref_out, lp, atol=0)
    else:
        assert np.abs(ref_out - lp).max() > 0  # the update actually moved
    scale = max(1.0, float(np.abs(ref_out - lp).max()))
    np.testing.assert_allclose(my_out, ref_out, atol=1e-4 * scale)


def test_expected_bbox_matches_ref_stochastic_convert(toks, rng):
    """The differentiable soft decode itself (`logit_adjustment.py:16-85`,
    mode='average'): values equal <=1e-5 on the flattened valid nodes."""
    ref_tok, my_tok = toks
    B, S_elem = 3, 25
    label, bbox, mask = _random_layouts(rng, B=B, n_min=2)
    my = _my_cond(label, bbox, mask, my_tok, "relation")
    seq = np.asarray(my["seq"])
    lp = _log_softmax_np(rng, B, my_tok.max_token_length, my_tok.N_total)

    ref_bbox = ref_la._stochastic_convert(
        cond={"seq": torch.from_numpy(seq.astype(np.int64))},
        model_log_prob=torch.from_numpy(lp).permute(0, 2, 1).contiguous(),
        tokenizer=ref_tok,
        mode="average",
    ).numpy()  # (E, 4) flattened canvas+valid nodes

    elem_mask = jnp.asarray(seq[:, :: my_tok.N_var_per_element]
                            != my_tok.name_to_id("pad"))
    mine = np.asarray(expected_bbox(jnp.asarray(lp), my_tok, elem_mask))
    flat = np.concatenate(
        [
            mine[b][np.concatenate([[True], np.asarray(elem_mask)[b]])]
            for b in range(B)
        ],
        axis=0,
    )
    np.testing.assert_allclose(flat, ref_bbox, atol=1e-5)
