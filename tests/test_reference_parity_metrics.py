"""Metric-battery + transform/detector parity against the REFERENCE'S OWN code.

Round-2 VERDICT item 3: eval numbers that will be quoted against the paper
rested on self-tested reimplementations.  This file drives the genuine
`helpers/metric.py` and `data/util.py` (via tests/ref_shim.py) on shared
random layout sets and asserts:

  (a) alignment x3 / overlap x3 equal <=1e-6 on dense batches
  (b) IoU / generalized IoU / perceptual IoU / maximum IoU / average IoU
      equal <=1e-6 on shared layout lists
  (c) DocSim and both Wasserstein distances equal <=1e-6
  (d) relation-violation rates equal on identical graphs
  (e) FID Frechet math vs an INDEPENDENT eigenvalue computation and PRDC vs
      a naive O(N^2) loop implementation (the pip `prdc`/`pytorch_fid` deps
      are absent, and the shim redirects them to our code, so the reference
      import path alone would be circular — these two are verified against
      from-the-definition reimplementations instead)
  (f) transform pipeline (`data/util.py:111-267`): AddCanvasElement,
      seeded AddRelationConstraints graphs, LexicographicOrder, SortByLabel,
      HorizontalFlip identical per layout; detectors spot-checked
"""

import numpy as np
import pytest
import torch

from layoutdm_tpu.data import relations as my_rel
from layoutdm_tpu.data import transforms as my_tf
from layoutdm_tpu.eval import metrics as my_m

from tests import ref_shim

ref_shim.install_stubs()

import trainer.data.util as ref_du  # noqa: E402
import trainer.helpers.metric as ref_m  # noqa: E402

from tests.test_reference_parity_tasks import _random_relation_graphs  # noqa: E402


def _random_layout_batch(rng, B=8, S=12, n_cat=5, n_min=1):
    n = rng.randint(n_min, S + 1, size=(B,))
    mask = np.arange(S)[None, :] < n[:, None]
    label = (rng.randint(0, n_cat, size=(B, S)) * mask).astype(np.int64)
    bbox = (rng.rand(B, S, 4).astype(np.float32) * 0.7 + 0.05) * mask[..., None]
    return label, bbox, mask


def _layout_list(rng, N=12, smax=6, n_cat=4):
    out = []
    for _ in range(N):
        n = rng.randint(1, smax + 1)
        out.append(
            (
                (rng.rand(n, 4) * 0.7 + 0.05).astype(np.float32),
                rng.randint(0, n_cat, size=n).astype(np.int64),
            )
        )
    return out


# ---------------------------------------------------------------------------
# (a) alignment / overlap
# ---------------------------------------------------------------------------


def test_alignment_parity(rng):
    label, bbox, mask = _random_layout_batch(rng)
    ref = ref_m.compute_alignment(torch.from_numpy(bbox), torch.from_numpy(mask))
    my = my_m.compute_alignment(bbox, mask)
    assert set(ref) == set(my)
    for k in ref:
        np.testing.assert_allclose(my[k], ref[k].numpy(), atol=1e-6)


def test_overlap_parity(rng):
    label, bbox, mask = _random_layout_batch(rng)
    ref = ref_m.compute_overlap(torch.from_numpy(bbox), torch.from_numpy(mask))
    my = my_m.compute_overlap(bbox, mask)
    assert set(ref) == set(my)
    for k in ref:
        np.testing.assert_allclose(my[k], ref[k].numpy(), atol=1e-6)


# ---------------------------------------------------------------------------
# (b) the IoU family
# ---------------------------------------------------------------------------


def test_iou_and_giou_parity(rng):
    b1 = (rng.rand(40, 4) * 0.7 + 0.05).astype(np.float32)
    b2 = (rng.rand(40, 4) * 0.7 + 0.05).astype(np.float32)
    np.testing.assert_allclose(
        my_m.compute_iou(b1, b2), ref_m.compute_iou(b1, b2), atol=1e-6
    )
    np.testing.assert_allclose(
        my_m.compute_iou(b1, b2, generalized=True),
        ref_m.compute_iou(b1, b2, generalized=True),
        atol=1e-6,
    )


def test_perceptual_iou_parity(rng):
    b1 = (rng.rand(15, 4) * 0.7 + 0.05).astype(np.float32)
    b2 = (rng.rand(15, 4) * 0.7 + 0.05).astype(np.float32)
    np.testing.assert_allclose(
        my_m.compute_perceptual_iou(b1, b2),
        ref_m.compute_perceptual_iou(b1, b2),
        atol=1e-6,
    )


def test_maximum_iou_parity(rng):
    layouts_1 = _layout_list(rng)
    # second set shares every label multiset (same labels, fresh boxes) so
    # the grouped double-Hungarian actually matches non-trivially
    layouts_2 = [
        ((rng.rand(len(l), 4) * 0.7 + 0.05).astype(np.float32), l.copy())
        for _, l in layouts_1
    ]
    # make some groups UNEQUAL-sized (N != M) — that exercises the
    # reference's scrambled meshgrid-reshape matrix layout (`metric.py:
    # 321-327`), which changes the matching and which we mirror exactly
    for _, l in layouts_1[:4]:
        layouts_2.append(
            ((rng.rand(len(l), 4) * 0.7 + 0.05).astype(np.float32), l.copy())
        )
    rng.shuffle(layouts_2)
    ref = ref_m.compute_maximum_iou(layouts_1, layouts_2)
    my = my_m.compute_maximum_iou(layouts_1, layouts_2)
    assert ref > 0
    np.testing.assert_allclose(my, ref, atol=1e-6)


def test_average_iou_parity(rng):
    layouts = _layout_list(rng, N=10)
    ref = ref_m.compute_average_iou(layouts)
    my = my_m.compute_average_iou(layouts)
    assert set(ref) == set(my) and ref["average_iou-VTN"] > 0
    for k in ref:
        np.testing.assert_allclose(my[k], ref[k], atol=1e-6)


# ---------------------------------------------------------------------------
# (c) DocSim / Wasserstein
# ---------------------------------------------------------------------------


def test_docsim_parity(rng):
    gt = _layout_list(rng, N=10, smax=5)
    gen = _layout_list(rng, N=10, smax=5)
    ref = ref_m.compute_docsim(gt, gen)
    my = my_m.compute_docsim(gt, gen)
    assert ref > 0
    np.testing.assert_allclose(my, ref, atol=1e-6)


def test_wasserstein_parity(rng):
    l1 = _layout_list(rng, N=10)
    l2 = _layout_list(rng, N=10)
    ref = ref_m.compute_wasserstein_distance(l1, l2, n_classes=4)
    my = my_m.compute_wasserstein_distance(l1, l2, n_classes=4)
    for k in ref:
        np.testing.assert_allclose(my[k], ref[k], atol=1e-6)


# ---------------------------------------------------------------------------
# (d) relation violation
# ---------------------------------------------------------------------------


def test_violation_parity(rng):
    mine, ref_batch = _random_relation_graphs(rng, B=6, S=8)
    B, S1 = mine["boxes"].shape[:2]
    # evaluate violations of boxes that did NOT define the relations
    boxes2 = (rng.rand(B, S1, 4) * 0.6 + 0.05).astype(np.float32)
    boxes2[:, 0] = np.asarray([0.5, 0.5, 1.0, 1.0], np.float32)
    flat2 = np.concatenate(
        [boxes2[b, : int(mine["n"][b]) + 1] for b in range(B)], axis=0
    )

    ref = ref_m.compute_violation(torch.from_numpy(flat2), ref_batch).numpy()
    my = my_m.compute_violation(
        boxes2, mine["labels"], mine["edge_index"], mine["edge_attr"],
        mine["edge_mask"],
    )
    assert np.nanmax(ref) > 0  # something is actually violated
    np.testing.assert_allclose(my, ref, atol=1e-6)


# ---------------------------------------------------------------------------
# (e) FID / PRDC vs independent from-the-definition computations
# ---------------------------------------------------------------------------


def test_frechet_distance_vs_eigenvalue_route(rng):
    """trace(sqrtm(S1 S2)) == sum of sqrt eigenvalues of S1 S2 — an
    independent numerical route to the pytorch_fid formula."""
    D, N = 16, 200
    fr = rng.randn(N, D) @ rng.randn(D, D) * 0.3
    ff = rng.randn(N, D) @ rng.randn(D, D) * 0.3 + 0.5
    mu1, mu2 = fr.mean(0), ff.mean(0)
    s1 = np.cov(fr, rowvar=False)
    s2 = np.cov(ff, rowvar=False)
    got = my_m.frechet_distance(mu1, s1, mu2, s2)

    diff = mu1 - mu2
    ev = np.linalg.eigvals(s1 @ s2)
    want = float(
        diff @ diff + np.trace(s1) + np.trace(s2)
        - 2 * np.sqrt(np.abs(ev)).sum()
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_prdc_vs_naive_loops(rng):
    """Precision/recall/density/coverage [Naeem+ ICML'20] from the paper's
    definitions, O(N^2) python loops — independent of our vectorized code."""
    D, N, k = 8, 60, 5
    real = rng.randn(N, D)
    fake = rng.randn(N, D) * 1.2 + 0.3
    got = my_m.compute_prdc(real, fake, nearest_k=k)

    def knn_radius(x, k):
        r = np.zeros(len(x))
        for i in range(len(x)):
            d = sorted(np.linalg.norm(x[i] - x[j]) for j in range(len(x)) if j != i)
            r[i] = d[k - 1]
        return r

    rr = knn_radius(real, k)
    fr = knn_radius(fake, k)
    d_rf = np.asarray(
        [[np.linalg.norm(r - f) for f in fake] for r in real]
    )  # (N_real, N_fake)

    precision = np.mean([(d_rf[:, j] <= rr).any() for j in range(N)])
    recall = np.mean([(d_rf[i, :] <= fr).any() for i in range(N)])
    density = np.mean([(d_rf[:, j] <= rr).sum() for j in range(N)]) / k
    coverage = np.mean([(d_rf[i, :] <= rr[i]).any() for i in range(N)])
    np.testing.assert_allclose(got["precision"], precision, atol=1e-9)
    np.testing.assert_allclose(got["recall"], recall, atol=1e-9)
    np.testing.assert_allclose(got["density"], density, atol=1e-9)
    np.testing.assert_allclose(got["coverage"], coverage, atol=1e-9)


# ---------------------------------------------------------------------------
# (f) transforms + detectors (`data/util.py:33-226`)
# ---------------------------------------------------------------------------


def _ref_data(bbox_n, label_n, has_canvas=False):
    # AddCanvasElement reads attr["has_canvas_element"].any().item()
    # (`data/util.py:116`) — the real dataset stores it as a tensor
    return ref_shim.Data(
        x=torch.from_numpy(bbox_n.copy()),
        y=torch.from_numpy(label_n.copy()),
        attr={
            "has_canvas_element": torch.tensor([has_canvas]),
            "NoiseAdded": torch.tensor([False]),
        },
    )


def test_detectors_parity(rng):
    for _ in range(200):
        b1 = rng.rand(4).astype(np.float32) * 0.8 + 0.05
        b2 = rng.rand(4).astype(np.float32) * 0.8 + 0.05
        assert int(my_rel.detect_size_relation(b1, b2)) == int(
            ref_du.detect_size_relation(torch.from_numpy(b1), torch.from_numpy(b2))
        )
        for canvas in (False, True):
            assert int(my_rel.detect_loc_relation(b1, b2, canvas)) == int(
                ref_du.detect_loc_relation(
                    torch.from_numpy(b1), torch.from_numpy(b2), canvas
                )
            )


def test_add_canvas_and_relations_parity(rng):
    """AddCanvasElement + AddRelationConstraints(seed=s) produce identical
    graphs (edge_index, bit attrs) per layout."""
    label, bbox, mask = _random_layout_batch(rng, B=5, S=8, n_min=2)
    seed = 1234

    canvas = my_tf.AddCanvasElement()
    batch = canvas(rng, {"label": label, "bbox": bbox, "mask": mask})
    rel = my_tf.AddRelationConstraints(edge_ratio=0.3, seed=seed, max_edges=64)
    batch = rel(rng, batch)

    for b in range(label.shape[0]):
        n = int(mask[b].sum())
        data = _ref_data(bbox[b, :n], label[b, :n])
        data = ref_du.AddCanvasElement()(data)
        data = ref_du.AddRelationConstraints(seed=seed + b, edge_ratio=0.3)(data)

        E = int(batch["edge_mask"][b].sum())
        my_ei = batch["edge_index"][b, :E]
        my_ea = batch["edge_attr"][b, :E]
        ref_ei = data.edge_index.numpy().T.reshape(-1, 2)
        np.testing.assert_array_equal(my_ei, ref_ei)
        np.testing.assert_array_equal(my_ea, data.edge_attr.numpy())
        # the canvas-augmented layout itself
        np.testing.assert_allclose(
            batch["bbox"][b, : n + 1], data.x.numpy(), atol=0
        )
        np.testing.assert_array_equal(
            batch["label"][b, : n + 1], data.y.numpy()
        )


def test_lexicographic_order_parity(rng):
    label, bbox, mask = _random_layout_batch(rng, B=6, S=10, n_min=2)
    out = my_tf.LexicographicOrder()(rng, {"label": label, "bbox": bbox,
                                           "mask": mask})
    for b in range(label.shape[0]):
        n = int(mask[b].sum())
        data = _ref_data(bbox[b, :n], label[b, :n])
        data = ref_du.LexicographicOrder()(data)
        np.testing.assert_allclose(out["bbox"][b, :n], data.x.numpy(), atol=0)
        np.testing.assert_array_equal(out["label"][b, :n], data.y.numpy())


def test_sort_by_label_parity(rng):
    label, bbox, mask = _random_layout_batch(rng, B=6, S=10, n_min=2)
    out = my_tf.SortByLabel()(rng, {"label": label, "bbox": bbox, "mask": mask})
    for b in range(label.shape[0]):
        n = int(mask[b].sum())
        data = _ref_data(bbox[b, :n], label[b, :n])
        data = ref_du.SortByLabel()(data)
        # torch .sort() is not guaranteed stable, so compare the sorted
        # (label, bbox) multisets row-for-row after a stable secondary key
        np.testing.assert_array_equal(out["label"][b, :n], data.y.numpy())
        ours = out["bbox"][b, :n]
        ref = data.x.numpy()
        for lab in np.unique(out["label"][b, :n]):
            sel_o = ours[out["label"][b, :n] == lab]
            sel_r = ref[data.y.numpy() == lab]
            np.testing.assert_allclose(
                np.sort(sel_o, axis=0), np.sort(sel_r, axis=0), atol=0
            )


def test_horizontal_flip_parity(rng):
    label, bbox, mask = _random_layout_batch(rng, B=4, S=6)
    out = my_tf.HorizontalFlip()(rng, {"label": label, "bbox": bbox,
                                       "mask": mask})
    for b in range(label.shape[0]):
        n = int(mask[b].sum())
        data = _ref_data(bbox[b, :n], label[b, :n])
        data = ref_du.HorizontalFlip()(data)
        np.testing.assert_allclose(
            out["bbox"][b, :n], data.x.numpy(), atol=1e-7
        )
