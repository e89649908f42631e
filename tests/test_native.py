"""Native eval engine: Hungarian + max-IoU kernel vs scipy/python."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment as scipy_lsap

from layoutdm_tpu import native


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("native toolchain unavailable")
    return l


def test_lsap_matches_scipy(lib, rng):
    for trial in range(20):
        n = rng.randint(1, 12)
        m = rng.randint(n, 15)
        cost = rng.rand(n, m)
        for maximize in (False, True):
            ri, ci = native.linear_sum_assignment(cost, maximize=maximize)
            rs, cs = scipy_lsap(cost, maximize=maximize)
            np.testing.assert_allclose(
                cost[ri, ci].sum(), cost[rs, cs].sum(), atol=1e-12
            )


def test_lsap_transposed(lib, rng):
    cost = rng.rand(7, 3)
    ri, ci = native.linear_sum_assignment(cost, maximize=True)
    rs, cs = scipy_lsap(cost, maximize=True)
    assert len(ri) == 3
    np.testing.assert_allclose(
        cost[ri, ci].sum(), cost[rs, cs].sum(), atol=1e-12
    )


def test_max_iou_matrix_matches_python(lib, rng):
    from layoutdm_tpu.eval.metrics import _max_iou_two_layouts

    def mk_group(n_layouts, labels):
        out = []
        for _ in range(n_layouts):
            b = rng.rand(len(labels), 4).astype(np.float32) * 0.5 + 0.2
            out.append((b, np.asarray(labels, np.int64)))
        return out

    labels = [0, 1, 1, 2]
    g1, g2 = mk_group(5, labels), mk_group(4, labels)
    scores = native.max_iou_score_matrix(g1, g2)
    for i in range(5):
        for j in range(4):
            want = _max_iou_two_layouts(g1[i], g2[j])
            np.testing.assert_allclose(scores[i, j], want, atol=1e-6)


def test_compute_maximum_iou_native_consistent(lib, rng):
    from layoutdm_tpu.eval.metrics import compute_maximum_iou

    layouts = []
    for _ in range(6):
        n = rng.randint(1, 5)
        b = rng.rand(n, 4).astype(np.float32) * 0.5 + 0.2
        l = rng.randint(0, 3, n)
        layouts.append((b, l))
    assert np.isclose(compute_maximum_iou(layouts, layouts), 1.0)


def test_docsim_pairs_matches_python(lib, rng):
    from layoutdm_tpu.eval.metrics import _docsim_pair

    def mk(n_layouts, sizes=None):
        out = []
        for k in range(n_layouts):
            n = sizes[k] if sizes else rng.randint(1, 6)
            b = rng.rand(n, 4).astype(np.float32) * 0.5 + 0.2
            out.append((b, rng.randint(0, 3, n)))
        return out

    # native computes the sane (N, M) matching — reference-equal only for
    # EQUAL-size pairs (the reference scrambles N != M score matrices, see
    # eval/metrics._ref_pairscore_layout); compute_docsim routes unequal
    # pairs to the python path, so native only ever sees equal sizes
    sizes = [int(rng.randint(1, 6)) for _ in range(12)]
    a, b = mk(12, sizes), mk(12, sizes)
    scores = native.docsim_pairs(a, b)
    for i in range(12):
        np.testing.assert_allclose(
            scores[i], _docsim_pair(a[i], b[i]), atol=1e-6
        )
