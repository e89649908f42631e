"""Direct unit tests of the task/condition builders (`helpers/task.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from layoutdm_tpu.configs import SamplingConfig
from layoutdm_tpu.tasks import (
    get_cond,
    refinement_weak_logits,
    smoothed_onehot_matrix,
    to_sampler_cond,
)
from tests.test_tokenizer import make_tokenizer, random_layout


@pytest.fixture(scope="module")
def tok():
    return make_tokenizer(
        shared_vocab="x-y-w-h", num_categories=4, max_elements=4
    )


def test_cond_c_masks(rng, tok):
    layout = random_layout(rng, B=2, S=4, n_cat=4)
    cond = get_cond(jax.random.PRNGKey(0), layout, tok, "c")
    seq = np.asarray(cond["seq"]).reshape(2, 4, 5)
    mask = np.asarray(cond["mask"]).reshape(2, 4, 5)
    mask_id, pad_id = tok.name_to_id("mask"), tok.name_to_id("pad")
    for b in range(2):
        for s in range(4):
            if layout["mask"][b, s]:
                assert seq[b, s, 0] == layout["label"][b, s]
                assert (seq[b, s, 1:] == mask_id).all()
                assert mask[b, s, 0] and not mask[b, s, 1:].any()
            else:
                # empty slots are PAD and fully known
                assert (seq[b, s] == pad_id).all()
                assert mask[b, s].all()
    np.testing.assert_array_equal(
        np.asarray(cond["num_element"]), layout["mask"].sum(1)
    )


def test_cond_cwh_keeps_sizes(rng, tok):
    layout = random_layout(rng, B=2, S=4, n_cat=4)
    cond = get_cond(jax.random.PRNGKey(0), layout, tok, "cwh")
    gt = tok.encode(layout)
    seq = np.asarray(cond["seq"]).reshape(2, 4, 5)
    gt_seq = np.asarray(gt["seq"]).reshape(2, 4, 5)
    mask_id = tok.name_to_id("mask")
    # var order c-x-y-w-h: slots 3,4 = w,h kept; 1,2 = x,y masked
    for b in range(2):
        for s in range(4):
            if layout["mask"][b, s]:
                np.testing.assert_array_equal(seq[b, s, 3:], gt_seq[b, s, 3:])
                assert (seq[b, s, 1:3] == mask_id).all()


def test_cond_partial_ratio(rng, tok):
    layout = random_layout(rng, B=8, S=4, n_cat=4)
    layout["mask"][:] = True
    cond = get_cond(jax.random.PRNGKey(1), layout, tok, "partial")
    kept_elems = np.asarray(cond["mask"]).reshape(8, 4, 5)[:, :, 0]
    # at least 1 and at most ceil(30%) of elements kept (`task.py:62-75`)
    counts = kept_elems.sum(1)
    assert (counts >= 1).all()
    assert (counts <= max(int((4 - 1) * 0.3), 1)).all()


def test_cond_refinement_structure(rng, tok):
    layout = random_layout(rng, B=2, S=4, n_cat=4)
    cond = get_cond(jax.random.PRNGKey(2), layout, tok, "refinement")
    assert "seq_orig" in cond
    seq = np.asarray(cond["seq"]).reshape(2, 4, 5)
    for b in range(2):
        for s in range(4):
            if layout["mask"][b, s]:
                assert seq[b, s, 0] == layout["label"][b, s]


def test_cond_gt_and_random(rng, tok):
    layout = random_layout(rng, B=2, S=4, n_cat=4)
    gt = get_cond(jax.random.PRNGKey(3), layout, tok, "gt")
    enc = tok.encode(layout)
    np.testing.assert_array_equal(np.asarray(gt["seq"]), np.asarray(enc["seq"]))
    rnd = get_cond(jax.random.PRNGKey(4), layout, tok, "random")
    masked = np.asarray(rnd["seq"]) == tok.name_to_id("mask")
    assert masked.any()
    np.testing.assert_array_equal(np.asarray(rnd["mask"]), ~masked)


def test_smoothed_onehot_matrix_structure(tok):
    m = smoothed_onehot_matrix(tok, mode="uniform", offset_ratio=0.1)
    assert m.shape == (tok.N_total, tok.N_total)
    np.testing.assert_array_equal(np.diag(m), 1.0)
    # category block stays identity
    assert m[0, 1] == 0.0
    # coordinate block: neighbors within 0.1 of the center are 1
    sl = tok.get_slice("x")
    assert m[sl.start, sl.start + 1] == 1.0  # adjacent 1/32 bins
    assert m[sl.start, sl.stop - 1] == 0.0  # far bins
    neg = smoothed_onehot_matrix(tok, mode="negative", offset_ratio=0.1)
    np.testing.assert_array_equal(
        neg[sl, sl] + m[sl, sl], np.ones((32, 32))
    )


def test_weak_logits_scaling(rng, tok):
    layout = random_layout(rng, B=1, S=4, n_cat=4)
    cond = get_cond(jax.random.PRNGKey(5), layout, tok, "refinement")
    w = refinement_weak_logits(cond, tok, SamplingConfig(refine_lambda=3.0))
    assert float(jnp.max(w)) == 3.0
    w_neg = refinement_weak_logits(
        cond, tok,
        SamplingConfig(refine_lambda=3.0, refine_mode="negative"),
    )
    assert float(jnp.min(w_neg)) == -3.0


def test_duplicate_cond_broadcast(rng, tok):
    layout = random_layout(rng, B=1, S=4, n_cat=4)
    cond = get_cond(jax.random.PRNGKey(6), layout, tok, "c")
    sc = to_sampler_cond(cond, tok, SamplingConfig(), batch_size=5)
    assert sc.seq.shape[0] == 5
    np.testing.assert_array_equal(
        np.asarray(sc.seq[0]), np.asarray(sc.seq[4])
    )


def test_element_transformer_module(rng):
    from layoutdm_tpu.configs import BackboneConfig
    from layoutdm_tpu.models.nn import ElementTransformer

    cfg = BackboneConfig(d_model=32, nhead=2, dim_feedforward=32,
                         num_layers=1, dropout=0.0)
    net = ElementTransformer(cfg, num_labels=5, num_bins=8)
    label = jnp.asarray(rng.randint(0, 5, (2, 6)))
    bbox = jnp.asarray(rng.randint(0, 8, (2, 6, 4)))
    params = net.init({"params": jax.random.PRNGKey(0)}, label, bbox)["params"]
    out = net.apply({"params": params}, label, bbox)
    assert out["label"].shape == (2, 6, 5)
    assert out["bbox"].shape == (2, 6, 4, 8)


def test_cond_partial_bos_compaction(rng):
    """BOS models (`task.py:79-89`): kept tokens are shifted to the front in
    ORIGINAL order, the tail is MASK, and the cond mask marks exactly the
    compacted prefix (vectorized path, no host loop)."""
    tok_bos = make_tokenizer(
        shared_vocab="xywh",
        special=("pad", "bos", "eos", "mask"),
        num_categories=4,
        max_elements=4,
    )
    layout = random_layout(rng, B=3, S=4, n_cat=4)
    cond = get_cond(jax.random.PRNGKey(3), layout, tok_bos, "partial")
    seq = np.asarray(cond["seq"])
    mask = np.asarray(cond["mask"])
    mask_id, bos_id = tok_bos.name_to_id("mask"), tok_bos.name_to_id("bos")
    full = np.asarray(tok_bos.encode(layout)["seq"])

    for b in range(3):
        n = int(mask[b].sum())
        assert n >= 1 and bool(mask[b, :n].all()) and not mask[b, n:].any()
        assert seq[b, 0] == bos_id
        # tail is MASK
        assert (seq[b, n:] == mask_id).all()
        # the compacted prefix is a subsequence of the full encoding
        # (original order preserved)
        it = iter(full[b])
        assert all(any(tokv == x for x in it) for tokv in seq[b, :n])
