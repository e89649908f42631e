"""Data transforms: ordering, noise, canvas, composition (`data/util.py`)."""

import numpy as np

from layoutdm_tpu.data.transforms import (
    AddCanvasElement,
    AddNoiseToBBox,
    HorizontalFlip,
    LexicographicOrder,
    RandomOrder,
    SortByLabel,
    compose_transform,
)
from tests.test_tokenizer import random_layout


def test_sort_by_label(rng):
    batch = random_layout(rng, B=3, S=6, n_cat=5)
    out = SortByLabel()(rng, batch)
    for b in range(3):
        labs = out["label"][b][out["mask"][b]]
        assert (np.diff(labs) >= 0).all()
    # bbox permuted consistently with labels
    for b in range(3):
        orig = {tuple(x) for x in
                np.concatenate([batch["label"][b][:, None],
                                batch["bbox"][b]], 1)[batch["mask"][b]]}
        new = {tuple(x) for x in
               np.concatenate([out["label"][b][:, None],
                               out["bbox"][b]], 1)[out["mask"][b]]}
        assert orig == new


def test_lexicographic_order(rng):
    batch = random_layout(rng, B=2, S=6, n_cat=5)
    out = LexicographicOrder()(rng, batch)
    for b in range(2):
        bb = out["bbox"][b][out["mask"][b]]
        top = bb[:, 1] - bb[:, 3] / 2
        assert (np.diff(top) >= -1e-6).all()


def test_random_order_preserves_set(rng):
    batch = random_layout(rng, B=2, S=6, n_cat=5)
    out = RandomOrder()(rng, batch)
    for b in range(2):
        orig = sorted(map(tuple, batch["bbox"][b][batch["mask"][b]]))
        new = sorted(map(tuple, out["bbox"][b][out["mask"][b]]))
        assert orig == new
    # padding stays at the tail
    np.testing.assert_array_equal(out["mask"], batch["mask"])


def test_add_canvas(rng):
    batch = random_layout(rng, B=2, S=4, n_cat=5)
    out = AddCanvasElement()(rng, batch)
    assert out["label"].shape == (2, 5)
    np.testing.assert_array_equal(out["label"][:, 0], 0)
    np.testing.assert_allclose(
        out["bbox"][:, 0], [[0.5, 0.5, 1.0, 1.0]] * 2
    )
    # original labels shifted +1 where valid
    np.testing.assert_array_equal(
        out["label"][:, 1:][batch["mask"]],
        batch["label"][batch["mask"]] + 1,
    )


def test_noise_and_flip(rng):
    batch = random_layout(rng, B=2, S=4, n_cat=5)
    noised = AddNoiseToBBox(std=0.1)(rng, batch)
    assert "bbox_orig" in noised
    assert not np.allclose(noised["bbox"], batch["bbox"])
    flipped = HorizontalFlip()(rng, batch)
    m = batch["mask"]
    np.testing.assert_allclose(
        flipped["bbox"][..., 0][m], (1 - batch["bbox"][..., 0])[m], atol=1e-6
    )


def test_compose_transform_with_args(rng):
    pipeline = compose_transform(
        ["SortByLabel", "AddNoiseToBBox(std=0.2)"]
    )
    batch = random_layout(rng, B=2, S=4, n_cat=5)
    out = pipeline(rng, batch)
    assert "bbox_orig" in out
    for b in range(2):
        labs = np.take_along_axis(
            out["label"][b], np.arange(4), 0
        )[out["mask"][b]]
        assert (np.diff(labs) >= 0).all()
