"""Rendering tests, including the real-image background + cropped-patch mode
(reference `helpers/visualization.py:26-57`)."""

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

from layoutdm_tpu.utils.visualization import (
    category_colors,
    convert_layout_to_image,
    save_image,
)


def _layout(rng, n=3):
    bbox = np.stack(
        [
            rng.uniform(0.3, 0.7, n),
            rng.uniform(0.3, 0.7, n),
            rng.uniform(0.2, 0.4, n),
            rng.uniform(0.2, 0.4, n),
        ],
        axis=-1,
    ).astype(np.float32)
    label = rng.randint(0, 5, n)
    return bbox, label


def test_rect_mode_basic(rng):
    bbox, label = _layout(rng)
    img = convert_layout_to_image(
        bbox, label, category_colors(5), canvas_size=(80, 120)
    )
    assert img.size == (80, 120)
    # something was drawn (not all white)
    assert np.asarray(img).std() > 0


def test_real_image_mode_pastes_patches(rng):
    """Synthetic screenshot fixture: the background shows through outside
    boxes and each element area holds its (solid-color) pasted patch."""
    bbox = np.array([[0.5, 0.25, 0.5, 0.3], [0.5, 0.75, 0.5, 0.3]], np.float32)
    label = np.array([0, 1])
    W, H = 64, 96
    bg = Image.new("RGB", (32, 48), (10, 200, 10))  # green screenshot
    patches = [
        Image.new("RGB", (10, 10), (255, 0, 0)),  # red element
        Image.new("RGB", (10, 10), (0, 0, 255)),  # blue element
    ]
    img = convert_layout_to_image(
        bbox,
        label,
        category_colors(5),
        canvas_size=(W, H),
        resources={"img_bg": bg, "cropped_patches": patches},
    )
    arr = np.asarray(img)
    # background visible at the left edge (outside both boxes)
    assert tuple(arr[H // 2, 2]) == (10, 200, 10)
    # first element's patch is red at its center, second blue
    assert arr[int(0.25 * H), W // 2][0] > 200 and arr[int(0.25 * H), W // 2][2] < 50
    assert arr[int(0.75 * H), W // 2][2] > 200 and arr[int(0.75 * H), W // 2][0] < 50


def test_real_image_mode_patch_indexing_survives_area_sort(rng):
    """Patches are indexed by original element order even though drawing is
    area-sorted (reference keeps `i` from the pre-sorted list)."""
    # element 0 is SMALLER than element 1 -> drawn last
    bbox = np.array([[0.25, 0.5, 0.2, 0.2], [0.75, 0.5, 0.4, 0.4]], np.float32)
    label = np.array([0, 1])
    bg = Image.new("RGB", (32, 48), (0, 0, 0))
    patches = [
        Image.new("RGB", (8, 8), (255, 0, 0)),
        Image.new("RGB", (8, 8), (0, 0, 255)),
    ]
    img = convert_layout_to_image(
        bbox, label, category_colors(5), (100, 100),
        resources={"img_bg": bg, "cropped_patches": patches},
    )
    arr = np.asarray(img)
    assert arr[50, 25][0] > 200  # small left element red
    assert arr[50, 75][2] > 200  # large right element blue


def test_save_image_batch_resources(tmp_path, rng):
    bbox, label = _layout(rng, n=2)
    layouts = {
        "bbox": bbox[None],
        "label": label[None],
        "mask": np.ones((1, 2), bool),
    }
    out = tmp_path / "grid.png"
    save_image(
        layouts,
        str(out),
        num_categories=5,
        canvas_size=(40, 60),
        batch_resources={
            "img_bg": [Image.new("RGB", (20, 30), (1, 2, 3))],
            "cropped_patches": [
                [Image.new("RGB", (5, 5), (9, 9, 9)) for _ in range(2)]
            ],
        },
    )
    assert out.exists() and Image.open(out).size[0] > 0


def test_save_image_names(tmp_path, rng):
    bbox, label = _layout(rng)
    layouts = {
        "bbox": bbox[None],
        "label": label[None],
        "mask": np.ones((1, 3), bool),
    }
    out = tmp_path / "named.png"
    save_image(
        layouts, str(out), num_categories=5, canvas_size=(80, 120),
        names=[f"cat{i}" for i in range(5)],
    )
    assert out.exists()
