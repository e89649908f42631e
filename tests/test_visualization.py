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


def test_get_original_resources(tmp_path, rng):
    """Crops element patches from the source screenshot and whites them out
    in the background copy (`rico.py:178-216`)."""
    from layoutdm_tpu.utils.visualization import get_original_resources

    W, H = 40, 60
    img = Image.new("RGB", (W, H), (0, 0, 200))  # blue screenshot
    # a red element region that the patch should capture
    for x in range(8, 16):
        for y in range(12, 24):
            img.putpixel((x, y), (200, 0, 0))
    (tmp_path / "imgs").mkdir()
    img.save(tmp_path / "imgs" / "7.jpg")

    bbox = np.array([[0.3, 0.3, 0.2, 0.2]], np.float32)  # covers the red area
    res = get_original_resources(
        str(tmp_path / "imgs"), ["7.json"], [bbox]
    )
    assert len(res["img_bg"]) == 1 and len(res["cropped_patches"][0]) == 1
    patch = np.asarray(res["cropped_patches"][0][0])
    assert patch.shape[0] > 0 and patch[..., 0].mean() > 100  # reddish
    # background whited out where the element was
    bg = np.asarray(res["img_bg"][0])
    assert (bg[18, 12] > 240).all()
    # original untouched
    orig = np.asarray(res["img_original"][0])
    assert orig[18, 12, 2] > 100 or orig[18, 12, 0] > 100


def test_render_cli_real_image_mode(tmp_path):
    """`render_cli --image_dir` renders the test-split GT over real
    screenshots end-to-end (fixture archive + synthetic jpgs)."""
    import os
    import pickle

    from layoutdm_tpu.configs import build_train_config, to_dict
    from layoutdm_tpu.data.datasets import load_dataset
    from layoutdm_tpu.render_cli import main as render_main
    from tests.test_parser_vs_reference import make_rico_fixture

    raw_dir = tmp_path / "datasets" / "rico25-max25" / "raw"
    os.makedirs(raw_dir)
    make_rico_fixture(
        str(raw_dir / "rico_dataset_v0.1_semantic_annotations.zip"),
        n_screens=20,
    )
    data_dir = str(tmp_path / "datasets")
    test = load_dataset("rico25", data_dir, "test", 25)
    assert test.names is not None

    img_dir = tmp_path / "combined"
    img_dir.mkdir()
    for n in test.names:
        Image.new("RGB", (36, 64), (30, 120, 30)).save(
            img_dir / str(n).replace(".json", ".jpg")
        )

    cfg = build_train_config("layoutdm", "rico25", [f"job_dir={tmp_path}"])
    cfg.dataset.dir = data_dir
    res = {
        "results": [
            (test.bbox[i][test.mask[i]], test.label[i][test.mask[i]])
            for i in range(len(test))
        ],
        "train_cfg": to_dict(cfg),
        "test_cfg": {},
    }
    pkl = tmp_path / "c_test_seed_0.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(res, f)

    out_dir = str(tmp_path / "render")
    render_main(
        [str(pkl), "--out_dir", out_dir, "--image_dir", str(img_dir),
         "--num_samples", "4"]
    )
    real = os.path.join(out_dir, "real_gt.png")
    assert os.path.exists(real)
    arr = np.asarray(Image.open(real))
    # screenshot green must appear somewhere in the composited grid
    assert ((arr[..., 1] > 100) & (arr[..., 0] < 60)).any()
