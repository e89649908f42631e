"""Layout rendering — PIL, host-side (`helpers/visualization.py:17-371`).

Renders decoded layouts as translucent colored rectangles (area-sorted so
small elements stay visible), grid montages, label cards, and GIFs of the
intermediate diffusion states.  Colors follow a deterministic HSV wheel per
category (the reference samples a seaborn palette; any stable palette works).
"""

from __future__ import annotations

import colorsys
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image, ImageDraw, ImageFont

    HAS_PIL = True
except Exception:  # pragma: no cover
    HAS_PIL = False


def category_colors(n: int) -> List[Tuple[int, int, int]]:
    cols = []
    for i in range(n):
        r, g, b = colorsys.hsv_to_rgb(i / max(n, 1), 0.65, 0.95)
        cols.append((int(r * 255), int(g * 255), int(b * 255)))
    return cols


def convert_layout_to_image(
    bbox: np.ndarray,  # (N, 4) xywh
    label: np.ndarray,  # (N,)
    colors: Sequence[Tuple[int, int, int]],
    canvas_size: Tuple[int, int] = (360, 520),
) -> "Image.Image":
    """One layout -> PIL image (`visualization.py:17-63`): draw large areas
    first, translucent fill + solid outline."""
    assert HAS_PIL, "Pillow not available"
    W, H = canvas_size
    img = Image.new("RGBA", (W, H), (255, 255, 255, 255))
    draw = ImageDraw.Draw(img, "RGBA")
    if len(label):
        area = bbox[:, 2] * bbox[:, 3]
        order = np.argsort(-area)
        for i in order:
            x, y, w, h = bbox[i]
            l, t = (x - w / 2) * W, (y - h / 2) * H
            r, b = (x + w / 2) * W, (y + h / 2) * H
            c = colors[int(label[i]) % len(colors)]
            draw.rectangle([l, t, r, b], fill=c + (100,), outline=c + (255,),
                           width=2)
    return img.convert("RGB")


def save_image(
    layouts: Dict[str, np.ndarray],  # {bbox (B,S,4), label (B,S), mask (B,S)}
    out_path: str,
    num_categories: int,
    canvas_size: Tuple[int, int] = (360, 520),
    ncols: Optional[int] = None,
) -> None:
    """Batch -> grid montage (`visualization.py:66-115`)."""
    colors = category_colors(num_categories)
    bbox = np.asarray(layouts["bbox"])
    label = np.asarray(layouts["label"])
    mask = np.asarray(layouts["mask"])
    B = bbox.shape[0]
    imgs = [
        convert_layout_to_image(
            bbox[i][mask[i]], label[i][mask[i]], colors, canvas_size
        )
        for i in range(B)
    ]
    ncols = ncols or int(np.ceil(np.sqrt(B)))
    nrows = int(np.ceil(B / ncols))
    W, H = canvas_size
    pad = 4
    grid = Image.new(
        "RGB",
        (ncols * (W + pad) + pad, nrows * (H + pad) + pad),
        (220, 220, 220),
    )
    for i, im in enumerate(imgs):
        r, c = divmod(i, ncols)
        grid.paste(im, (pad + c * (W + pad), pad + r * (H + pad)))
    grid.save(out_path)


def save_gif(
    frames: List[Dict[str, np.ndarray]],
    out_path: str,
    num_categories: int,
    index: int = 0,
    canvas_size: Tuple[int, int] = (360, 520),
    duration_ms: int = 80,
) -> None:
    """Intermediate diffusion states -> GIF (`visualization.py:354-371`)."""
    colors = category_colors(num_categories)
    imgs = []
    for fr in frames:
        m = np.asarray(fr["mask"])[index]
        imgs.append(
            convert_layout_to_image(
                np.asarray(fr["bbox"])[index][m],
                np.asarray(fr["label"])[index][m],
                colors,
                canvas_size,
            )
        )
    imgs[0].save(
        out_path,
        save_all=True,
        append_images=imgs[1:],
        duration=duration_ms,
        loop=0,
    )
