"""Bbox coordinate quantization — tokenizer as data, not objects.

Re-design of `helpers/bbox_tokenizer.py:28-221`: instead of sklearn model
objects queried per coordinate on host, the tokenizer is a (4, num_bins)
array of sorted bin centers plus static offset/permutation metadata.  Encode
is one vectorized nearest-center argmin (or the closed-form linear rounding),
decode is one gather — both pure jnp, vmap/jit-safe, and runnable inside a
compiled sampler.

Semantics parity:
* linear: x,y ∈ [0, 1-d] rounded to 32 uniform bins; w,h ∈ [d, 1] shifted by
  d (`bbox_tokenizer.py:88-91`, decode `:141-146`).
* kmeans/percentile: nearest of 32 per-coordinate 1-D cluster centers,
  sorted ascending (`bbox_tokenizer.py:93-103`, sort at `:62-68`).
* shared_bbox_vocab "x-y-w-h" adds per-coordinate offsets of num_bins
  (`bbox_tokenizer.py:17-20,105-108`); var_order permutes the coordinate
  columns (`:110-113`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

VAR_NAMES = ("x", "y", "w", "h")

# per-coordinate vocabulary offsets (in units of num_bins) when the four
# coordinates do not share one vocabulary (`bbox_tokenizer.py:17-20`)
KEY_MULT = {
    "x-y-w-h": {"x": 0, "y": 1, "w": 2, "h": 3},
    "xywh": {"x": 0, "y": 0, "w": 0, "h": 0},
}


def linear_centers(num_bins: int) -> np.ndarray:
    """(4, num_bins) uniform-grid centers (`bbox_tokenizer.py:71-82`)."""
    d = 1.0 / num_bins
    xy = np.linspace(0.0, 1.0 - d, num_bins)
    wh = np.linspace(d, 1.0, num_bins)
    return np.stack([xy, xy, wh, wh]).astype(np.float32)


@dataclass(frozen=True)
class BboxTokenizer:
    """Immutable quantizer for (..., 4) xywh boxes."""

    num_bins: int
    var_order: Tuple[str, ...] = VAR_NAMES  # order of coords in the token seq
    shared_vocab: str = "xywh"
    quantization: str = "linear"
    # (4, num_bins) float32, rows in canonical x,y,w,h order, sorted ascending
    centers: np.ndarray = None

    def __post_init__(self):
        assert self.shared_vocab in KEY_MULT
        assert self.quantization in ("linear", "kmeans", "percentile")
        if self.centers is None:
            object.__setattr__(self, "centers", linear_centers(self.num_bins))
        assert self.centers.shape == (4, self.num_bins)

    # ---- static index metadata -------------------------------------------
    @property
    def offsets(self) -> np.ndarray:
        """(4,) vocab offset per canonical coordinate."""
        mult = KEY_MULT[self.shared_vocab]
        return np.array(
            [mult[k] * self.num_bins for k in VAR_NAMES], dtype=np.int32
        )

    @property
    def order_perm(self) -> np.ndarray:
        """canonical xywh column -> position in var_order (encode gather)."""
        return np.array(
            [VAR_NAMES.index(k) for k in self.var_order], dtype=np.int32
        )

    @property
    def inv_order_perm(self) -> np.ndarray:
        return np.array(
            [self.var_order.index(k) for k in VAR_NAMES], dtype=np.int32
        )

    @property
    def vocab_len(self) -> int:
        n_vocab = len(set(KEY_MULT[self.shared_vocab].values()))
        return self.num_bins * n_vocab

    # ---- encode / decode --------------------------------------------------
    def encode(self, bbox: jnp.ndarray) -> jnp.ndarray:
        """(..., 4) float xywh -> (..., 4) int token ids (w/ offsets, ordered)."""
        if self.quantization == "linear":
            d = 1.0 / self.num_bins
            xy = jnp.clip(bbox[..., :2], 0.0, 1.0 - d)
            wh = jnp.clip(bbox[..., 2:], d, 1.0) - d
            q = jnp.concatenate([xy, wh], axis=-1)
            idx = jnp.round(self.num_bins * q).astype(jnp.int32)
        else:
            # nearest sorted center per coordinate; centers: (4, nbins)
            centers = jnp.asarray(self.centers)  # (4, nbins)
            dist = jnp.abs(bbox[..., :, None] - centers)  # (..., 4, nbins)
            idx = jnp.argmin(dist, axis=-1).astype(jnp.int32)
        idx = idx + jnp.asarray(self.offsets)
        return idx[..., jnp.asarray(self.order_perm)]

    def decode(self, ids: jnp.ndarray) -> jnp.ndarray:
        """(..., 4) int token ids -> (..., 4) float xywh."""
        arr = ids[..., jnp.asarray(self.inv_order_perm)]
        arr = arr - jnp.asarray(self.offsets)
        arr = jnp.clip(arr, 0, self.num_bins - 1)  # avoid OOV
        if self.quantization == "linear":
            d = 1.0 / self.num_bins
            xy = arr[..., :2].astype(jnp.float32) * d
            wh = (arr[..., 2:] + 1).astype(jnp.float32) * d
            return jnp.concatenate([xy, wh], axis=-1)
        centers = jnp.asarray(self.centers)  # (4, nbins)
        vals = jnp.take_along_axis(
            jnp.broadcast_to(centers, arr.shape[:-1] + centers.shape),
            arr[..., None],
            axis=-1,
        )[..., 0]
        return jnp.clip(vals, 0.0, 1.0)

    # ---- legality masks ---------------------------------------------------
    def token_masks(self) -> Dict[str, np.ndarray]:
        """Per-coordinate legality over the bbox vocab
        (`bbox_tokenizer.py:198-216`)."""
        masks = {}
        if self.shared_vocab == "xywh":
            for key in self.var_order:
                masks[key] = np.full((self.num_bins,), True)
        else:
            S = self.num_bins * 4
            for key in self.var_order:
                m = np.full((S,), False)
                i = KEY_MULT["x-y-w-h"][key]
                m[i * self.num_bins : (i + 1) * self.num_bins] = True
                masks[key] = m
        return masks


def load_kmeans_centers(
    path: str, num_bins: int, keys: Tuple[str, ...] = VAR_NAMES
) -> np.ndarray:
    """Load per-coordinate cluster centers.

    Supports (a) ``.npz`` with arrays named ``{key}-{num_bins}`` and (b) the
    reference's pickle of sklearn-like objects exposing ``cluster_centers_``
    (`bbox_tokenizer.py:52-70`).  Centers are sorted ascending, matching the
    reference's in-place sort.
    """
    rows = []
    if path.endswith(".npz"):
        data = np.load(path)
        for k in keys:
            rows.append(np.sort(np.asarray(data[f"{k}-{num_bins}"]).reshape(-1)))
    else:
        models = _tolerant_unpickle(path)
        for k in keys:
            m = models[f"{k}-{num_bins}"]
            centers = (
                m.cluster_centers_
                if hasattr(m, "cluster_centers_")
                else m.__dict__["cluster_centers_"]
            )
            rows.append(np.sort(np.asarray(centers).reshape(-1)))
    return np.stack(rows).astype(np.float32)


def _tolerant_unpickle(path: str):
    """Unpickle the reference's clustering weights WITHOUT sklearn.

    The reference pickles sklearn KMeans objects (`bbox_tokenizer.py:56-58`);
    we only need their ``cluster_centers_`` arrays, so unknown classes are
    replaced by attribute buckets during load.
    """
    import io
    import pickle

    class _Bucket:
        def __setstate__(self, state):
            if isinstance(state, dict):
                self.__dict__.update(state)

    class _TolerantUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return type(name, (_Bucket,), {"__module__": module})

    with open(path, "rb") as f:
        return _TolerantUnpickler(f).load()
