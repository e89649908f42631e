"""Layout <-> flat token sequence.

Re-design of `helpers/layout_tokenizer.py:38-313` (LayoutTokenizer /
LayoutSequenceTokenizer) as a frozen spec whose encode/decode are pure jnp
on padded dense arrays (no ragged tensors, no python loops): a layout batch
{label (B,S), bbox (B,S,4), mask (B,S)} maps to one token sequence
``(c1 x1 y1 w1 h1 c2 ...)`` of length S*C (+1 if BOS), vocabulary

    [0, N_cat) categories | [N_cat, N_cat+N_bbox) bbox bins | specials

with MASK required to be the last id for diffusion models
(`models/layoutdm.py:46`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from layoutdm_tpu.tokenizer.bbox import BboxTokenizer

SPECIAL_TOKENS = ("pad", "bos", "eos", "mask")


@dataclass(frozen=True)
class LayoutSequenceTokenizer:
    bbox_tokenizer: BboxTokenizer
    num_categories: int
    max_elements: int  # dataset max_seq_length (elements per layout)
    special_tokens: Tuple[str, ...] = ("pad", "mask")
    pad_until_max: bool = False
    sort_by: Optional[str] = None  # None | "category_alphabetical"

    def __post_init__(self):
        for tok in self.special_tokens:
            assert tok in SPECIAL_TOKENS
        if "mask" in self.special_tokens:
            # MASK must be the final vocabulary id (`layout_tokenizer.py:61-62`)
            assert self.special_tokens.index("mask") == len(self.special_tokens) - 1

    # ---- vocab layout -----------------------------------------------------
    @property
    def N_category(self) -> int:
        return self.num_categories

    @property
    def N_bbox(self) -> int:
        return self.bbox_tokenizer.vocab_len

    @property
    def N_bbox_per_var(self) -> int:
        return self.bbox_tokenizer.num_bins

    @property
    def N_sp_token(self) -> int:
        return len(self.special_tokens)

    @property
    def N_total(self) -> int:
        return self.N_category + self.N_bbox + self.N_sp_token

    @property
    def N_var_per_element(self) -> int:
        return 1 + len(self.bbox_tokenizer.var_order)

    @property
    def var_names(self) -> Tuple[str, ...]:
        return ("c",) + tuple(self.bbox_tokenizer.var_order)

    @property
    def max_token_length(self) -> int:
        n = self.max_elements * self.N_var_per_element
        if "bos" in self.special_tokens:
            n += 1
        return n

    def name_to_id(self, name: str) -> int:
        assert name in self.special_tokens
        return self.N_category + self.N_bbox + self.special_tokens.index(name)

    def id_to_name(self, id_: int) -> str:
        return self.special_tokens[id_ - self.N_category - self.N_bbox]

    # ---- encode -----------------------------------------------------------
    def encode(self, inputs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """{label (B,S), bbox (B,S,4), mask (B,S)} -> {seq, mask}.

        Parity: `layout_tokenizer.py:208-253`.
        """
        label = jnp.asarray(inputs["label"], dtype=jnp.int32)
        mask = jnp.asarray(inputs["mask"], dtype=bool)
        bbox_ids = self.bbox_tokenizer.encode(jnp.asarray(inputs["bbox"]))
        C = self.N_var_per_element

        if self.pad_until_max:
            S0 = label.shape[1]
            padn = self.max_elements - S0
            if padn > 0:
                label = jnp.pad(label, ((0, 0), (0, padn)))
                bbox_ids = jnp.pad(bbox_ids, ((0, 0), (0, padn), (0, 0)))
                mask = jnp.pad(mask, ((0, 0), (0, padn)))

        bbox_ids = bbox_ids + self.N_category

        if "pad" in self.special_tokens:
            pad_id = self.name_to_id("pad")
            label = jnp.where(mask, label, pad_id)
            bbox_ids = jnp.where(mask[..., None], bbox_ids, pad_id)

        if self.sort_by == "category_alphabetical":
            order = jnp.argsort(label, axis=1, stable=True)
            label = jnp.take_along_axis(label, order, axis=1)
            bbox_ids = jnp.take_along_axis(bbox_ids, order[..., None], axis=1)
            mask = jnp.take_along_axis(mask, order, axis=1)

        B, S = label.shape
        seq = jnp.concatenate([label[..., None], bbox_ids], axis=-1)
        seq = seq.reshape(B, S * C)
        tok_mask = jnp.repeat(mask, C, axis=1)

        if "bos" in self.special_tokens and "eos" in self.special_tokens:
            seq_len = mask.sum(axis=1, keepdims=True)
            pos = jnp.arange(S * C)[None, :]
            seq = jnp.where(pos == seq_len * C, self.name_to_id("eos"), seq)
            bos = jnp.full((B, 1), self.name_to_id("bos"), dtype=seq.dtype)
            seq = jnp.concatenate([bos, seq], axis=-1)
            tok_mask = jnp.concatenate(
                [jnp.ones((B, 1), dtype=bool), tok_mask], axis=-1
            )

        return {"seq": seq.astype(jnp.int32), "mask": tok_mask}

    # ---- decode -----------------------------------------------------------
    def decode(self, ids: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """(B, S*C) token ids -> {bbox, label, mask}; corrupted elements are
        zeroed out and masked (`layout_tokenizer.py:255-266`).  If the
        tokenizer uses BOS, callers strip it before decode."""
        C = self.N_var_per_element
        B = ids.shape[0]
        ids = ids.reshape(B, -1, C)
        label, bbox_ids = ids[..., 0], ids[..., 1:] - self.N_category

        invalid = self._filter_eos(label)
        label_valid = (0 <= label) & (label < self.N_category)
        bbox_valid = jnp.all(
            (0 <= bbox_ids) & (bbox_ids < self.N_bbox), axis=-1
        )
        invalid = invalid | ~(label_valid & bbox_valid)

        bbox = self.bbox_tokenizer.decode(bbox_ids)
        label = jnp.where(invalid, 0, label)
        bbox = jnp.where(invalid[..., None], 0.0, bbox)
        return {"bbox": bbox, "label": label, "mask": ~invalid}

    def _filter_eos(self, label: jnp.ndarray) -> jnp.ndarray:
        if "bos" in self.special_tokens and "eos" in self.special_tokens:
            return jnp.cumsum(label == self.name_to_id("eos"), axis=1) > 0
        return jnp.zeros_like(label, dtype=bool)

    # ---- legality mask ----------------------------------------------------
    def token_mask(self) -> np.ndarray:
        """(max_token_length_wo_bos, N_total) legal-vocabulary mask per slot
        (`layout_tokenizer.py:269-294`).  BOS and MASK are never legal
        outputs."""
        bb = self.bbox_tokenizer.token_masks()
        last = np.array(
            [tok not in ("bos", "mask") for tok in self.special_tokens]
        )
        rows = []
        for key in self.var_names:
            if key == "c":
                row = np.concatenate(
                    [
                        np.full((self.N_category,), True),
                        np.full((self.N_bbox,), False),
                        last,
                    ]
                )
            else:
                row = np.concatenate(
                    [np.full((self.N_category,), False), bb[key], last]
                )
            rows.append(row)
        mask = np.stack(rows, axis=0)  # (C, N_total)
        return np.tile(mask, (self.max_elements, 1))

    def get_slice(self, name: str) -> slice:
        """Vocab id range of one attribute (`layout_tokenizer.py:296-313`)."""
        assert name == "special" or name in self.var_names
        if name == "special":
            return slice(self.N_category + self.N_bbox, self.N_total)
        if name == "c":
            return slice(0, self.N_category)
        start = self.N_category
        if self.bbox_tokenizer.shared_vocab == "x-y-w-h":
            start += ("x", "y", "w", "h").index(name) * self.N_bbox_per_var
        return slice(start, start + self.N_bbox_per_var)


@dataclass(frozen=True)
class LayoutDictTokenizer(LayoutSequenceTokenizer):
    """Layout -> DICT of sequences instead of one flat sequence
    (`layout_tokenizer.py:316-396`): {label (B,S[+1]), bbox ids (B,S[+1],4),
    mask}, with optional BOS/EOS rows for element-wise AR models."""

    def __post_init__(self):
        super().__post_init__()
        assert self.bbox_tokenizer.var_order == ("x", "y", "w", "h")
        assert self.bbox_tokenizer.shared_vocab == "xywh"

    def encode(self, inputs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        label = jnp.asarray(inputs["label"], jnp.int32)
        mask = jnp.asarray(inputs["mask"], bool)
        bbox = self.bbox_tokenizer.encode(jnp.asarray(inputs["bbox"]))
        if self.pad_until_max:
            padn = self.max_elements - label.shape[1]
            if padn > 0:
                label = jnp.pad(label, ((0, 0), (0, padn)))
                bbox = jnp.pad(bbox, ((0, 0), (0, padn), (0, 0)))
                mask = jnp.pad(mask, ((0, 0), (0, padn)))
        bbox = bbox + self.N_category
        if "pad" in self.special_tokens:
            pad_id = self.name_to_id("pad")
            label = jnp.where(mask, label, pad_id)
            bbox = jnp.where(mask[..., None], bbox, pad_id)
        out = {"label": label, "bbox": bbox, "mask": mask}
        if "bos" in self.special_tokens and "eos" in self.special_tokens:
            B, S = label.shape
            out = {
                "label": jnp.concatenate(
                    [jnp.full((B, 1), self.name_to_id("bos"), jnp.int32), label],
                    axis=1,
                ),
                "bbox": jnp.concatenate(
                    [jnp.zeros((B, 1, 4), bbox.dtype), bbox], axis=1
                ),
                "mask": jnp.concatenate(
                    [jnp.ones((B, 1), bool), mask], axis=1
                ),
            }
            pos = jnp.arange(S + 1)[None, :]
            n = out["mask"].sum(axis=1, keepdims=True)
            eos_here = pos == n
            out["label"] = jnp.where(
                eos_here, self.name_to_id("eos"), out["label"]
            )
            out["mask"] = out["mask"] | eos_here
        return out

    def decode(self, inputs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        label = jnp.asarray(inputs["label"])
        bbox_ids = jnp.asarray(inputs["bbox"]) - self.N_category
        invalid = (
            ~jnp.asarray(inputs["mask"], bool)
            if "mask" in inputs
            else jnp.zeros_like(label, dtype=bool)
        )
        invalid = invalid | self._filter_eos(label)
        label_valid = (0 <= label) & (label < self.N_category)
        bbox_valid = jnp.all(
            (0 <= bbox_ids) & (bbox_ids < self.N_bbox), axis=-1
        )
        invalid = invalid | ~(label_valid & bbox_valid)
        bbox = self.bbox_tokenizer.decode(bbox_ids)
        return {
            "bbox": jnp.where(invalid[..., None], 0.0, bbox),
            "label": jnp.where(invalid, 0, label),
            "mask": ~invalid,
        }
