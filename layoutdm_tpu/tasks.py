"""Conditional-generation task builders.

Re-design of `helpers/task.py:27-248`: each of the six tasks (unconditional,
c, cwh, partial, refinement, relation) is realized by building a token-level
condition — values + masks — that the compiled sampler consumes as pure
masked ops.  ``get_cond`` mirrors the reference's task semantics on dense
(label, bbox, mask) batches; ``to_sampler_cond`` lowers the dict into the
static-shape `SamplerCond` struct (including the refinement weak-logit prior
and the PAD-suppression mask that the reference computes inside its sampling
loop at `base.py:272-284`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from layoutdm_tpu.configs import SamplingConfig
from layoutdm_tpu.models.diffusion.sampler import SamplerCond
from layoutdm_tpu.ops.masking import batch_topk_mask, sample_mask
from layoutdm_tpu.tokenizer.sequence import LayoutSequenceTokenizer

MAX_PARTIAL_RATIO = 0.3  # `task.py:15`
COND_TYPES = ("c", "cwh", "partial", "gt", "random", "refinement", "relation")


def get_cond(
    rng: jax.Array,
    batch: Dict[str, jnp.ndarray],  # dense {label, bbox, mask}
    tokenizer: LayoutSequenceTokenizer,
    cond_type: str = "c",
    model_type: str = "LayoutDM",
) -> Dict[str, Any]:
    """Build the task condition from a ground-truth batch (`task.py:27-151`).

    Only the no-BOS layout (diffusion / one-shot models) is handled here; AR
    models re-pack conditions themselves (`bart.py:184-212`).
    """
    assert cond_type in COND_TYPES
    pad_id = tokenizer.name_to_id("pad")
    # -1 sentinel when the vocabulary has no [MASK] (`task.py:41`)
    mask_id = (
        tokenizer.name_to_id("mask")
        if "mask" in tokenizer.special_tokens
        else -1
    )
    C = tokenizer.N_var_per_element
    has_bos = "bos" in tokenizer.special_tokens
    start = 1 if has_bos else 0  # BOS column offset (`task.py:63,97-99`)

    cond = dict(tokenizer.encode(batch))
    elem_mask = jnp.asarray(batch["mask"], dtype=bool)
    B = cond["seq"].shape[0]
    S = cond["seq"].shape[1]

    if cond_type == "partial":
        # keep a random <=30% prefix-worth of valid elements (`task.py:62-92`)
        n_elem = (S - start) // C
        r_scores, r_topk = jax.random.split(rng)
        scores = jax.random.uniform(r_scores, (B, n_elem))
        mask_e = cond["mask"][:, start::C]
        n_valid = mask_e.sum(axis=1)
        vmax = jnp.maximum(
            ((n_valid - 1) * MAX_PARTIAL_RATIO).astype(jnp.int32), 1
        )
        topk = jax.random.randint(r_topk, (B,), 1, 10_000) % vmax + 1
        topk = jnp.minimum(topk, jnp.maximum(n_valid, 1))
        keep_e, _ = batch_topk_mask(scores, topk, mask=mask_e)
        keep = jnp.repeat(keep_e, C, axis=1)
        if has_bos:
            # order-sensitive models: shift kept tokens to the front
            # (`task.py:79-89`) — one stable argsort-partition, no host loop
            keep_full = jnp.concatenate(
                [jnp.ones((B, 1), bool), keep], axis=1
            )
            order = jnp.argsort(~keep_full, axis=1, stable=True)
            compacted = jnp.take_along_axis(cond["seq"], order, axis=1)
            counts = keep_full.sum(axis=1, keepdims=True)
            new_mask = jnp.arange(keep_full.shape[1])[None, :] < counts
            cond["seq"] = jnp.where(new_mask, compacted, mask_id)
            cond["mask"] = new_mask
        else:
            cond["seq"] = jnp.where(keep, cond["seq"], mask_id)
            cond["mask"] = keep

    elif cond_type in ("c", "cwh", "relation"):
        given = {"c": ("c",), "cwh": ("c", "w", "h"), "relation": ("c",)}[
            cond_type
        ]
        attr_ind = (jnp.arange(S) - start) % C
        keep = jnp.zeros((B, S), dtype=bool)
        for name in given:
            keep = keep | (attr_ind == tokenizer.var_names.index(name))[None, :]
        if has_bos:
            keep = keep.at[:, 0].set(True)
        seq = jnp.where(keep, cond["seq"], mask_id)
        # element count is known: write PAD into empty elements
        seq = jnp.where(cond["mask"], seq, pad_id)
        cond["seq"] = seq
        cond["mask"] = (cond["mask"] & keep) | ~cond["mask"]

    elif cond_type == "gt":
        pass

    elif cond_type == "random":
        r_ratio, r_mask = jax.random.split(rng)
        ratio = jax.random.uniform(r_ratio, (B,))
        loss_mask = sample_mask(r_mask, jnp.ones((B, S), bool), ratio)
        cond["seq"] = jnp.where(loss_mask, mask_id, cond["seq"])
        cond["mask"] = ~loss_mask

    elif cond_type == "refinement":
        # category kept, position/size re-encoded from noisy boxes
        # (`task.py:126-140`)
        noise = 0.1 * jax.random.normal(rng, jnp.asarray(batch["bbox"]).shape)
        noisy = tokenizer.encode(
            {
                "label": batch["label"],
                "bbox": jnp.asarray(batch["bbox"]) + noise,
                "mask": batch["mask"],
            }
        )
        idx = (jnp.arange(S) - start) % C
        keep = (noisy["mask"] & (idx == 0)[None, :]) | ~noisy["mask"]
        if has_bos:
            keep = keep.at[:, 0].set(True)
        if model_type in ("LayoutDM", "ElemWiseAutoreg", "layoutdm", "autoreg",
                         "elem_wise_autoreg"):
            seq = jnp.where(keep, noisy["seq"], mask_id)
            seq = jnp.where(noisy["mask"], seq, pad_id)
        else:
            # one-shot refiners (RUITE) consume the full noisy encoding
            # (`task.py:139-140`)
            seq = noisy["seq"]
        cond = {
            "seq": seq,
            "mask": keep,
            "seq_orig": noisy["seq"],
        }

    cond["type"] = cond_type
    if cond_type in ("c", "cwh", "refinement", "relation"):
        cond["num_element"] = elem_mask.sum(axis=1)
    return cond


# ---------------------------------------------------------------------------
# refinement weak prior (`task.py:154-224`)
# ---------------------------------------------------------------------------


def smoothed_onehot_matrix(
    tokenizer: LayoutSequenceTokenizer,
    mode: str = "uniform",
    offset_ratio: float = 0.2,
) -> np.ndarray:
    """(Vf, Vf) prior kernel: identity plus, within each coordinate's
    sub-vocabulary, a neighborhood defined on the bin CENTERS
    (`task.py:154-201`)."""
    assert mode in ("uniform", "gaussian", "negative")
    V = tokenizer.N_total
    N = tokenizer.N_bbox_per_var
    logits = np.eye(V, dtype=np.float32)

    bb = tokenizer.bbox_tokenizer
    for i, key in enumerate(bb.var_order):
        if tokenizer.bbox_tokenizer.shared_vocab == "xywh":
            sl = slice(tokenizer.N_category, tokenizer.N_category + N)
        else:
            mult = ("x", "y", "w", "h").index(key)
            sl = slice(
                tokenizer.N_category + mult * N,
                tokenizer.N_category + (mult + 1) * N,
            )
        canonical = ("x", "y", "w", "h").index(key)
        centers = bb.centers[canonical]
        ii, jj = np.meshgrid(centers, centers, indexing="ij")
        if mode == "uniform":
            block = (np.abs(ii - jj) < offset_ratio).astype(np.float32)
        elif mode == "negative":
            block = (np.abs(ii - jj) >= offset_ratio).astype(np.float32)
        else:  # gaussian
            block = -1.0 * (ii - jj) ** 2
        logits[sl, sl] = block
    return logits


def refinement_weak_logits(
    cond: Dict[str, Any],
    tokenizer: LayoutSequenceTokenizer,
    sampling: SamplingConfig,
) -> jnp.ndarray:
    """(B, S, Vf) additive prior for refinement (`task.py:204-224`)."""
    w = sampling.refine_lambda
    if sampling.refine_mode == "negative":
        w = -w
    table = smoothed_onehot_matrix(
        tokenizer, mode=sampling.refine_mode,
        offset_ratio=sampling.refine_offset_ratio,
    )
    return jnp.asarray(table)[cond["seq_orig"]] * w


# ---------------------------------------------------------------------------
# lowering to the compiled sampler's input struct
# ---------------------------------------------------------------------------


def to_sampler_cond(
    cond: Optional[Dict[str, Any]],
    tokenizer: LayoutSequenceTokenizer,
    sampling: SamplingConfig,
    batch_size: Optional[int] = None,
) -> SamplerCond:
    """Lower a task cond dict into `SamplerCond`.

    With ``cond=None`` (unconditional) an all-no-op cond is returned.  When
    the cond holds a single example but ``batch_size > 1`` it is broadcast,
    mirroring `duplicate_cond` (`task.py:235-248`).
    """
    V = tokenizer.N_total
    S = tokenizer.max_token_length
    if cond is None:
        assert batch_size is not None
        return SamplerCond.empty(batch_size, S, V)

    seq = jnp.asarray(cond["seq"], jnp.int32)
    strong = jnp.asarray(cond["mask"], bool)
    B = seq.shape[0]
    if batch_size and B == 1 and batch_size > 1:
        seq = jnp.repeat(seq, batch_size, axis=0)
        strong = jnp.repeat(strong, batch_size, axis=0)
        B = batch_size

    ctype = cond.get("type", "gt")
    pad_id = tokenizer.name_to_id("pad")
    C = tokenizer.N_var_per_element

    weak_logits = jnp.zeros((B, S, V), jnp.float32)
    weak_mask = jnp.zeros((B, S), bool)
    if ctype == "refinement":
        wl = refinement_weak_logits(cond, tokenizer, sampling)
        if wl.shape[0] == 1 and B > 1:
            wl = jnp.repeat(wl, B, axis=0)
        weak_logits = wl
        weak_mask = ~strong

    pad_suppress = jnp.zeros((B, S), bool)
    if ctype in ("c", "cwh", "refinement", "relation"):
        start = 1 if "bos" in tokenizer.special_tokens else 0
        attr_idx = (jnp.arange(S) - start) % C
        pad_suppress = (attr_idx != 0)[None, :] & (seq != pad_id)
        if start:
            pad_suppress = pad_suppress.at[:, 0].set(False)

    return SamplerCond(
        seq=seq,
        strong_mask=strong,
        weak_logits=weak_logits,
        weak_mask=weak_mask,
        pad_suppress=pad_suppress,
        init_from_seq=True,
    )
