"""Relation-constraint gradient guidance, INSIDE the compiled sampler.

Re-design of `categorical_diffusion/logit_adjustment.py:16-126`: the
reference mutates a torch Parameter with an SGD optimizer inside a no-grad
sampling loop; here the same Eq.7 update is K steps of ``jax.grad`` w.r.t.
the step's log-probs — a pure function compiled into the sampling scan, so
relation-conditioned generation costs one XLA dispatch like every other task.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from layoutdm_tpu.configs import SamplingConfig
from layoutdm_tpu.relation.const import relation_losses
from layoutdm_tpu.tokenizer.sequence import LayoutSequenceTokenizer


class RelationData(NamedTuple):
    """Static padded relation graph for a batch (canvas = element 0)."""

    edge_index: jnp.ndarray  # (B, E, 2)
    edge_attr: jnp.ndarray  # (B, E)
    edge_mask: jnp.ndarray  # (B, E)
    src_is_canvas: jnp.ndarray  # (B, E)

    @classmethod
    def from_batch(cls, batch: dict) -> "RelationData":
        """Build from a transformed batch (AddCanvasElement +
        AddRelationConstraints applied)."""
        ei = jnp.asarray(batch["edge_index"], jnp.int32)
        label = jnp.asarray(batch["label"], jnp.int32)
        src_label = jnp.take_along_axis(label, ei[..., 0], axis=1)
        return cls(
            edge_index=ei,
            edge_attr=jnp.asarray(batch["edge_attr"], jnp.int32),
            edge_mask=jnp.asarray(batch["edge_mask"], bool),
            src_is_canvas=src_label == 0,
        )


def quantized_canvas_bbox(tokenizer: LayoutSequenceTokenizer) -> np.ndarray:
    """The canvas box [0.5,0.5,1,1] after encode->decode quantization —
    computed eagerly (host) so it is a constant under jit."""
    bb = tokenizer.bbox_tokenizer
    return np.asarray(
        bb.decode(bb.encode(jnp.asarray([[0.5, 0.5, 1.0, 1.0]])))
    ).reshape(1, 1, 4)


def expected_bbox(
    log_prob: jnp.ndarray,  # (B, S_tok, Vf)
    tokenizer: LayoutSequenceTokenizer,
    elem_mask: jnp.ndarray,  # (B, S_elem) valid (non-PAD) elements
    canvas: np.ndarray = None,  # (1, 1, 4); computed eagerly if omitted
    mode: str = "average",
    tau: float = 1.0,
    rng: Optional[jax.Array] = None,  # required for mode="gumbel"
) -> jnp.ndarray:
    """Differentiable decode of per-coordinate bin logits to bbox coords
    (`logit_adjustment.py:16-85`).

    mode="average": per coordinate, softmax the logits over that
    coordinate's bin sub-vocabulary and take the expectation of the bin
    centers.  mode="gumbel": straight-through gumbel-softmax hard sample
    over the bins (torch `F.gumbel_softmax(..., tau=tau, hard=True)`,
    `logit_adjustment.py:74-75`) — the forward value is one sampled bin
    center, the gradient flows through the relaxed softmax.  The reference's
    own comment says gumbel "did not work at all"; it is kept for knob
    parity.  Returns (B, S_elem+1, 4) with the canvas box prepended (the
    reference gumbel-samples the canvas from its log-one-hot logits too, but
    the ~69-nat lane gap makes a flip impossible in float32, so the constant
    quantized canvas is exact)."""
    if mode not in ("average", "gumbel"):
        raise ValueError(
            f"relation_mode must be 'average' or 'gumbel', got {mode!r}"
        )
    if mode == "gumbel" and rng is None:
        raise ValueError("mode='gumbel' requires an rng key")
    C = tokenizer.N_var_per_element
    B, S_tok, Vf = log_prob.shape
    S = S_tok // C
    bb = tokenizer.bbox_tokenizer

    # (B, S, C, Vf) view: the per-coordinate logits become STATIC slices of
    # a reshape instead of strided slices of log_prob — the strided form's
    # backward is a TPU scatter (x3 grad steps x4 coords inside the sampling
    # scan), the reshape+slice form's backward is a cheap zero-pad
    lp4 = log_prob.reshape(B, S, C, Vf)

    coords = []
    for k, key in enumerate(bb.var_order):
        sl = tokenizer.get_slice(key)
        logits = lp4[:, :, k + 1, sl]  # (B, S, nbins)
        if mode == "gumbel":
            g = jax.random.gumbel(
                jax.random.fold_in(rng, k), logits.shape, logits.dtype
            )
            y_soft = jax.nn.softmax((logits + g) / tau, axis=-1)
            y_hard = jax.nn.one_hot(
                jnp.argmax(y_soft, axis=-1), logits.shape[-1],
                dtype=y_soft.dtype,
            )
            # straight-through: hard forward, soft backward
            probs = y_hard + y_soft - jax.lax.stop_gradient(y_soft)
        else:
            probs = jax.nn.softmax(logits, axis=-1)
        canonical = ("x", "y", "w", "h").index(key)
        centers = jnp.asarray(bb.centers[canonical])
        coords.append((probs * centers).sum(-1))
    # re-assemble to canonical xywh order
    order = [tuple(bb.var_order).index(k) for k in ("x", "y", "w", "h")]
    elem = jnp.stack([coords[i] for i in order], axis=-1)  # (B, S, 4)
    elem = jnp.where(elem_mask[..., None], elem, 0.0)

    if canvas is None:
        canvas = quantized_canvas_bbox(tokenizer)
    canvas = jnp.asarray(canvas)
    return jnp.concatenate([jnp.broadcast_to(canvas, (B, 1, 4)), elem], axis=1)


def make_relation_guidance(
    tokenizer: LayoutSequenceTokenizer,
    sampling: SamplingConfig,
    rel: Optional[RelationData] = None,
    rng: Optional[jax.Array] = None,
):
    """Returns ``guidance_fn(model_log_prob, t, cond)`` for the sampler.

    Eq.7: K = relation_num_update gradient steps with step size
    relation_lambda on the mean of the 14 constraint penalties; active only
    for t >= 10 (`logit_adjustment.py:107`).

    ``sampling.relation_mode`` selects the differentiable decode —
    "average" (expectation of bin centers, the reference default) or
    "gumbel" (straight-through hard sample at temperature
    ``sampling.relation_tau``, `logit_adjustment.py:74-75`); any other
    value raises.  Gumbel noise is derived from ``rng`` (default
    ``PRNGKey(0)``) folded with the diffusion timestep and the update
    iteration, so each of the K updates at each step resamples — fresh
    noise per call like the reference — while the closure stays a pure
    function of its inputs (one compiled sampler per run).

    The constraint graph is read from ``cond.relation`` (falling back to the
    optional ``rel`` argument), so the returned closure is stable across
    batches — one compiled sampler per run, not per batch.
    """
    K = sampling.relation_num_update
    lr = sampling.relation_lambda
    mode = sampling.relation_mode
    tau = sampling.relation_tau
    if mode not in ("average", "gumbel"):
        raise ValueError(
            "sampling.relation_mode must be 'average' or 'gumbel', got "
            f"{mode!r}"
        )
    pad_id = tokenizer.name_to_id("pad")
    C = tokenizer.N_var_per_element
    canvas = quantized_canvas_bbox(tokenizer)
    base_key = rng if rng is not None else jax.random.PRNGKey(0)

    def loss_fn(log_prob, elem_mask, r: RelationData, key):
        bbox_all = expected_bbox(
            log_prob, tokenizer, elem_mask, canvas,
            mode=mode, tau=tau, rng=key,
        )
        losses = relation_losses(
            bbox_all, r.edge_index, r.edge_attr, r.edge_mask,
            r.src_is_canvas,
        )
        return losses.mean()

    grad_fn = jax.grad(loss_fn)

    def guidance(model_log_prob, t, cond):
        r = cond.relation if getattr(cond, "relation", None) is not None \
            else rel
        if r is None:
            return model_log_prob
        if not isinstance(r, RelationData):
            r = RelationData(*r)
        elem_mask = cond.seq[:, ::C] != pad_id
        step_key = jax.random.fold_in(base_key, t)

        def do_update(lp):
            def body(k, lp):
                key = jax.random.fold_in(step_key, k)
                return lp - lr * grad_fn(lp, elem_mask, r, key)

            return jax.lax.fori_loop(0, K, body, lp)

        return jax.lax.cond(
            t >= 10, do_update, lambda lp: lp, model_log_prob
        )

    return guidance
