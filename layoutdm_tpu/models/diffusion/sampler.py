"""The T-step reverse diffusion as ONE ``lax.scan`` — all tasks, one program.

Re-design of the reference's python sampling loop
(`categorical_diffusion/base.py:205-371`).  The key observation (SURVEY.md §7)
is that every conditional task is already a branch-free logit manipulation:

  * strong constraints  -> ``where(strong_mask, log_onehot(seq), p)``
    (`base.py:246-251`)
  * refinement prior    -> ``p + weak_mask * weak_logits`` (`base.py:254-258`)
  * relation guidance   -> K gradient-ascent steps on the logits
    (`logit_adjustment.py:88-126`), expressed with ``jax.grad`` inside the scan
  * PAD suppression     -> mask write of LOG_EPS (`base.py:272-284`)

so a single compiled scan serves unconditional / c / cwh / partial /
refinement (and relation, via an optional guidance closure).  The timestep
ladder (including T_eval < T_train skip-steps and the asymmetric
time-difference trick) is precomputed on host into static per-step arrays —
no data-dependent control flow remains.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from layoutdm_tpu.configs import SamplingConfig
from layoutdm_tpu.ops.log_math import LOG_EPS, log_onehot
from layoutdm_tpu.ops.samplers import sample_tokens, sample_tokens_per_row


@flax.struct.dataclass
class SamplerCond:
    """Standardized conditioning inputs for the compiled sampler.

    A no-op cond (all-False masks, zero weak logits) reproduces unconditional
    sampling, so one compiled program covers every task.  ``relation`` (an
    optional `relation.guidance.RelationData` pytree) carries the constraint
    graph as DATA, so one compiled sampler serves every relation batch.
    """

    seq: jnp.ndarray  # (B, S) int32 — user-specified token values
    strong_mask: jnp.ndarray  # (B, S) bool — hard replacement positions
    weak_logits: jnp.ndarray  # (B, S, V) f32 — additive prior (refinement)
    weak_mask: jnp.ndarray  # (B, S) bool — where the prior applies
    pad_suppress: jnp.ndarray  # (B, S) bool — forbid PAD here (#elems known)
    relation: Optional[tuple] = None  # RelationData pytree or None
    init_from_seq: bool = flax.struct.field(pytree_node=False, default=False)

    @classmethod
    def empty(cls, batch_size: int, seq_len: int, num_classes: int):
        B, S = batch_size, seq_len
        return cls(
            seq=jnp.zeros((B, S), jnp.int32),
            strong_mask=jnp.zeros((B, S), bool),
            weak_logits=jnp.zeros((B, S, num_classes), jnp.float32),
            weak_mask=jnp.zeros((B, S), bool),
            pad_suppress=jnp.zeros((B, S), bool),
            init_from_seq=False,
        )


def timestep_ladder(
    num_timesteps: int,
    num_timesteps_eval: Optional[int] = None,
    time_difference: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side schedule of (model_t, posterior_t) per reverse step.

    Parity: `base.py:310-315` (skip-step ladder), `base.py:218-240`
    (time-difference and the posterior-time selection).
    """
    T = num_timesteps
    T_eval = num_timesteps_eval or T
    assert T_eval <= T
    idxs = [int(i * T / T_eval) for i in range(T_eval - 1, -1, -1)]
    model_t, post_t = [], []
    prev = T
    for idx in idxs:
        skip = (prev - idx) - 1
        if time_difference > 0.0:
            noise = int(np.clip(idx - int(T * time_difference), 0, T - 1))
        else:
            noise = idx
        pt = noise - skip if (skip > 0 and noise > skip) else noise
        model_t.append(idx)
        post_t.append(pt)
        prev = idx
    return np.asarray(model_t, np.int32), np.asarray(post_t, np.int32)


def make_predict_start(apply_fn, num_classes: int):
    """Wrap the denoiser into p(x0|xt): log-softmax over non-MASK classes
    with the MASK lane pinned at -70 (`base.py:127-146`).

    Takes x_t as token IDS (B, S) — x_t is categorical throughout the chain,
    so no (B, S, V) one-hot ever needs to exist (round-1 VERDICT, weak #1).

    The denoiser may emit LANE-PADDED logits (`nn.use_vocab_pad`: width
    vocab_pad_target(V) with a -1e9 bias on MASK+pad lanes).  The
    log_softmax then runs over the padded width — exp(-1e9 - max)
    underflows to exactly 0 in f32, so the normalizer is identical — and
    the slice back to V-1 lanes happens AFTER that reduction, which keeps
    XLA from propagating the slice into the head GEMM and narrowing it
    back to the misaligned N (the slice-DCE pitfall, docs/DESIGN.md §5).
    """

    def predict_start(params, ids, t, rng=None):
        logits = apply_fn(params, ids, t, rng)  # (B, S, V) or (B, S, Vpad)
        if logits.shape[-1] == num_classes:
            out = logits[..., :-1]
            log_pred = jax.nn.log_softmax(out, axis=-1)
        else:
            log_pred = jax.nn.log_softmax(logits, axis=-1)[
                ..., : num_classes - 1
            ]
        mask_lane = jnp.full_like(log_pred[..., :1], -70.0)
        log_pred = jnp.concatenate([log_pred, mask_lane], axis=-1)
        return jnp.clip(log_pred, -70.0, 0.0)

    return predict_start


def sample_chain(
    params,
    predict_start: Callable,
    q,  # VanillaQ | ConstrainedQ (exposes q_posterior, num_classes)
    rng: jax.Array,
    cond: SamplerCond,
    sampling: SamplingConfig,
    pad_id: int,
    num_timesteps_eval: Optional[int] = None,
    get_intermediates: bool = False,
    guidance_fn: Optional[Callable] = None,
):
    """Run the full reverse chain; returns final token ids (B, S)
    [+ stacked per-step ids if requested].

    ``guidance_fn(model_log_prob, t, cond) -> model_log_prob`` is the hook for
    relation-constraint gradient guidance; it runs INSIDE the scan.

    ``rng`` may be ONE key (whole-batch noise, the CLI path) or a
    (B,)-batched key array (one key per row).  In the per-row regime each
    row's trajectory depends only on its own key — rows from different
    serving requests can then share one compiled program (request
    coalescing) without coupling their randomness to batch composition.
    """
    V = q.num_classes
    B, S = cond.seq.shape

    is_typed_key = jnp.issubdtype(rng.dtype, jax.dtypes.prng_key)
    per_row = rng.ndim == (1 if is_typed_key else 2)
    if per_row and rng.shape[0] != B:
        raise ValueError(
            f"per-row rng batch {rng.shape[0]} != cond batch {B}"
        )

    model_t, post_t = timestep_ladder(
        q.num_timesteps, num_timesteps_eval, sampling.time_difference
    )

    # the chain carries token IDS only — x_t is categorical throughout, so
    # the (B, S, V) log-one-hot of the round-1 design (79 MB of f32 carry at
    # B=1024) never needs to exist
    if cond.init_from_seq:
        ids = cond.seq.astype(jnp.int32)
    else:
        # all-MASK initialization (`base.py:339-346`)
        ids = jnp.full((B, S), V - 1, jnp.int32)

    strong_log = log_onehot(cond.seq, V)
    lane_is_pad = jnp.arange(V) == pad_id

    def step(carry, xs):
        ids, rng = carry
        mt, pt = xs
        if per_row:
            pair = jax.vmap(lambda k: jax.random.split(k))(rng)
            rng, r_samp = pair[:, 0], pair[:, 1]
        else:
            rng, r_samp = jax.random.split(rng)
        t_b = jnp.full((B,), mt, jnp.int32)

        # rng=None -> denoiser runs deterministic (dropout off), like the
        # reference's eval-mode sampling
        log_x_recon = predict_start(params, ids, t_b, None)
        mlp = q.q_posterior_ids(
            log_x_recon, ids, jnp.full((B,), pt, jnp.int32)
        )

        # strong user constraints by replacement (`base.py:246-251`)
        mlp = jnp.where(cond.strong_mask[..., None], strong_log, mlp)
        # refinement weak prior (`base.py:254-258`)
        mlp = mlp + jnp.where(cond.weak_mask[..., None], cond.weak_logits, 0.0)
        # relation guidance (`base.py:261-269`)
        if guidance_fn is not None:
            mlp = guidance_fn(mlp, mt, cond)
        # disable PAD where the element count is known (`base.py:272-284`)
        mlp = jnp.where(
            cond.pad_suppress[..., None] & lane_is_pad[None, None, :],
            LOG_EPS,
            mlp,
        )

        sampler = sample_tokens_per_row if per_row else sample_tokens
        new_ids = sampler(
            r_samp,
            mlp,
            name=sampling.name,
            temperature=sampling.temperature,
            top_k=sampling.top_k,
            top_p=sampling.top_p,
        ).astype(jnp.int32)
        y = new_ids if get_intermediates else None
        return (new_ids, rng), y

    (final_ids, _), ys = jax.lax.scan(
        step, (ids, rng), (jnp.asarray(model_t), jnp.asarray(post_t))
    )
    if get_intermediates:
        return final_ids, ys
    return final_ids
