"""Training objective of mask-and-replace diffusion, as a pure function.

Parity target: `categorical_diffusion/vanilla.py:160-240` and
`constrained.py:232-333` — reweighted KL(q_post(x0,xt) || q_post(x̂0,xt)) +
decoder NLL at t=0 + auxiliary KL on x̂0, importance-weighted 1/pt with
timestep importance sampling driven by an EMA of squared losses.

The reference mutates registered buffers (`Lt_history.scatter_`) inside
forward — the exact pattern that broke its multi-GPU path (SURVEY.md §2.2).
Here the importance state is explicit carry: ``(loss, new_state) = f(state)``,
so the train step stays pure and psum-able.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from layoutdm_tpu.ops.log_math import log_onehot


class LtState(NamedTuple):
    """Importance-sampling EMA buffers (`base.py:106-107`)."""

    history: jnp.ndarray  # (T,) f32
    count: jnp.ndarray  # (T,) f32

    @classmethod
    def init(cls, num_timesteps: int) -> "LtState":
        return cls(
            history=jnp.zeros((num_timesteps,), jnp.float32),
            count=jnp.zeros((num_timesteps,), jnp.float32),
        )


def sample_time(
    rng: jax.Array, state: LtState, batch_size: int, num_timesteps: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Importance-sample timesteps once every bucket has >10 visits, else
    uniform (`base.py:179-200`).  Branch-free: both draws are computed and
    selected by a scalar predicate (cheap, keeps the step jittable)."""
    r_imp, r_unif = jax.random.split(rng)
    use_importance = jnp.all(state.count > 10)

    lt_sqrt = jnp.sqrt(state.history + 1e-10) + 1e-4
    lt_sqrt = lt_sqrt.at[0].set(lt_sqrt[1])  # decoder term -> L1 (`base.py:185`)
    pt_all = lt_sqrt / lt_sqrt.sum()
    t_imp = jax.random.categorical(
        r_imp, jnp.log(pt_all), shape=(batch_size,)
    )
    t_unif = jax.random.randint(r_unif, (batch_size,), 0, num_timesteps)

    t = jnp.where(use_importance, t_imp, t_unif)
    pt = jnp.where(use_importance, pt_all[t], 1.0 / num_timesteps)
    return t.astype(jnp.int32), pt


def diffusion_loss(
    q,  # VanillaQ | ConstrainedQ
    predict_start,  # (params, log_xt, t) -> log p(x0|xt)
    params,
    rng: jax.Array,
    seq: jnp.ndarray,  # (B, S) clean token ids
    lt_state: LtState,
    auxiliary_loss_weight: float = 1e-1,
    is_train: bool = True,
    t: jnp.ndarray = None,
    pt: jnp.ndarray = None,
    xt: jnp.ndarray = None,
):
    """Returns (losses dict, new LtState, aux outputs).

    ``t``/``pt``/``xt`` may be injected (together) to pin the timesteps,
    their importance weights, and the corrupted sequence — used by the
    reference-parity tests and for deterministic loss probes; the production
    path leaves them None and samples internally.
    """
    B, S = seq.shape
    V = q.num_classes
    T = q.num_timesteps
    r_t, r_corrupt, r_model = jax.random.split(rng, 3)

    if t is None:
        t, pt = sample_time(r_t, lt_state, B, T)

    log_x_start = log_onehot(seq, V)
    if xt is None:
        _, xt = q.corrupt(r_corrupt, seq, t)

    # dropout active only in training (rng=None -> deterministic denoiser);
    # x_t flows as ids — the posteriors specialize their observed-x_t terms
    # to per-timestep scalars (q_posterior_ids), so no (B, S, V) one-hot of
    # x_t is ever materialized
    log_x0_recon = predict_start(
        params, xt, t, r_model if is_train else None
    )
    log_model_prob = q.q_posterior_ids(log_x0_recon, xt, t)
    log_true_prob = q.q_posterior_ids(log_x_start, xt, t)

    # KL between the two posteriors (`vanilla.py:197-206`); the reference's
    # mask_weight is (1,1) so it reduces to a plain mean over positions.
    kl = jnp.sum(
        jnp.exp(log_true_prob) * (log_true_prob - log_model_prob), axis=-1
    ).mean(axis=-1)
    decoder_nll = -jnp.sum(jnp.exp(log_x_start) * log_model_prob, axis=-1).mean(
        axis=-1
    )
    is_t0 = (t == 0).astype(jnp.float32)
    kl_loss = is_t0 * decoder_nll + (1.0 - is_t0) * kl

    # functional EMA update of the importance buffers (`vanilla.py:214-218`).
    # The reference's scatter_ is nondeterministic when a batch repeats a
    # timestep (which-write-wins); we apply ONE EMA step per visited t using
    # the segment MEAN of the batch losses — deterministic and unbiased.
    lt2 = jax.lax.stop_gradient(kl_loss**2)
    T_len = lt_state.history.shape[0]
    sum_t = jnp.zeros((T_len,), lt2.dtype).at[t].add(lt2)
    cnt_t = jnp.zeros((T_len,), lt2.dtype).at[t].add(1.0)
    mean_t = sum_t / jnp.maximum(cnt_t, 1.0)
    visited = cnt_t > 0
    new_history = jnp.where(
        visited, 0.1 * mean_t + 0.9 * lt_state.history, lt_state.history
    )
    new_count = lt_state.count + cnt_t
    new_state = LtState(history=new_history, count=new_count)

    losses = {"kl_loss": (kl_loss / pt).mean()}
    if auxiliary_loss_weight > 0 and is_train:
        kl_aux = jnp.sum(
            jnp.exp(log_x_start[..., :-1])
            * (log_x_start[..., :-1] - log_x0_recon[..., :-1]),
            axis=-1,
        ).mean(axis=-1)
        kl_aux_loss = is_t0 * decoder_nll + (1.0 - is_t0) * kl_aux
        weight = (1 - t / T) + 1.0  # adaptive (`vanilla.py:230-233`)
        losses["aux_loss"] = (
            weight * auxiliary_loss_weight * kl_aux_loss / pt
        ).mean()

    aux = {"t": t, "xt": xt, "log_model_prob": log_model_prob}
    return losses, new_state, aux
