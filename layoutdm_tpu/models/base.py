"""Model interface + shared pieces for all families.

The reference's `BaseModel` (`models/base_model.py:13-150`) mixes torch
module mechanics with the API; here the contract is purely functional:

    init(rng) -> params
    init_state() -> aux state pytree (importance buffers, seq-length EMA, ...)
    preprocess(batch, rng) -> tokens dict (host or jit)
    loss(params, rng, tokens, state) -> (losses dict, new state)
    sample_ids(params, rng, batch_size, cond, sampling, ...) -> (B, S) ids
    sample(...) -> decoded layouts

Aux state replaces the reference's mutable buffers (`SeqLengthDistribution`
EMA `nn_lib.py:26-52`, `Lt_history`) so every model trains correctly under
data parallelism.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class SeqLenState(NamedTuple):
    """EMA histogram over #elements (`nn_lib.py:26-52`), weight 0.999."""

    probs: jnp.ndarray  # (max_elements,)

    @classmethod
    def init(cls, max_elements: int) -> "SeqLenState":
        return cls(probs=jnp.full((max_elements,), 1.0 / max_elements))

    def update(self, elem_mask: jnp.ndarray, weight: float = 0.999):
        n = self.probs.shape[0]
        counts = jnp.zeros((n + 1,)).at[elem_mask.sum(axis=1)].add(1.0)
        batch_prob = counts[1:] / elem_mask.shape[0]
        return SeqLenState(probs=self.probs * weight + (1 - weight) * batch_prob)

    def sample(self, rng: jax.Array, batch_size: int) -> jnp.ndarray:
        """#elements in [1, max_elements] (`nn_lib.py:47-52`)."""
        ids = jax.random.categorical(
            rng, jnp.log(self.probs + 1e-12), shape=(batch_size,)
        )
        return ids + 1


class VAEModule:
    """Reparameterized Gaussian bottleneck (`nn_lib.py:55-70`), as a flax
    module factory for models that need a latent head."""

    def __new__(cls, dim_latent: int):
        import flax.linen as nn

        class _VAE(nn.Module):
            dim: int = dim_latent

            @nn.compact
            def __call__(self, x, rng):
                mu = nn.Dense(self.dim, name="fc_mu")(x)
                logvar = nn.Dense(self.dim, name="fc_var")(x)
                std = jnp.exp(0.5 * logvar)
                eps = jax.random.normal(rng, std.shape)
                return {"z": eps * std + mu, "mu": mu, "logvar": logvar}

        return _VAE()


def cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """Masked mean CE with optional label smoothing (torch semantics)."""
    V = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if label_smoothing > 0:
        smooth = -logp.mean(axis=-1)
        nll = (1 - label_smoothing) * nll + label_smoothing * smooth
    if mask is None:
        return nll.mean()
    return jnp.where(mask, nll, 0.0).sum() / jnp.maximum(mask.sum(), 1)
