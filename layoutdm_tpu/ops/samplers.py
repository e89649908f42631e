"""Token samplers over logits — pure functions of (rng, logits).

Parity target: `helpers/sampling.py:73-130`.  Layout differs from the
reference: vocab is the LAST axis (``logits: (..., V)``), so every sampler is
one fused softmax/sort/cumsum over the minor dimension and vmaps trivially
inside the diffusion `lax.scan`.

All strategies funnel into `jax.random.categorical`, which implements
multinomial-from-softmax via Gumbel-argmax — the same distribution the
reference's `torch.multinomial(F.softmax(logits))` draws from.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -float("inf")


def gumbel_noise(rng: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    """The reference's explicit Gumbel construction (`base.py:167-174`)."""
    u = jax.random.uniform(rng, shape, dtype=dtype)
    return -jnp.log(-jnp.log(u + 1e-30) + 1e-30)


def top_k_filter(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep the k most likely lanes, -inf the rest (`sampling.py:73-78`)."""
    kth = jnp.sort(logits, axis=-1)[..., -k][..., None]
    return jnp.where(logits < kth, NEG_INF, logits)


def top_p_filter(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering (`sampling.py:94-109`): drop lanes once the
    cumulative probability of more-likely lanes exceeds p, always keeping the
    single most likely lane."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    order = jnp.argsort(-logits, axis=-1, stable=True)
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    rank = jnp.arange(logits.shape[-1])
    drop = (cum > p) & (rank > 0)
    sorted_kept = jnp.where(drop, NEG_INF, sorted_logits)
    # scatter back to original lane order
    inv = jnp.argsort(order, axis=-1, stable=True)
    return jnp.take_along_axis(sorted_kept, inv, axis=-1)


def sample_tokens(
    rng: jax.Array,
    logits: jnp.ndarray,
    name: str = "random",
    temperature: float = 1.0,
    top_k: int = 5,
    top_p: float = 0.9,
) -> jnp.ndarray:
    """Sample token ids of shape ``logits.shape[:-1]``.

    ``name`` is static (resolved at trace time): the compiled sampler is
    branch-free.  Matches the strategy set of `sampling.py:81-130`.
    """
    if name == "deterministic":
        return jnp.argmax(logits, axis=-1)

    scaled = logits / temperature
    if name == "top_k":
        scaled = top_k_filter(scaled, k=top_k)
    elif name == "top_p":
        scaled = top_p_filter(scaled, p=top_p)
    elif name == "top_k_top_p":
        scaled = top_p_filter(top_k_filter(scaled, k=top_k), p=top_p)
    elif name == "gumbel":
        # the reference layers explicit Gumbel noise on top of the
        # multinomial draw (`sampling.py:112-116`); keep both sources.
        rng, sub = jax.random.split(rng)
        scaled = scaled + gumbel_noise(sub, scaled.shape, scaled.dtype)
    elif name != "random":
        raise NotImplementedError(name)

    return jax.random.categorical(rng, scaled, axis=-1)


def sample_tokens_per_row(
    rngs: jax.Array,
    logits: jnp.ndarray,
    name: str = "random",
    temperature: float = 1.0,
    top_k: int = 5,
    top_p: float = 0.9,
) -> jnp.ndarray:
    """Row-seeded variant: ``rngs`` is a (B,)-batched key array and row i's
    draw depends ONLY on ``rngs[i]`` and ``logits[i]`` — not on its
    batch-mates.  This is what makes server-side request coalescing sound:
    rows from different requests can share one compiled program while each
    request keeps seed-determinism independent of batch composition."""
    return jax.vmap(
        lambda k, lg: sample_tokens(
            k, lg, name=name, temperature=temperature, top_k=top_k,
            top_p=top_p,
        )
    )(rngs, logits)
