"""Fused self-attention pallas kernel for short sequences.

Measured on the flagship sampling shape (B=1024, H=8, S=125, hd=58), XLA's
attention costs ~23ms of a ~44ms denoiser forward — it materializes the
(B, H, S, S) score tensor in HBM between matmuls.  For S <= 128 the whole
row of scores fits in VMEM, so one pallas kernel fuses
``qk^T -> softmax -> @v`` per block of heads with zero HBM traffic for the
intermediates.  No masking variants: the compiled samplers run on dense
padded token sequences (PAD is a vocabulary token, not an attention mask);
the XLA path remains the fallback whenever masks are present or shapes
don't fit.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[:]  # (G, S, hd)
    k = k_ref[:]
    v = v_ref[:]
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    s = s * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = o.astype(o_ref.dtype)


def _auto_heads_per_block(S: int, hd: int, itemsize: int) -> int:
    """Largest head-group whose working set (q/k/v/o blocks + f32 score and
    prob matrices) fits comfortably in the ~16MB scoped VMEM."""
    budget = 10 * 2**20
    per_head = 4 * S * hd * itemsize + 2 * S * S * 4
    return max(1, min(32, budget // per_head))


@functools.partial(jax.jit, static_argnames=("heads_per_block", "interpret"))
def fused_attention(
    q: jnp.ndarray,  # (B, S, H, hd)
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads_per_block: int = 0,  # 0 = auto-size to VMEM
    interpret: bool = False,
) -> jnp.ndarray:
    """Softmax(q k^T / sqrt(hd)) v, fused on-chip.  Returns (B, S, H, hd)."""
    B, S, H, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    BH = B * H

    def flat(x):
        return x.transpose(0, 2, 1, 3).reshape(BH, S, hd)

    qf, kf, vf = flat(q), flat(k), flat(v)
    if not heads_per_block:
        heads_per_block = _auto_heads_per_block(S, hd, q.dtype.itemsize)
    G = min(heads_per_block, BH)
    while BH % G:
        G -= 1
    spec = pl.BlockSpec((G, S, hd), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((BH, S, hd), q.dtype),
        grid=(BH // G,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, S, hd).transpose(0, 2, 1, 3)


# Measured end-to-end denoiser-forward crossover (v5e, bf16, d=464/L4,
# `bin/bench_attention.py`, chained-scan timing):
#   S=125 B=1024: xla 42.3 / fused 49.4 ms  -> xla
#   S=250 B=512 : xla 46.6 / fused 49.3 ms  -> xla
#   S=500 B=256 : xla 59.8 / fused 52.9 ms  -> FUSED (1.13x)
# Below the crossover the (B,S,H,hd)->(BH,S,hd) layout change + the custom
# call acting as an XLA fusion barrier cost more than the fusion saves; at
# S>=~500 (PubLayNet max100 scale) the O(S^2) HBM score traffic dominates
# and the kernel wins.
FUSED_MIN_S = 256


def can_use_fused(S: int, mask, key_padding_mask) -> bool:
    """Autotuned gate: fused kernel on by default past the measured S
    crossover; LAYOUTDM_TPU_FUSED_ATTN=1/0 forces it on/off."""
    import os

    force = os.environ.get("LAYOUTDM_TPU_FUSED_ATTN")
    if force == "0":
        return False
    if not HAS_PALLAS:
        return False
    if mask is not None or key_padding_mask is not None:
        return False
    if jax.default_backend() != "tpu":
        return False
    if force == "1":
        return True
    return S > FUSED_MIN_S
