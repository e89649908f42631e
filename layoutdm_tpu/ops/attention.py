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


def _attn_kernel_native(
    q_ref, k_ref, v_ref, o_ref, *, scale: float, H: int, hd: int
):
    """Attention on the denoiser's NATIVE (B, S, D=H*hd) layout — NO
    transpose/reshape anywhere (the host-side transpose is what made the v1
    kernel lose end-to-end at S=125, docs/DESIGN.md §6).  Mosaic's matmul
    supports one batch dim, so heads are a static unrolled loop slicing the
    lane axis."""
    for h in range(H):
        q = q_ref[:, :, h * hd : (h + 1) * hd]  # (Gb, S, hd)
        k = k_ref[:, :, h * hd : (h + 1) * hd]
        v = v_ref[:, :, h * hd : (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (Gb, S, S)
        p = jax.nn.softmax(s * scale, axis=-1).astype(v.dtype)
        o = jax.lax.dot_general(
            p, v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (Gb, S, hd)
        o_ref[:, :, h * hd : (h + 1) * hd] = o.astype(o_ref.dtype)


def _attn_kernel_qkv(qkv_ref, o_ref, *, scale: float, H: int, hd: int, D: int):
    """Like `_attn_kernel_native` but takes ONE packed (Gb, S, 3D) qkv slab
    — the projection's output feeds the kernel directly, so q/k/v never
    exist as separate HBM buffers."""
    for h in range(H):
        q = qkv_ref[:, :, h * hd : (h + 1) * hd]
        k = qkv_ref[:, :, D + h * hd : D + (h + 1) * hd]
        v = qkv_ref[:, :, 2 * D + h * hd : 2 * D + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        p = jax.nn.softmax(s * scale, axis=-1).astype(v.dtype)
        o = jax.lax.dot_general(
            p, v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, h * hd : (h + 1) * hd] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "batch_per_block", "interpret")
)
def fused_attention_qkv(
    qkv: jnp.ndarray,  # (B, S, 3D) packed projection output
    num_heads: int,
    batch_per_block: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Attention directly on the packed qkv projection output; returns
    (B, S, D)."""
    B, S, D3 = qkv.shape
    D = D3 // 3
    H = num_heads
    hd = D // H
    scale = 1.0 / math.sqrt(hd)
    if not batch_per_block:
        batch_per_block = _auto_batch_per_block(
            S, 2 * D, qkv.dtype.itemsize
        )  # in-slab 3D + out-slab D ~= 4D = 2 * 2D
    Gb = min(batch_per_block, B)
    while B % Gb:
        Gb -= 1
    in_spec = pl.BlockSpec((Gb, S, D3), lambda i: (i, 0, 0))
    out_spec = pl.BlockSpec((Gb, S, D), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_attn_kernel_qkv, scale=scale, H=H, hd=hd, D=D),
        out_shape=jax.ShapeDtypeStruct((B, S, D), qkv.dtype),
        grid=(B // Gb,),
        in_specs=[in_spec],
        out_specs=out_spec,
        interpret=interpret,
    )(qkv)


def _auto_batch_per_block(S: int, D: int, itemsize: int) -> int:
    """Largest batch-group whose working set fits the 16MB scoped VMEM,
    accounting for sublane/lane padding (8/128) and Pallas's double-buffered
    block prefetch (in/out slabs are held twice)."""
    Sp = -(-S // 8) * 8
    Sl = -(-S // 128) * 128
    Dp = -(-D // 128) * 128
    budget = 6 * 2**20
    per_b = 2 * 4 * Sp * Dp * itemsize + 3 * Sp * Sl * 4
    return max(1, min(64, budget // per_b))


@functools.partial(
    jax.jit, static_argnames=("num_heads", "batch_per_block", "interpret")
)
def fused_attention_native(
    q: jnp.ndarray,  # (B, S, D) packed heads, D = H * hd
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    batch_per_block: int = 0,  # 0 = auto-size to VMEM
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-head softmax(q k^T / sqrt(hd)) v on packed (B, S, D) slabs;
    returns (B, S, D)."""
    B, S, D = q.shape
    H = num_heads
    hd = D // H
    scale = 1.0 / math.sqrt(hd)
    if not batch_per_block:
        batch_per_block = _auto_batch_per_block(S, D, q.dtype.itemsize)
    Gb = min(batch_per_block, B)
    while B % Gb:
        Gb -= 1
    spec = pl.BlockSpec((Gb, S, D), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_attn_kernel_native, scale=scale, H=H, hd=hd),
        out_shape=jax.ShapeDtypeStruct((B, S, D), q.dtype),
        grid=(B // Gb,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(q, k, v)


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


# Measured end-to-end denoiser forward (v5e, bf16, d=464/L4,
# `bin/bench_attention.py`, chained-scan timing) with the packed-qkv
# kernel (`fused_attention_qkv` — one (B,S,3D) slab in, no per-head
# reshape/transpose, q/k/v never materialized separately in HBM):
#   S=125 B=1024: xla 42.4 / fused 42.3 ms  -> tie
#   S=250 B=512 : xla 46.7 / fused 38.1 ms  -> FUSED (1.23x)
#   S=500 B=256 : xla 59.8 / fused 35.5 ms  -> FUSED (1.68x)
# Never worse, so the gate defaults ON whenever the kernel applies.
# History: the round-1 kernel ((BH,S,hd) layout, host-side transpose) LOST
# end-to-end at S=125 (49.4 vs 42.3) — the transpose + fusion barrier cost
# more than the fusion saved; keeping the projection's packed layout is
# what flipped it.
FUSED_MIN_S = 0


def can_use_fused(S: int, mask, key_padding_mask) -> bool:
    """Gate: fused packed-qkv kernel on by default wherever it applies
    (mask-free dense attention on TPU); LAYOUTDM_TPU_FUSED_ATTN=1/0
    forces it on/off."""
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
