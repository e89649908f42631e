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


def _attn_kernel_qkv(qkv_ref, o_ref, *, scale: float, H: int, hd: int, D: int):
    """Attention on the denoiser's NATIVE packed (Gb, S, 3D) qkv slab — the
    projection's output feeds the kernel directly, so q/k/v never exist as
    separate HBM buffers and NO transpose/reshape surrounds the custom call
    (the host-side transpose is what made the round-1 kernel lose
    end-to-end at S=125, docs/DESIGN.md §6).  Mosaic's matmul supports one
    batch dim, so heads are a static unrolled loop slicing the lane axis."""
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
    jax.jit,
    static_argnames=("num_heads", "batch_per_block", "interpret", "scale"),
)
def fused_attention_qkv(
    qkv: jnp.ndarray,  # (B, S, 3D) packed projection output
    num_heads: int,
    batch_per_block: int = 0,
    interpret: bool = False,
    scale: float = 0.0,
) -> jnp.ndarray:
    """Attention directly on the packed qkv projection output; returns
    (B, S, D).

    ``scale`` overrides the 1/sqrt(hd) default — the weight-padded-head
    path feeds hd=64 slabs whose true head size is 58, so the softmax
    scale must come from the caller."""
    B, S, D3 = qkv.shape
    D = D3 // 3
    H = num_heads
    hd = D // H
    scale = scale or 1.0 / math.sqrt(hd)
    if not batch_per_block:
        batch_per_block = _auto_batch_per_block(S, D, qkv.dtype.itemsize)
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


def _vmem_per_row(S: int, d_model: int, itemsize: int) -> int:
    """Bytes of scoped VMEM one batch row costs: double-buffered (S, 3D)
    input and (S, D) output slabs (sublane/lane padded) plus ~3 live f32
    (S, S) score/prob buffers.  Calibrated against observed Mosaic
    allocations (19.9MB at S=125/Gb=16; 7MB at S=500/Gb=1)."""
    Sp = -(-S // 8) * 8
    Sl = -(-S // 128) * 128
    d3 = -(-(3 * d_model) // 128) * 128
    d1 = -(-d_model // 128) * 128
    return 2 * Sp * (d3 + d1) * itemsize + 3 * Sp * Sl * 4


_VMEM_BUDGET = 14 * 2**20  # 16MB scoped limit minus slack


def _auto_batch_per_block(S: int, d_model: int, itemsize: int) -> int:
    """Largest batch-group whose working set fits the scoped VMEM."""
    return max(
        1, min(64, _VMEM_BUDGET // _vmem_per_row(S, d_model, itemsize))
    )


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


def fits_vmem(S: int, d_model: int, itemsize: int = 2) -> bool:
    """True when even a single-row block's working set fits the scoped
    VMEM — beyond this the kernel cannot compile and the XLA path must
    serve (the old gate's blanket S>512 cutoff, made exact)."""
    return _vmem_per_row(S, d_model, itemsize) <= _VMEM_BUDGET


def head_pad_target(hd: int) -> int:
    """Next multiple-of-64 head size for the padded XLA attention path.

    Zero-padding q/k/v to a lane multiple is mathematically EXACT (padded
    q x padded k adds zero score terms; padded v lanes produce zeros the
    out-projection's slice drops) and linear, so it is safe under
    jax.grad.  Returns hd unchanged when already aligned."""
    if hd % 64 == 0:
        return hd
    return -(-hd // 64) * 64


def use_head_pad(hd: int) -> bool:
    """OFF by default — a measured negative result.

    Hypothesis was that the flagship's misaligned hd = 464/8 = 58 starves
    the batched score/value matmuls; measured end-to-end at bench shapes
    (`bin/bench_decompose.py`, B=1024 S=125 bf16) padding makes the XLA
    path WORSE (47.0 vs 42.1 ms denoiser/step — the three (B,S,H,64) pad
    copies cost more than the alignment saves) and the pallas packed-qkv
    kernel beats both at 36.9 ms.  Kept behind LAYOUTDM_TPU_HEAD_PAD=1
    for shape regimes where the tradeoff may flip (larger hd remainders,
    longer S)."""
    import os

    if os.environ.get("LAYOUTDM_TPU_HEAD_PAD") != "1":
        return False
    return hd % 64 != 0 and jax.default_backend() == "tpu"


def can_use_padded_qkv(
    S: int, mask, key_padding_mask, hd: int, num_heads: int = 8,
    itemsize: int = 2,
) -> bool:
    """Gate for the WEIGHT-padded-head packed-qkv path (default ON where
    it applies; LAYOUTDM_TPU_HEADPAD_W=0 disables): the qkv/out projection
    weights are zero-scattered so each head occupies a 64-aligned lane
    block and the per-head kernel slices stop crossing lane tiles.  Unlike
    the rejected runtime head-pad (`use_head_pad`), no activation pad
    copies exist — the projection GEMM itself emits the padded layout.

    Measured (v5e, bf16, B=1024 S=125 d=464): denoiser 34.1 -> 28.2
    ms/step (-17%).  The math is exact up to bf16 accumulation order (the
    zero-interleaved weights shift MXU tile boundaries; logit diff ~3e-4
    relative vs the unpadded kernel)."""
    import os

    if os.environ.get("LAYOUTDM_TPU_HEADPAD_W") == "0":
        return False
    if not HAS_PALLAS:
        return False
    if mask is not None or key_padding_mask is not None:
        return False
    if hd % 64 == 0:
        return False  # already aligned; the plain fused path is identical
    hp = head_pad_target(hd)
    if not fits_vmem(S, num_heads * hp, itemsize):
        return False
    return jax.default_backend() == "tpu"


def can_use_fused(
    S: int, mask, key_padding_mask, d_model: int = 0, itemsize: int = 2
) -> bool:
    """Gate: fused packed-qkv kernel on by default wherever it applies
    (mask-free dense attention on TPU, shapes that fit VMEM);
    LAYOUTDM_TPU_FUSED_ATTN=1/0 forces it on/off.  The force flag only
    overrides the heuristic — never the safety conditions (pallas present,
    no masks, TPU backend, VMEM fit)."""
    import os

    force = os.environ.get("LAYOUTDM_TPU_FUSED_ATTN")
    if force == "0":
        return False
    if not HAS_PALLAS:
        return False
    if mask is not None or key_padding_mask is not None:
        return False
    if d_model and not fits_vmem(S, d_model, itemsize):
        return False
    if jax.default_backend() != "tpu":
        return False
    if force == "1":
        return True
    return S > FUSED_MIN_S
