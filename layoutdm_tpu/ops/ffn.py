"""Fused LayerNorm->linear1->activation->linear2->residual pallas kernel.

The denoiser's FFN sub-block dominates its HBM traffic: XLA writes the
(B*S, dim_feedforward) linear1 output to HBM (524 MB at the flagship
bench shapes) and reads it straight back for linear2, plus separate
norm/residual passes over (B*S, d_model).  Both weight matrices together
are only ~4 MB in bf16, so one pallas kernel keeps a row-block of tokens
resident in VMEM through the whole sub-block:

    out = x + ( act( LN(x) @ W1 + b1 ) @ W2 + b2 )

with zero HBM traffic for the intermediate.  `bin/bench_decompose.py`
showed the denoiser forward is 96% of sampler step time and sits ~38%
above its GEMM lower bound — this kernel attacks exactly that gap.

Same deployment rules as `ops.attention.fused_attention_qkv`: the kernel
runs ONLY on the deterministic path (training differentiates through the
FFN and `pallas_call` has no reverse-mode AD rule; dropout>0 needs the
XLA path anyway), is gated on VMEM fit with an XLA fallback, and
`LAYOUTDM_TPU_FUSED_FFN=1/0` forces it on/off.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl

    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False


def _act(name: str, h):
    if name == "relu":
        return jax.lax.max(h, 0.0)
    if name == "gelu":
        return jax.nn.gelu(h)
    if name == "gelu2":  # models/nn.py gelu2 (sigmoid approximation)
        return h * jax.nn.sigmoid(1.702 * h)
    raise ValueError(f"unknown activation: {name}")


def _ffn_kernel(
    x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
    *, activation: str, eps: float,
):
    """One (R, D) row-block: f32 LayerNorm (matching flax's promoted
    compute), bf16 GEMMs with f32 accumulation (matching XLA's default
    TPU matmul), activation in f32, residual in the input dtype."""
    x = x_ref[...]  # (R, D) compute dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    ln = (xf - mean) * jax.lax.rsqrt(var + eps)
    ln = ln * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)

    h = jax.lax.dot_general(
        ln.astype(x.dtype), w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = _act(activation, h + b1_ref[...].astype(jnp.float32))
    out = jax.lax.dot_general(
        h.astype(x.dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = out + b2_ref[...].astype(jnp.float32)
    o_ref[...] = x + out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("activation", "eps", "rows_per_block", "interpret")
)
def fused_ln_ffn_residual(
    x: jnp.ndarray,  # (B, S, D) or (M, D), compute dtype (bf16/f32)
    ln_scale: jnp.ndarray,  # (D,)
    ln_bias: jnp.ndarray,  # (D,)
    w1: jnp.ndarray,  # (D, F)
    b1: jnp.ndarray,  # (F,)
    w2: jnp.ndarray,  # (F, D)
    b2: jnp.ndarray,  # (D,)
    activation: str = "gelu2",
    eps: float = 1e-6,
    rows_per_block: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + linear2(act(linear1(LN(x)))) with the (M, F) intermediate kept
    in VMEM.  Weights are cast to x.dtype (as `nn.Dense(dtype=...)` does);
    LN and GEMM accumulation run f32."""
    shape = x.shape
    D = shape[-1]
    F = w1.shape[1]
    x2 = x.reshape(-1, D)
    M = x2.shape[0]
    dt = x.dtype

    if not rows_per_block:
        rows_per_block = _auto_rows_per_block(D, F, jnp.dtype(dt).itemsize)
    R = min(rows_per_block, M)
    while M % R:
        R -= 1

    out = pl.pallas_call(
        functools.partial(_ffn_kernel, activation=activation, eps=eps),
        out_shape=jax.ShapeDtypeStruct((M, D), dt),
        grid=(M // R,),
        in_specs=[
            pl.BlockSpec((R, D), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((D, F), lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec((F, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((R, D), lambda i: (i, 0)),
        interpret=interpret,
    )(
        x2,
        # scale/bias stay f32: flax's nn.LayerNorm consumes f32 params even
        # under bf16 compute, and the kernel promotes to f32 anyway — casting
        # to dt here would deviate from the XLA path's param precision
        ln_scale.reshape(1, D).astype(jnp.float32),
        ln_bias.reshape(1, D).astype(jnp.float32),
        w1.astype(dt),
        b1.reshape(1, F).astype(dt),
        w2.astype(dt),
        b2.reshape(1, D).astype(dt),
    )
    return out.reshape(shape)


_VMEM_BUDGET = 14 * 2**20  # 16MB scoped limit minus slack


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


def _fixed_vmem(D: int, F: int, itemsize: int) -> int:
    """Weights + biases resident across the whole grid (constant index
    map -> fetched once)."""
    Dp, Fp = _pad128(D), _pad128(F)
    return (2 * Dp * Fp + 3 * Dp + Fp) * itemsize


def _row_vmem(D: int, F: int, itemsize: int) -> int:
    """Bytes per block row: double-buffered x/out slabs plus the live f32
    LN + (R, F) intermediate."""
    Dp, Fp = _pad128(D), _pad128(F)
    return 2 * 2 * Dp * itemsize + 4 * Dp + 4 * Fp


def _auto_rows_per_block(D: int, F: int, itemsize: int) -> int:
    avail = _VMEM_BUDGET - _fixed_vmem(D, F, itemsize)
    return max(8, min(512, avail // max(_row_vmem(D, F, itemsize), 1)))


def fits_vmem(D: int, F: int, itemsize: int = 2) -> bool:
    return (
        _fixed_vmem(D, F, itemsize) + 8 * _row_vmem(D, F, itemsize)
        <= _VMEM_BUDGET
    )


def can_use_fused_ffn(D: int, F: int, activation: str, itemsize: int = 2) -> bool:
    """Gate: fused FFN is OFF by default — a measured negative result.

    At the flagship bench shapes the kernel TIES the XLA chain in
    isolation (4.87 vs 4.79 ms at (128k, 512)x2048, `bin/bench_ffn.py`:
    XLA already streams the (M, F) intermediate at full overlap, so there
    is no HBM win to collect) and LOSES inside the full denoiser (50.4 vs
    36.9 ms/step, `bin/bench_decompose.py`: the pallas_call fusion
    barrier breaks XLA's surrounding schedule).  Kept for forcing
    (`LAYOUTDM_TPU_FUSED_FFN=1`) and for future shapes where the FFN is
    genuinely bandwidth-bound; the safety conditions (pallas present,
    known activation, VMEM fit, TPU) still always apply."""
    import os

    force = os.environ.get("LAYOUTDM_TPU_FUSED_FFN")
    if force != "1":
        return False
    if not HAS_PALLAS:
        return False
    if activation not in ("relu", "gelu", "gelu2"):
        return False
    if not fits_vmem(D, F, itemsize):
        return False
    return jax.default_backend() == "tpu"
