"""Block-diagonal attention: turn per-head matmuls into MXU-shaped GEMMs.

The flagship's attention is 8·B tiny (S=125, hd=58) matmuls per layer —
shapes the MXU hates (K=58 vs its 128-wide systolic passes, ~5-10 TF/s
effective, `bin/bench_parts.py`).  This variant restructures the math so
each batch row does TWO large well-shaped GEMMs instead of 16 tiny ones:

    scores_all (S, H·Sb) = q_pad (S, Hp) @ blockdiag(kᵀ) (Hp, H·Sb)
    out        (S, Hp)   = P (S, H·Sb)  @ blockdiag(v)  (H·Sb, Hp)

where Hp = H·64 (heads zero-padded to a lane multiple at the WEIGHT
level — exact, see below), Sb = S padded to 128, and blockdiag(·) is
built in VMEM per batch row by a broadcast-multiply with a head-selector
mask (no transposes inside the kernel: kᵀ is pre-transposed once in HBM
by XLA).  The block-diagonal structure keeps heads separated: column
block h of `scores_all` is exactly q_h @ k_hᵀ because the selector zeroes
every other head's lanes.

Head padding here is free, unlike the runtime-pad experiment that lost
(`use_head_pad`): the qkv projection's WEIGHT columns are scattered into
the padded layout once per forward (a (D, 3Hp) scatter, trivial), so the
projection GEMM itself emits padded heads and no (B,S,H,hd) pad copy ever
exists.  Zero weight columns -> zero q/k/v lanes -> zero score terms and
zero output lanes, which the re-laid out-projection rows drop: exact.

FLOPs are ~(Hp·Sb)/(hd·S) ≈ 9x the ideal attention FLOPs, but at the
measured shapes the MXU runs these GEMMs ~15-25x faster than the tiny
per-head ones — the experiment this module exists to settle end-to-end
(`LAYOUTDM_TPU_ATTN_V2=1`; see docs/DESIGN.md §6).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl

    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False


def _pad_up(n: int, m: int) -> int:
    return -(-n // m) * m


def scatter_qkv_weights(w, b, H: int, hd: int, hp: int):
    """(D, 3·H·hd) qkv kernel/bias -> (D, 3·H·hp) with each head's block
    zero-padded from hd to hp columns.  Exact: the new columns are zero."""
    D = w.shape[0]
    w3 = w.reshape(D, 3, H, hd)
    b3 = b.reshape(3, H, hd)
    wp = jnp.zeros((D, 3, H, hp), w.dtype).at[..., :hd].set(w3)
    bp = jnp.zeros((3, H, hp), b.dtype).at[..., :hd].set(b3)
    return wp.reshape(D, 3 * H * hp), bp.reshape(3 * H * hp)


def scatter_out_weights(w, H: int, hd: int, hp: int):
    """(H·hd, D) out-proj kernel -> (H·hp, D) with zero rows under each
    head's padded lanes (drops the kernel's zero output lanes exactly)."""
    D = w.shape[1]
    w3 = w.reshape(H, hd, D)
    wp = jnp.zeros((H, hp, D), w.dtype).at[:, :hd, :].set(w3)
    return wp.reshape(H * hp, D)


def _bd_kernel(q_ref, kt_ref, v_ref, o_ref, *, H, hp, S, Sb, scale):
    """One batch block: q (Gb,S,Hp), kt (Gb,Hp,Sb), v (Gb,Sb,Hp) ->
    o (Gb,S,Hp).  Hp = H*hp."""
    Hp = H * hp
    q = q_ref[...]
    kt = kt_ref[...]
    v = v_ref[...]
    Gb = q.shape[0]

    # head-of-lane selectors as full-shape iota compares (Mosaic lowers
    # these cleanly; fancy broadcast-multiplies with unit dims do not)
    kt_lane_head = (
        jax.lax.broadcasted_iota(jnp.int32, (Gb, Hp, Sb), 1) // hp
    )
    v_lane_head = (
        jax.lax.broadcasted_iota(jnp.int32, (Gb, Sb, Hp), 2) // hp
    )
    zero_k = jnp.zeros_like(kt)

    # blockdiag(k^T) via static concat of per-head masked copies:
    # column block h of (Gb, Hp, H*Sb) holds k_h^T on head-h lanes
    kb = jnp.concatenate(
        [jnp.where(kt_lane_head == h, kt, zero_k) for h in range(H)],
        axis=2,
    )
    scores = jax.lax.dot_general(
        q, kb,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (Gb, S, H*Sb)

    s4 = scores.reshape(scores.shape[0], S, H, Sb) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s4.shape, 3)
    s4 = jnp.where(col < S, s4, -1e9)
    p = jax.nn.softmax(s4, axis=-1).astype(q.dtype)
    p = p.reshape(scores.shape[0], S, H * Sb)

    # blockdiag(v): row block h of (Gb, H*Sb, Hp) holds v on head-h lanes
    zero_v = jnp.zeros_like(v)
    vb = jnp.concatenate(
        [jnp.where(v_lane_head == h, v, zero_v) for h in range(H)],
        axis=1,
    )
    o = jax.lax.dot_general(
        p, vb,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (Gb, S, Hp)
    o_ref[...] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "head_pad", "scale", "batch_per_block", "interpret"
    ),
)
def blockdiag_attention(
    qkv_pad: jnp.ndarray,  # (B, S, 3*H*hp) padded-head projection output
    num_heads: int,
    head_pad: int,
    scale: float,  # 1/sqrt(TRUE head dim) — hp is padded, so no default
    batch_per_block: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (B, S, H*hp) attention output in the padded-head layout
    (feed it the re-laid out-projection from `scatter_out_weights`)."""
    B, S, _ = qkv_pad.shape
    H, hp = num_heads, head_pad
    Hp = H * hp
    Sb = _pad_up(S, 128)

    q = qkv_pad[:, :, :Hp]
    # k^T pre-transposed in HBM once; pad S -> Sb with zero columns
    kt = jnp.swapaxes(qkv_pad[:, :, Hp : 2 * Hp], 1, 2)  # (B, Hp, S)
    kt = jnp.pad(kt, ((0, 0), (0, 0), (0, Sb - S)))
    v = jnp.pad(
        qkv_pad[:, :, 2 * Hp :], ((0, 0), (0, Sb - S), (0, 0))
    )  # (B, Sb, Hp)

    if not batch_per_block:
        batch_per_block = _auto_rows(S, Sb, Hp, H, qkv_pad.dtype.itemsize)
    Gb = min(batch_per_block, B)
    while B % Gb:
        Gb -= 1

    return pl.pallas_call(
        functools.partial(
            _bd_kernel, H=H, hp=hp, S=S, Sb=Sb, scale=scale
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, Hp), qkv_pad.dtype),
        grid=(B // Gb,),
        in_specs=[
            pl.BlockSpec((Gb, S, Hp), lambda i: (i, 0, 0)),
            pl.BlockSpec((Gb, Hp, Sb), lambda i: (i, 0, 0)),
            pl.BlockSpec((Gb, Sb, Hp), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((Gb, S, Hp), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(q, kt, v)


_VMEM_BUDGET = 14 * 2**20


def _row_bytes(S: int, Sb: int, Hp: int, H: int, itemsize: int) -> int:
    Sp = _pad_up(S, 8)
    io = 2 * (Sp * Hp + Hp * Sb + Sb * Hp + Sp * Hp) * itemsize  # dbl-buffered
    bd = (Hp * H * Sb + H * Sb * Hp) * itemsize  # kb + vb blockdiags
    scores = 2 * Sp * H * Sb * 4  # scores + probs in f32
    return io + bd + scores


def _auto_rows(S: int, Sb: int, Hp: int, H: int, itemsize: int) -> int:
    return max(
        1, min(16, _VMEM_BUDGET // max(_row_bytes(S, Sb, Hp, H, itemsize), 1))
    )


def can_use_blockdiag(
    S: int, mask, key_padding_mask, hd: int, num_heads: int = 8,
    itemsize: int = 2,
) -> bool:
    """Experimental gate: OFF unless LAYOUTDM_TPU_ATTN_V2=1.  Same safety
    conditions as the packed-qkv kernel (TPU, pallas, dense mask-free
    attention, single-row working set fits scoped VMEM)."""
    import os

    if os.environ.get("LAYOUTDM_TPU_ATTN_V2") != "1":
        return False
    if not HAS_PALLAS:
        return False
    if mask is not None or key_padding_mask is not None:
        return False
    hp = hd if hd % 64 == 0 else _pad_up(hd, 64)
    Sb = _pad_up(S, 128)
    if _row_bytes(S, Sb, num_heads * hp, num_heads, itemsize) > _VMEM_BUDGET:
        return False  # fall back to XLA instead of failing Mosaic compile
    return jax.default_backend() == "tpu"
