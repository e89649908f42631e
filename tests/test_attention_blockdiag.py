"""Block-diagonal attention kernel: correctness vs per-head reference
(interpret mode on CPU), weight-scatter exactness, module-level parity."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layoutdm_tpu.ops.attention_blockdiag import (
    HAS_PALLAS,
    blockdiag_attention,
    can_use_blockdiag,
    scatter_out_weights,
    scatter_qkv_weights,
)


def _reference_attention(qkv, H, hd, scale):
    """Plain per-head attention on the UNPADDED (B, S, 3*H*hd) slab."""
    B, S, _ = qkv.shape
    D = H * hd
    q, k, v = np.split(qkv, 3, axis=-1)
    q4 = q.reshape(B, S, H, hd)
    k4 = k.reshape(B, S, H, hd)
    v4 = v.reshape(B, S, H, hd)
    s = np.einsum("bqhd,bkhd->bhqk", q4, k4) * scale
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", p, v4).reshape(B, S, D)


def _pad_slab(qkv, H, hd, hp):
    """Rearrange an unpadded slab into the padded-head layout the kernel
    expects (zero lanes hd..hp per head)."""
    B, S, _ = qkv.shape
    out = np.zeros((B, S, 3 * H * hp), qkv.dtype)
    q3 = qkv.reshape(B, S, 3, H, hd)
    out.reshape(B, S, 3, H, hp)[..., :hd] = q3
    return out


@pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("B,S,H,hd,hp", [(2, 9, 2, 6, 64), (3, 25, 4, 58, 64)])
def test_blockdiag_matches_reference(rng, B, S, H, hd, hp):
    qkv = rng.randn(B, S, 3 * H * hd).astype(np.float32)
    scale = 1.0 / math.sqrt(hd)
    got = blockdiag_attention(
        jnp.asarray(_pad_slab(qkv, H, hd, hp)),
        num_heads=H, head_pad=hp, scale=scale, interpret=True,
    )
    want_core = _reference_attention(qkv, H, hd, scale)
    # kernel output is in the padded-head layout; real lanes must match,
    # pad lanes must be exactly zero
    got4 = np.asarray(got).reshape(B, S, H, hp)
    np.testing.assert_allclose(
        got4[..., :hd].reshape(B, S, H * hd), want_core, atol=2e-5, rtol=2e-5
    )
    np.testing.assert_array_equal(got4[..., hd:], 0.0)


@pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")
def test_blockdiag_uneven_batch_blocks(rng):
    B, S, H, hd, hp = 6, 10, 2, 6, 64
    qkv = rng.randn(B, S, 3 * H * hd).astype(np.float32)
    scale = 1.0 / math.sqrt(hd)
    got = blockdiag_attention(
        jnp.asarray(_pad_slab(qkv, H, hd, hp)),
        num_heads=H, head_pad=hp, scale=scale,
        batch_per_block=4, interpret=True,
    )
    got4 = np.asarray(got).reshape(B, S, H, hp)
    np.testing.assert_allclose(
        got4[..., :hd].reshape(B, S, H * hd),
        _reference_attention(qkv, H, hd, scale),
        atol=2e-5, rtol=2e-5,
    )


def test_weight_scatter_roundtrip(rng):
    D, H, hd, hp = 24, 4, 6, 8
    w = rng.randn(D, 3 * H * hd).astype(np.float32)
    b = rng.randn(3 * H * hd).astype(np.float32)
    wp, bp = scatter_qkv_weights(jnp.asarray(w), jnp.asarray(b), H, hd, hp)
    assert wp.shape == (D, 3 * H * hp)
    wp4 = np.asarray(wp).reshape(D, 3, H, hp)
    np.testing.assert_array_equal(
        wp4[..., :hd], w.reshape(D, 3, H, hd)
    )
    np.testing.assert_array_equal(wp4[..., hd:], 0.0)
    bp4 = np.asarray(bp).reshape(3, H, hp)
    np.testing.assert_array_equal(bp4[..., :hd], b.reshape(3, H, hd))

    wo = rng.randn(H * hd, D).astype(np.float32)
    wop = scatter_out_weights(jnp.asarray(wo), H, hd, hp)
    assert wop.shape == (H * hp, D)
    wop3 = np.asarray(wop).reshape(H, hp, D)
    np.testing.assert_array_equal(wop3[:, :hd, :], wo.reshape(H, hd, D))
    np.testing.assert_array_equal(wop3[:, hd:, :], 0.0)


@pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")
def test_selfattention_v2_matches_default(rng, monkeypatch):
    """Module-level: the v2 branch (scattered weights + kernel) equals the
    default XLA path on the same params."""
    from layoutdm_tpu.models.nn import SelfAttention
    import layoutdm_tpu.ops.attention_blockdiag as bd

    B, S, D, H = 2, 9, 232, 4  # hd = 58
    mod = SelfAttention(D, H, 0.0)
    x = jnp.asarray(rng.randn(B, S, D), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    want = mod.apply({"params": params}, x)

    real = bd.blockdiag_attention
    monkeypatch.setattr(bd, "can_use_blockdiag", lambda *a, **k: True)
    monkeypatch.setattr(
        bd,
        "blockdiag_attention",
        lambda *a, **k: real(*a, **{**k, "interpret": True}),
    )
    got = mod.apply({"params": params}, x)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)

    # param tree identical through the v2 branch
    params_v2 = mod.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_v2
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params_v2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gate_off_by_default(monkeypatch):
    monkeypatch.delenv("LAYOUTDM_TPU_ATTN_V2", raising=False)
    assert not can_use_blockdiag(125, None, None, 58)
