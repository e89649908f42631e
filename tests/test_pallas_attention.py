"""Fused pallas attention vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from layoutdm_tpu.ops.attention import HAS_PALLAS, fused_attention


@pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")
def test_fused_attention_matches_xla(rng):
    B, S, H, hd = 2, 10, 2, 8
    q = jnp.asarray(rng.randn(B, S, H, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, H, hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, H, hd), jnp.float32)

    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
    want = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(s, -1), v)

    got = fused_attention(q, k, v, heads_per_block=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")
def test_fused_attention_block_divisor(rng):
    # BH not divisible by requested block: falls back to a valid divisor
    B, S, H, hd = 3, 6, 1, 4
    q = jnp.asarray(rng.randn(B, S, H, hd), jnp.float32)
    got = fused_attention(q, q, q, heads_per_block=2, interpret=True)
    assert got.shape == (B, S, H, hd)


def test_can_use_fused_gates():
    from layoutdm_tpu.ops.attention import can_use_fused

    # masks always force the XLA path
    assert not can_use_fused(125, jnp.zeros((4, 4)), None)
    assert not can_use_fused(125, None, jnp.zeros((2, 4), bool))
    # CPU backend in tests -> False
    assert not can_use_fused(125, None, None)


def test_gate_autotuned_on_sequence_length(monkeypatch):
    """Fused kernel default-on past the measured crossover, forceable both
    ways via LAYOUTDM_TPU_FUSED_ATTN."""
    import jax

    from layoutdm_tpu.ops import attention as A

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("LAYOUTDM_TPU_FUSED_ATTN", raising=False)
    if not A.HAS_PALLAS:
        import pytest

        pytest.skip("pallas unavailable")
    # packed-qkv kernel never loses (ties at S=125) -> default ON
    assert A.can_use_fused(125, None, None)
    assert A.can_use_fused(250, None, None)
    assert A.can_use_fused(500, None, None)
    monkeypatch.setenv("LAYOUTDM_TPU_FUSED_ATTN", "0")
    assert not A.can_use_fused(500, None, None)


def test_auto_heads_per_block_fits_vmem():
    from layoutdm_tpu.ops.attention import _auto_heads_per_block

    for S in (125, 250, 500, 1000):
        g = _auto_heads_per_block(S, 58, 2)
        assert g >= 1
        # working set within the 16MB scoped-vmem limit
        assert g * (4 * S * 58 * 2 + 2 * S * S * 4) <= 12 * 2**20
    assert _auto_heads_per_block(125, 58, 2) > _auto_heads_per_block(500, 58, 2)


def test_fused_attention_native_and_qkv_interpret(rng):
    """The layout-preserving kernels match the einsum reference (interpret
    mode runs on CPU)."""
    import math

    import jax
    import jax.numpy as jnp

    from layoutdm_tpu.ops.attention import (
        HAS_PALLAS,
        fused_attention_native,
        fused_attention_qkv,
    )

    if not HAS_PALLAS:
        pytest.skip("pallas unavailable")
    B, S, H, hd = 2, 25, 4, 16
    D = H * hd
    qkv = rng.randn(B, S, 3 * D).astype(np.float32)
    q, k, v = np.split(qkv, 3, axis=-1)
    q4, k4, v4 = [x.reshape(B, S, H, hd) for x in (q, k, v)]
    s = jnp.einsum("bihd,bjhd->bhij", q4, k4) / math.sqrt(hd)
    want = jnp.einsum(
        "bhij,bjhd->bihd", jax.nn.softmax(s, -1), jnp.asarray(v4)
    ).reshape(B, S, D)

    got_native = fused_attention_native(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), num_heads=H,
        interpret=True,
    )
    np.testing.assert_allclose(got_native, want, atol=1e-4)
    got_qkv = fused_attention_qkv(
        jnp.asarray(qkv), num_heads=H, interpret=True
    )
    np.testing.assert_allclose(got_qkv, want, atol=1e-4)
