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
    assert not A.can_use_fused(125, None, None)   # Rico: xla wins
    assert not A.can_use_fused(250, None, None)   # still xla
    assert A.can_use_fused(500, None, None)       # PubLayNet-scale: fused
    monkeypatch.setenv("LAYOUTDM_TPU_FUSED_ATTN", "1")
    assert A.can_use_fused(125, None, None)
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
