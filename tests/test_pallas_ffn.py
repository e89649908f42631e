"""Fused LN->FFN->residual kernel: correctness (interpret mode on CPU),
param-tree compatibility with the XLA path, gate semantics, block sizing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layoutdm_tpu.ops import ffn as ffn_mod
from layoutdm_tpu.ops.ffn import (
    HAS_PALLAS,
    _auto_rows_per_block,
    can_use_fused_ffn,
    fits_vmem,
    fused_ln_ffn_residual,
)


def _reference(x, g, b, w1, b1, w2, b2, activation="gelu2", eps=1e-6):
    xf = x.astype(np.float64)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    ln = (xf - mean) / np.sqrt(var + eps) * g + b
    h = ln @ w1 + b1
    if activation == "gelu2":
        h = h / (1.0 + np.exp(-1.702 * h))
    elif activation == "relu":
        h = np.maximum(h, 0.0)
    else:
        import jax.nn

        h = np.asarray(jax.nn.gelu(jnp.asarray(h)))
    return x + (h @ w2 + b2)


def _rand_params(rng, D, F):
    s = 1.0 / np.sqrt(D)
    return (
        rng.uniform(0.5, 1.5, D),
        rng.randn(D) * 0.1,
        rng.randn(D, F) * s,
        rng.randn(F) * 0.1,
        rng.randn(F, D) / np.sqrt(F),
        rng.randn(D) * 0.1,
    )


@pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("activation", ["gelu2", "relu", "gelu"])
def test_fused_ffn_matches_reference_f32(rng, activation):
    B, S, D, F = 2, 10, 64, 128
    x = rng.randn(B, S, D).astype(np.float32)
    params = _rand_params(rng, D, F)
    got = fused_ln_ffn_residual(
        jnp.asarray(x), *[jnp.asarray(p, jnp.float32) for p in params],
        activation=activation, interpret=True,
    )
    want = _reference(x, *params, activation=activation)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


@pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")
def test_fused_ffn_uneven_rows(rng):
    """M not divisible by the preferred row block -> R shrinks to a
    divisor of M."""
    B, S, D, F = 3, 7, 32, 64  # M = 21, prime-ish
    x = rng.randn(B, S, D).astype(np.float32)
    params = _rand_params(rng, D, F)
    got = fused_ln_ffn_residual(
        jnp.asarray(x), *[jnp.asarray(p, jnp.float32) for p in params],
        rows_per_block=8, interpret=True,
    )
    want = _reference(x, *params)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


@pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")
def test_fused_ffn_bf16_close_to_xla_path(rng):
    """bf16 activations: kernel (f32 accum) stays within bf16 noise of the
    XLA path's computation."""
    B, S, D, F = 2, 8, 64, 128
    x = rng.randn(B, S, D).astype(np.float32)
    params = _rand_params(rng, D, F)
    got = fused_ln_ffn_residual(
        jnp.asarray(x, jnp.bfloat16),
        *[jnp.asarray(p, jnp.float32) for p in params],
        interpret=True,
    ).astype(np.float32)
    want = _reference(x, *params)
    np.testing.assert_allclose(got, want, atol=0.15, rtol=0.1)


@pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")
def test_block_fused_path_matches_xla_path(rng, monkeypatch):
    """The Block-level wiring: same params, fused output == XLA output.

    Forces the gate on and routes the kernel through interpret mode so the
    whole fused branch (param declaration via _DenseParams/_NormParams +
    kernel call) runs on CPU.
    """
    from layoutdm_tpu.configs import BackboneConfig
    from layoutdm_tpu.models import nn as nn_mod

    cfg = BackboneConfig(
        d_model=64, nhead=4, dim_feedforward=128, num_layers=1,
        dropout=0.0, timestep_type="adalayernorm", diffusion_step=10,
    )
    blk = nn_mod.Block(cfg, dtype=jnp.float32)
    x = jnp.asarray(rng.randn(2, 9, 64), jnp.float32)
    t = jnp.asarray([3, 7], jnp.int32)
    params = blk.init(jax.random.PRNGKey(0), x, t)["params"]
    want = blk.apply({"params": params}, x, t, deterministic=True)

    real_fused = ffn_mod.fused_ln_ffn_residual
    import layoutdm_tpu.ops.ffn as ffn_pkg

    monkeypatch.setattr(
        ffn_pkg, "can_use_fused_ffn", lambda *a, **k: True
    )
    monkeypatch.setattr(
        ffn_pkg,
        "fused_ln_ffn_residual",
        lambda *a, **k: real_fused(*a, **{**k, "interpret": True}),
    )
    got = blk.apply({"params": params}, x, t, deterministic=True)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    # param tree created by the fused branch is identical
    params_fused = blk.init(jax.random.PRNGKey(0), x, t)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_fused
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params_fused)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gate_semantics(monkeypatch):
    if not HAS_PALLAS:
        pytest.skip("pallas unavailable")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # OFF by default: measured tie-in-isolation / loss-in-context
    monkeypatch.delenv("LAYOUTDM_TPU_FUSED_FFN", raising=False)
    assert not can_use_fused_ffn(512, 2048, "gelu2")
    monkeypatch.setenv("LAYOUTDM_TPU_FUSED_FFN", "0")
    assert not can_use_fused_ffn(512, 2048, "gelu2")
    # force-on honours the safety conditions
    monkeypatch.setenv("LAYOUTDM_TPU_FUSED_FFN", "1")
    assert can_use_fused_ffn(512, 2048, "gelu2")
    assert not can_use_fused_ffn(512, 2048, "swiglu")  # unknown activation
    assert not can_use_fused_ffn(8192, 32768, "gelu2")  # VMEM
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert not can_use_fused_ffn(512, 2048, "gelu2")


def test_vmem_sizing():
    # flagship shape comfortably fits; absurd width does not
    assert fits_vmem(512, 2048)
    assert not fits_vmem(8192, 32768)
    r = _auto_rows_per_block(512, 2048, 2)
    assert 8 <= r <= 512
