"""Differentiable weight-scattered padded-head attention (training path).

The serving side adopted weight-padded heads in round 3 (+5% headline);
`use_train_headpad_w` brings the same construction to the jax.grad-wrapped
training path, where the pallas kernels can't go.  The scatter is a
constant linear index map, so forward AND gradients must match the plain
XLA attention exactly (up to f32 accumulation order).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layoutdm_tpu.models.nn import SelfAttention


def _mk(rng, B=2, S=13, D=232, H=4):
    x = jax.random.normal(rng, (B, S, D), jnp.float32)
    kpm = jnp.zeros((B, S), bool).at[:, -3:].set(True)
    return x, kpm


def _run(monkeypatch, enabled, dropout=0.0, deterministic=True, kpm=None):
    if enabled:
        monkeypatch.setenv("LAYOUTDM_TPU_TRAIN_HEADPAD", "1")
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    else:
        monkeypatch.delenv("LAYOUTDM_TPU_TRAIN_HEADPAD", raising=False)
    x, kpm_default = _mk(jax.random.PRNGKey(0))
    if kpm is None:
        kpm = kpm_default
    attn = SelfAttention(d_model=232, nhead=4, dropout=dropout)
    params = attn.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        x, None, kpm, deterministic,
    )

    def loss(p):
        out = attn.apply(
            p, x, None, kpm, deterministic,
            rngs=None if deterministic else {"dropout": jax.random.PRNGKey(3)},
        )
        return jnp.sum(out**2), out

    (l, out), grads = jax.value_and_grad(loss, has_aux=True)(params)
    return l, out, grads, params


def test_train_headpad_param_tree_identical(monkeypatch):
    """Flipping the gate must not change the checkpoint format."""
    *_, p_on = _run(monkeypatch, True)
    *_, p_off = _run(monkeypatch, False)
    flat_on = jax.tree_util.tree_map(lambda a: a.shape, p_on)
    flat_off = jax.tree_util.tree_map(lambda a: a.shape, p_off)
    assert flat_on == flat_off


def test_train_headpad_grads_match_plain(monkeypatch):
    """hd = 232/4 = 58 (the flagship's misaligned head size): forward and
    every parameter gradient agree between the scattered and plain paths."""
    l1, out1, g1, _ = _run(monkeypatch, True)
    l0, out0, g0, _ = _run(monkeypatch, False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0), atol=2e-5)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat0 = dict(jax.tree_util.tree_leaves_with_path(g0))
    for path, leaf in flat1:
        ref = flat0[path]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(ref), atol=3e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_train_headpad_dropout_path_finite(monkeypatch):
    """Non-deterministic (training) call with attention dropout runs and
    differentiates on the scattered path."""
    l, out, grads, _ = _run(
        monkeypatch, True, dropout=0.5, deterministic=False
    )
    assert np.isfinite(float(l))
    assert all(
        bool(jnp.all(jnp.isfinite(g)))
        for g in jax.tree_util.tree_leaves(grads)
    )


def test_train_headpad_gate(monkeypatch):
    from layoutdm_tpu.ops.attention import use_train_headpad_w

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # OFF by default — a measured wash (26.90 vs 26.95 ms/step, §6 ledger)
    monkeypatch.delenv("LAYOUTDM_TPU_TRAIN_HEADPAD", raising=False)
    assert not use_train_headpad_w(58)
    monkeypatch.setenv("LAYOUTDM_TPU_TRAIN_HEADPAD", "1")
    assert use_train_headpad_w(58)
    assert not use_train_headpad_w(64)  # aligned -> nothing to pad
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert not use_train_headpad_w(58)
