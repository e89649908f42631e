"""Fused packed-qkv attention kernel: correctness (interpret mode on CPU),
gate semantics, and VMEM block sizing."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layoutdm_tpu.ops.attention import (
    HAS_PALLAS,
    _auto_batch_per_block,
    can_use_fused,
    fits_vmem,
    fused_attention_qkv,
)


def _reference(qkv, H):
    B, S, D3 = qkv.shape
    D = D3 // 3
    hd = D // H
    q, k, v = np.split(qkv, 3, axis=-1)
    q4, k4, v4 = [x.reshape(B, S, H, hd) for x in (q, k, v)]
    s = jnp.einsum("bihd,bjhd->bhij", q4, k4) / math.sqrt(hd)
    return jnp.einsum(
        "bhij,bjhd->bihd", jax.nn.softmax(s, -1), jnp.asarray(v4)
    ).reshape(B, S, D)


@pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")
def test_fused_qkv_matches_reference(rng):
    B, S, H, hd = 2, 25, 4, 16
    qkv = rng.randn(B, S, 3 * H * hd).astype(np.float32)
    got = fused_attention_qkv(jnp.asarray(qkv), num_heads=H, interpret=True)
    np.testing.assert_allclose(got, _reference(qkv, H), atol=1e-4)


@pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")
def test_fused_qkv_uneven_batch_blocks(rng):
    """B not divisible by the preferred block -> Gb shrinks to a divisor."""
    B, S, H, hd = 6, 10, 2, 8
    qkv = rng.randn(B, S, 3 * H * hd).astype(np.float32)
    got = fused_attention_qkv(
        jnp.asarray(qkv), num_heads=H, batch_per_block=4, interpret=True
    )
    np.testing.assert_allclose(got, _reference(qkv, H), atol=1e-4)


def test_can_use_fused_gates(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("LAYOUTDM_TPU_FUSED_ATTN", raising=False)
    if not HAS_PALLAS:
        pytest.skip("pallas unavailable")
    # default ON for mask-free dense attention (never worse, DESIGN §6)
    for S in (125, 250, 500):
        assert can_use_fused(S, None, None)
    # masks -> XLA path
    assert not can_use_fused(125, jnp.zeros((4, 4)), None)
    assert not can_use_fused(125, None, jnp.zeros((2, 4), bool))
    # env force both ways
    monkeypatch.setenv("LAYOUTDM_TPU_FUSED_ATTN", "0")
    assert not can_use_fused(500, None, None)
    monkeypatch.setenv("LAYOUTDM_TPU_FUSED_ATTN", "1")
    assert can_use_fused(125, None, None)


def test_gate_off_on_cpu(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    monkeypatch.delenv("LAYOUTDM_TPU_FUSED_ATTN", raising=False)
    assert not can_use_fused(125, None, None)


def test_vmem_fit_guard(monkeypatch):
    """Shapes whose single-row working set exceeds VMEM fall back to XLA
    instead of failing to compile."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("LAYOUTDM_TPU_FUSED_ATTN", raising=False)
    if not HAS_PALLAS:
        pytest.skip("pallas unavailable")
    assert fits_vmem(125, 464)
    assert fits_vmem(500, 464)
    assert not fits_vmem(4000, 464)  # score buffers alone blow VMEM
    assert can_use_fused(500, None, None, d_model=464)
    assert not can_use_fused(4000, None, None, d_model=464)


def test_auto_batch_per_block_fits_vmem():
    from layoutdm_tpu.ops.attention import _VMEM_BUDGET, _vmem_per_row

    for S in (125, 250, 500, 1000):
        g = _auto_batch_per_block(S, 464, 2)
        assert g >= 1
        assert g * _vmem_per_row(S, 464, 2) <= _VMEM_BUDGET or g == 1
    assert _auto_batch_per_block(125, 464, 2) >= _auto_batch_per_block(
        500, 464, 2
    )
    # the observed Mosaic OOM case (S=125, 16 rows ~ 20MB) is excluded
    assert 16 * _vmem_per_row(125, 464, 2) > _VMEM_BUDGET


def test_head_pad_exactness(monkeypatch):
    """Zero-padding heads to a lane multiple is mathematically exact: the
    XLA attention path with hd=58 padded to 64 equals the unpadded path."""
    from layoutdm_tpu.configs import BackboneConfig
    from layoutdm_tpu.models.nn import SelfAttention
    import layoutdm_tpu.ops.attention as att

    B, S, D, H = 2, 9, 232, 4  # hd = 58, the flagship misalignment
    mod = SelfAttention(D, H, 0.0)
    x = jnp.asarray(np.random.RandomState(0).randn(B, S, D), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]

    monkeypatch.setenv("LAYOUTDM_TPU_HEAD_PAD", "0")
    want = mod.apply({"params": params}, x)
    monkeypatch.setenv("LAYOUTDM_TPU_HEAD_PAD", "1")  # off by default
    monkeypatch.setenv("LAYOUTDM_TPU_FUSED_ATTN", "0")  # force XLA path
    monkeypatch.setenv("LAYOUTDM_TPU_HEADPAD_W", "0")  # keep pallas off (CPU)
    monkeypatch.setattr(att.jax, "default_backend", lambda: "tpu")
    assert att.use_head_pad(58)
    got = mod.apply({"params": params}, x)
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=2e-6)

    # grads flow identically (pad/slice are linear)
    def loss(p, fn_env):
        return jnp.sum(mod.apply({"params": p}, x) ** 2)

    g1 = jax.grad(loss)(params, None)
    monkeypatch.setenv("LAYOUTDM_TPU_HEAD_PAD", "0")
    g2 = jax.grad(loss)(params, None)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)


def test_head_pad_target():
    from layoutdm_tpu.ops.attention import head_pad_target

    assert head_pad_target(58) == 64
    assert head_pad_target(64) == 64
    assert head_pad_target(65) == 128
    assert head_pad_target(128) == 128


@pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")
def test_weight_padded_heads_matches_reference(rng):
    """The weight-padded-head path (scatter qkv/out weights to 64-aligned
    head blocks, run the SAME per-head kernel on the padded slab) equals
    plain attention: the extra lanes are zero columns/rows end-to-end."""
    from layoutdm_tpu.ops.attention_blockdiag import (
        scatter_out_weights,
        scatter_qkv_weights,
    )

    B, S, H, hd, hp = 2, 9, 4, 58, 64
    D = H * hd
    x = rng.randn(B, S, D).astype(np.float32)
    wq = rng.randn(D, 3 * D).astype(np.float32) * 0.05
    bq = rng.randn(3 * D).astype(np.float32) * 0.05
    wo = rng.randn(D, D).astype(np.float32) * 0.05

    qkv = x @ wq + bq
    want = np.asarray(_reference(qkv, H) @ wo)

    wp, bp = scatter_qkv_weights(jnp.asarray(wq), jnp.asarray(bq), H, hd, hp)
    assert wp.shape == (D, 3 * H * hp)
    qkv_pad = jnp.asarray(x) @ wp + bp
    o = fused_attention_qkv(
        qkv_pad, num_heads=H, interpret=True, scale=1.0 / math.sqrt(hd)
    )
    wop = scatter_out_weights(jnp.asarray(wo), H, hd, hp)
    got = np.asarray(o @ wop)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_can_use_padded_qkv_gate(monkeypatch):
    from layoutdm_tpu.ops.attention import can_use_padded_qkv

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    import layoutdm_tpu.ops.attention as att

    monkeypatch.setattr(att.jax, "default_backend", lambda: "tpu")
    # default ON where it applies
    monkeypatch.delenv("LAYOUTDM_TPU_HEADPAD_W", raising=False)
    assert can_use_padded_qkv(125, None, None, hd=58)
    # aligned heads: plain fused path is identical, padding pointless
    assert not can_use_padded_qkv(125, None, None, hd=64)
    # masks force the XLA path
    assert not can_use_padded_qkv(125, jnp.zeros((125, 125)), None, hd=58)
    # kill switch
    monkeypatch.setenv("LAYOUTDM_TPU_HEADPAD_W", "0")
    assert not can_use_padded_qkv(125, None, None, hd=58)


@pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")
def test_fused_block_matches_reference(rng):
    """The whole-sandwich kernel (qkv proj + attention + out proj +
    residual in one pallas call; gated experiment, LAYOUTDM_TPU_FUSED_BLOCK)
    matches plain attention.  Interpret mode emulates the MXU's DEFAULT
    bf16 operand rounding for the attention dots, hence the loose
    tolerance; the projections run HIGHEST (exact f32)."""
    from layoutdm_tpu.ops.attention import (
        fused_attention_block,
        head_pad_target,
    )
    from layoutdm_tpu.ops.attention_blockdiag import (
        scatter_out_weights,
        scatter_qkv_weights,
    )

    B, S, H, hd = 4, 9, 4, 58
    D = H * hd
    hp = head_pad_target(hd)
    x = rng.randn(B, S, D).astype(np.float32)
    wq = (rng.randn(D, 3 * D) * 0.05).astype(np.float32)
    bq = (rng.randn(3 * D) * 0.05).astype(np.float32)
    wo = (rng.randn(D, D) * 0.05).astype(np.float32)
    bo = (rng.randn(D) * 0.05).astype(np.float32)

    want = np.asarray(_reference(x @ wq + bq, H) @ wo + bo + x)

    wp, bp = scatter_qkv_weights(jnp.asarray(wq), jnp.asarray(bq), H, hd, hp)
    wop = scatter_out_weights(jnp.asarray(wo), H, hd, hp)
    got = fused_attention_block(
        jnp.asarray(x), wp, bp, wop, jnp.asarray(bo),
        num_heads=H, head_pad=hp, scale=1.0 / math.sqrt(hd),
        residual=True, batch_per_block=2, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=6e-3, rtol=6e-3)


def test_can_use_fused_block_gate(monkeypatch):
    from layoutdm_tpu.ops.attention import can_use_fused_block

    import layoutdm_tpu.ops.attention as att

    monkeypatch.setattr(att.jax, "default_backend", lambda: "tpu")
    # OFF by default: a measured negative result at flagship shapes
    monkeypatch.delenv("LAYOUTDM_TPU_FUSED_BLOCK", raising=False)
    assert not can_use_fused_block(125, None, None, hd=58)
    monkeypatch.setenv("LAYOUTDM_TPU_FUSED_BLOCK", "1")
    assert can_use_fused_block(125, None, None, hd=58, d_model=464)
    assert not can_use_fused_block(125, jnp.zeros((125, 125)), None, hd=58)


@pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")
def test_smajor_matches_bmajor(rng):
    """`fused_attention_qkv_smajor(swapaxes(qkv,0,1), bias)` must equal
    `fused_attention_qkv(qkv + bias)` — including a batch_per_block that
    does not divide B (Gb shrinks to a divisor)."""
    from layoutdm_tpu.ops.attention import fused_attention_qkv_smajor

    B, S, H, hd = 4, 10, 2, 8
    qkv = rng.randn(B, S, 3 * H * hd).astype(np.float32)
    bias = rng.randn(3 * H * hd).astype(np.float32)

    want = fused_attention_qkv(
        jnp.asarray(qkv + bias), num_heads=H, interpret=True
    )
    got = fused_attention_qkv_smajor(
        jnp.swapaxes(jnp.asarray(qkv), 0, 1), jnp.asarray(bias),
        num_heads=H, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    got3 = fused_attention_qkv_smajor(
        jnp.swapaxes(jnp.asarray(qkv), 0, 1), jnp.asarray(bias),
        num_heads=H, batch_per_block=3, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got3), np.asarray(want), atol=1e-5)


def test_can_use_smajor_gate(monkeypatch):
    """OFF by default (unmeasured end-to-end); LAYOUTDM_TPU_SMAJOR=1 turns
    it on subject to the same safety conditions as the B-major gate, with
    the S-major kernel's larger VMEM model."""
    from layoutdm_tpu.ops.attention import (
        _VMEM_BUDGET,
        _auto_batch_per_block_smajor,
        _vmem_per_row_smajor,
        can_use_smajor,
    )

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("LAYOUTDM_TPU_SMAJOR", raising=False)
    assert not can_use_smajor(125, None, None, d_model=512)
    monkeypatch.setenv("LAYOUTDM_TPU_SMAJOR", "1")
    if not HAS_PALLAS:
        pytest.skip("pallas unavailable")
    assert can_use_smajor(125, None, None, d_model=512)
    # masks -> XLA path
    assert not can_use_smajor(125, jnp.zeros((125, 125)), None, d_model=512)
    # Mosaic's sublane constraint forces the batch group to a multiple of
    # 8; at the calibration point (S=125, D=512) the budget admits <8 rows
    # so the chooser returns the legal minimum of 8 (observed 18.1MB at
    # Gb=8 compiles), and never over-picks: the next step up (16) would
    # double that.
    gb = _auto_batch_per_block_smajor(125, 512, 2)
    assert gb == 8
    assert gb % 8 == 0
    # a smaller shape where the budget truly allows more: pick a multiple
    # of 8 under the budget
    gb2 = _auto_batch_per_block_smajor(25, 128, 2)
    assert gb2 % 8 == 0
    assert gb2 >= 8
    assert (
        gb2 > 8
        and gb2 * _vmem_per_row_smajor(25, 128, 2) <= _VMEM_BUDGET
        or gb2 == 8
    )
