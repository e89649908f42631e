"""Lane-aligned (d_model-padded) serving mirror: exactness of the padded
construction vs the flax denoiser, pad-lane invariants, predict_start and
full-trajectory parity, gating."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layoutdm_tpu.configs import BackboneConfig, ModelConfig
from layoutdm_tpu.models.dpad_serving import (
    can_use_dpad,
    dpad_target,
    make_dpad_predict_start,
    mirror_forward_dpad,
    pad_weights,
)
from layoutdm_tpu.models.nn import CategoricalTransformer, vocab_pad_target


def _small(seed=0, num_layers=2, d_model=116, ff=232, nhead=4):
    # deliberately misaligned widths (116 % 128 != 0, hd=29 % 64 != 0)
    bb = BackboneConfig(
        d_model=d_model, nhead=nhead, dim_feedforward=ff,
        num_layers=num_layers, dropout=0.0,
        timestep_type="adalayernorm", diffusion_step=20,
    )
    V, S = 33, 15  # 3 elems x 5 attrs
    net = CategoricalTransformer(
        backbone=bb, num_classes=V, max_token_length=S, dtype=jnp.float32
    )
    seq = jnp.asarray(
        np.random.RandomState(seed).randint(0, V, (4, S)), jnp.int32
    )
    t = jnp.asarray([0, 5, 11, 19], jnp.int32)
    params = net.init(jax.random.PRNGKey(seed), seq, t)["params"]
    return bb, net, params, seq, t, V


def test_mirror_matches_flax_forward_f32():
    """The padded widths + masked norms reproduce the flax forward to f32
    summation-order noise; the pad logit lanes carry the -1e9 bias."""
    bb, net, params, seq, t, V = _small()
    want = net.apply({"params": params}, seq, t, deterministic=True)
    got = mirror_forward_dpad(
        pad_weights(params, bb, V), bb, V, seq, t, dtype=jnp.float32
    )
    assert got.shape == (*want.shape[:-1], vocab_pad_target(V))
    # MASK + pad lanes (>= V-1) carry the -1e9 bias by convention
    # (predict_start drops the MASK lane after its log_softmax anyway)
    np.testing.assert_allclose(
        got[..., : V - 1], want[..., : V - 1], atol=2e-5, rtol=2e-5
    )
    assert np.all(np.asarray(got[..., V - 1 :]) <= -1e9 + 1e5)


def test_mirror_matches_flax_forward_bf16():
    # the SERVING dtype: bf16 trunk, f32 norms/head (same split as flax)
    bb, net, params, seq, t, V = _small(seed=1)
    want = net.apply({"params": params}, seq, t, deterministic=True)
    got = mirror_forward_dpad(
        pad_weights(params, bb, V), bb, V, seq, t, dtype=jnp.bfloat16
    )[..., : V - 1]
    want = want[..., : V - 1]
    np.testing.assert_allclose(got, want, atol=0.15, rtol=0.05)
    assert (
        np.mean(np.argmax(got, -1) == np.argmax(np.asarray(want), -1)) > 0.98
    )


def test_pad_lane_invariants():
    """Every padded weight's pad lanes are exact zeros (the construction's
    load-bearing invariant), and Dp/FFp are 128-aligned."""
    bb, net, params, seq, t, V = _small()
    pw = pad_weights(params, bb, V)
    D, FF = bb.d_model, bb.dim_feedforward
    Dp, FFp = dpad_target(D), dpad_target(FF)
    assert Dp % 128 == 0 and FFp % 128 == 0
    assert pw["emb"].shape == (V, Dp)
    assert not np.any(np.asarray(pw["emb"][:, D:]))
    assert not np.any(np.asarray(pw["pe"][:, D:]))
    assert not np.any(np.asarray(pw["l0/w1"][D:, :]))  # zero input rows
    assert not np.any(np.asarray(pw["l0/w1"][:, FF:]))  # zero output cols
    assert not np.any(np.asarray(pw["l0/n2_scale"][D:]))  # norm re-zeroes
    assert not np.any(np.asarray(pw["hn_scale"][D:]))
    assert not np.any(np.asarray(pw["head_w"][D:, :]))
    # head pad lanes biased to -1e9 from the first pad-or-MASK lane
    assert np.all(np.asarray(pw["head_bias"][V - 1 :]) == -1e9)
    assert np.all(np.asarray(pw["head_bias"][: V - 1]) == 0.0)


def test_dpad_predict_start_and_trajectory(monkeypatch):
    """On a LayoutDM model, the dpad predict_start reproduces the plain
    path's log-probs and the full T-step sampled trajectories."""
    from tests.test_model import tiny_model

    model = tiny_model()
    if model.backbone_cfg.d_model % 128 == 0:
        pytest.skip("tiny model already aligned; dpad is a no-op there")
    params = model.init(jax.random.PRNGKey(0))

    dpad_ps = make_dpad_predict_start(model, params)
    ids = jnp.zeros((2, model.seq_len), jnp.int32)
    t = jnp.zeros((2,), jnp.int32)
    lp_plain = model._predict_start(params, ids, t)
    lp_pad = dpad_ps(params, ids, t)
    assert lp_pad.shape == lp_plain.shape
    np.testing.assert_allclose(
        np.asarray(lp_pad), np.asarray(lp_plain), rtol=2e-5, atol=2e-5
    )

    from layoutdm_tpu.models.diffusion.sampler import SamplerCond, sample_chain
    from layoutdm_tpu.configs import SamplingConfig

    cond = SamplerCond.empty(2, model.seq_len, model.num_classes)
    pad_id = model.tokenizer.name_to_id("pad")
    kw = dict(pad_id=pad_id)
    out_plain = sample_chain(
        params, model._predict_start, model.q, jax.random.PRNGKey(3),
        cond, SamplingConfig(name="random"), **kw
    )
    out_pad = sample_chain(
        params, dpad_ps, model.q, jax.random.PRNGKey(3),
        cond, SamplingConfig(name="random"), **kw
    )
    np.testing.assert_array_equal(np.asarray(out_plain), np.asarray(out_pad))


def test_can_use_dpad_gate(monkeypatch):
    bb = BackboneConfig(
        d_model=464, nhead=8, dim_feedforward=1856, num_layers=4,
        dropout=0.0, timestep_type="adalayernorm", diffusion_step=100,
    )
    monkeypatch.delenv("LAYOUTDM_TPU_DPAD", raising=False)
    assert not can_use_dpad(bb)  # default OFF pending the ledger entry
    monkeypatch.setenv("LAYOUTDM_TPU_DPAD", "1")
    assert can_use_dpad(bb)
    assert not can_use_dpad(bb, lookahead=False)  # no mask support
    assert not can_use_dpad(bb, pos_emb="default")
    import dataclasses

    aligned = dataclasses.replace(bb, d_model=512, dim_feedforward=2048)
    assert not can_use_dpad(aligned)  # padding is a no-op there
    mlp = dataclasses.replace(bb, timestep_type="adalayernorm_mlp")
    assert not can_use_dpad(mlp)
