"""Continuous diffusion family: DiffusionLM + BitDiffusion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from layoutdm_tpu.configs import BackboneConfig, ModelConfig, SamplingConfig
from layoutdm_tpu.models.continuous.models import (
    BitDiffusion,
    DiffusionLM,
    LayoutContinuousDiffusion,
    ids_to_bits,
)
from layoutdm_tpu.tasks import get_cond, to_sampler_cond
from tests.test_tokenizer import make_tokenizer, random_layout

BB = BackboneConfig(
    d_model=128, nhead=4, dim_feedforward=64, num_layers=1, dropout=0.0,
    timestep_type="adalayernorm_mlp", diffusion_step=8,
)


def tok():
    return make_tokenizer(
        shared_vocab="x-y-w-h", num_categories=4, max_elements=4
    )


def test_ids_to_bits_roundtrip():
    ids = jnp.arange(256)[None]
    bits = ids_to_bits(ids, 8)
    assert bits.shape == (1, 256, 8)
    back = ((bits > 0).astype(jnp.int32) * (2 ** jnp.arange(7, -1, -1))).sum(-1)
    np.testing.assert_array_equal(np.asarray(back), np.arange(256)[None])


@pytest.mark.parametrize("cls,kw", [
    (DiffusionLM, dict(num_channel=16, use_clamping_trick=True)),
    (BitDiffusion, dict(use_self_condition=True)),
])
def test_continuous_loss_and_sampling(rng, cls, kw):
    t = tok()
    model = cls(BB, t, num_timesteps=8, **kw)
    params = model.init(jax.random.PRNGKey(0))
    layout = random_layout(rng, B=4, S=4, n_cat=4)
    tokens = model.preprocess(layout)

    def f(p):
        losses, _ = model.loss(
            p, jax.random.PRNGKey(1), tokens, model.init_state()
        )
        return sum(losses.values()), losses

    (val, losses), grads = jax.value_and_grad(f, has_aux=True)(params)
    assert np.isfinite(float(val))
    assert "mse_loss" in losses and "tT_loss" in losses
    if cls is DiffusionLM:
        assert "rounding_loss" in losses
    g = sum(float(jnp.sum(x**2)) for x in jax.tree.leaves(grads))
    assert np.isfinite(g) and g > 0

    for use_ddim in (False, True):
        ids = model.sample_ids(
            params, jax.random.PRNGKey(2), 2,
            sampling=SamplingConfig(num_timesteps=4), use_ddim=use_ddim,
        )
        assert ids.shape == (2, model.seq_len)
        assert (np.asarray(ids) >= 0).all()
        assert (np.asarray(ids) < 2**16).all()


def test_bitdiffusion_decodes_legal_tokens(rng):
    t = tok()
    model = BitDiffusion(BB, t, num_timesteps=4)
    params = model.init(jax.random.PRNGKey(0))
    arr = jnp.asarray(rng.randn(2, model.seq_len, 8), jnp.float32)
    ids = np.asarray(model.con2dis(params, arr))
    legal = np.asarray(model.legal)
    for b in range(2):
        for s in range(model.seq_len):
            assert legal[s, ids[b, s]]


def test_diffusionlm_conditional_inpainting(rng):
    t = tok()
    model = DiffusionLM(BB, t, num_timesteps=4, num_channel=16,
                        use_clamping_trick=True)
    params = model.init(jax.random.PRNGKey(0))
    layout = random_layout(rng, B=2, S=4, n_cat=4)
    cond = get_cond(jax.random.PRNGKey(1), layout, t, "c")
    sc = to_sampler_cond(cond, t, SamplingConfig())
    ids = model.sample_ids(
        params, jax.random.PRNGKey(2), 2, cond=sc,
        sampling=SamplingConfig(num_timesteps=4),
    )
    assert ids.shape == (2, model.seq_len)


def test_wrapper_factory():
    t = tok()
    m = LayoutContinuousDiffusion(
        BB, t, ModelConfig(name="bitdiffusion", num_timesteps=4)
    )
    assert isinstance(m.model, BitDiffusion)
    m2 = LayoutContinuousDiffusion(
        BB, t, ModelConfig(name="diffusionlm", num_timesteps=4)
    )
    assert isinstance(m2.model, DiffusionLM)
    params = m2.init(jax.random.PRNGKey(0))
    out = m2.sample(params, jax.random.PRNGKey(1), 2,
                    sampling=SamplingConfig(num_timesteps=2))
    assert out["bbox"].shape == (2, 4, 4)
