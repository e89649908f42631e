"""Continuous-diffusion parity against the REFERENCE'S OWN code.

Closes the last twin-verified family: DiffusionLM / BitDiffusion
(`models/continuous_diffusion/{base,diffusion_lm,bitdiffusion}.py`) were
property-tested only.  This file imports the reference's own modules (via
ref_shim), ports its random-init torch weights into our flax
`ContinuousTransformer` with `convert_continuous_transformer`, and asserts:

  (a) the log-SNR schedules and alpha/sigma conversion golden-equal
      (`base.py:42-53`)
  (b) the discrete<->continuous codecs: DiffusionLM emb/rounder
      (`diffusion_lm.py:24-75`) and BitDiffusion analog bits + the
      nearest-legal-code decode (`bitdiffusion.py:12-47`)
  (c) FULL DDIM reverse chains token-identical under a shared injected
      initial noise — DiffusionLM (clamping trick, uncond + conditional
      inpainting) and BitDiffusion (self-conditioning) (`base.py:256-313`)
  (d) FULL DDPM reverse chains token-identical under shared per-step noise
      streams (`base.py:316-381`)
  (e) the training loss terms (mse with the t0 mix, tT, rounding CE) equal
      under injected times/noise/self-cond gate (`base.py:154-208`)

Reference quirk found while building this: BitDiffusion's `dis2con` always
returns a tuple, so the reference's own *conditional* sampling path
(`base.py:222-225`) crashes for BitDiffusion (`cond["arr"].size` on a
tuple); conditional chains are therefore parity-tested on DiffusionLM only,
and our working BitDiffusion cond path is covered by tests/test_continuous.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from layoutdm_tpu import tasks as my_tasks
from layoutdm_tpu.configs import BackboneConfig, SamplingConfig
from layoutdm_tpu.models.continuous.base import (
    alpha_cosine_log_snr,
    beta_linear_log_snr,
    log_snr_to_alpha_sigma,
)
from layoutdm_tpu.models.continuous.models import (
    BitDiffusion as MyBit,
    DiffusionLM as MyDLM,
    ids_to_bits as my_ids_to_bits,
)
from layoutdm_tpu.registry import DATASET_LABELS
from layoutdm_tpu.tokenizer.bbox import BboxTokenizer
from layoutdm_tpu.tokenizer.sequence import LayoutSequenceTokenizer
from layoutdm_tpu.utils.torch_port import convert_continuous_transformer

from tests import ref_shim

ref_shim.install_stubs()

import trainer.models.continuous_diffusion.base as ref_base  # noqa: E402
import trainer.models.continuous_diffusion.bitdiffusion as ref_bit_mod  # noqa: E402
import trainer.models.continuous_diffusion.diffusion_lm as ref_dlm_mod  # noqa: E402
from trainer.models.common.util import shrink as ref_shrink  # noqa: E402
from hydra.utils import instantiate as ref_instantiate  # noqa: E402

S_ELEM = 4  # elements -> 20 tokens
T = 5


def my_tokenizer():
    bb = BboxTokenizer(num_bins=32, var_order=("x", "y", "w", "h"),
                       shared_vocab="x-y-w-h")
    return LayoutSequenceTokenizer(
        bbox_tokenizer=bb, num_categories=len(DATASET_LABELS["rico25"]),
        max_elements=S_ELEM, special_tokens=("pad", "mask"),
        pad_until_max=True,
    )


def _ref_backbone():
    """(71, 142) pre-shrink dims so the 29/32 shrink the wrapper applies
    (`layout_continuous_diffusion.py:44-46`, mirrored by our base) lands on
    (64, 128)."""
    cfg = ref_shim.make_backbone_cfg(
        d_model=71, nhead=4, dim_feedforward=142, num_layers=2,
        timestep_type="adalayernorm_mlp", num_timesteps=T,
    )
    return ref_instantiate(ref_shrink(cfg, 29 / 32))


MY_BB = BackboneConfig(
    d_model=71, nhead=4, dim_feedforward=142, num_layers=2, dropout=0.0,
    timestep_type="adalayernorm_mlp", diffusion_step=T,
)


def _build_dlm_pair():
    torch.manual_seed(23)
    ref_tok = ref_shim.make_ref_tokenizer(max_seq_length=S_ELEM)
    ref_m = ref_dlm_mod.DiffusionLM(
        backbone=_ref_backbone(),
        tokenizer=ref_tok,
        dim_model=64,
        max_len=ref_tok.max_token_length,
        num_channel=16,
        pos_emb="elem_attr",
        num_timesteps=T,
        use_self_condition=False,
        noise_schedule="cosine",
        use_clamping_trick=True,
    ).eval()

    my_tok = my_tokenizer()
    my_m = MyDLM(
        MY_BB, my_tok, num_timesteps=T, noise_schedule="cosine",
        num_channel=16, use_self_condition=False, use_clamping_trick=True,
    )
    sd = ref_m.state_dict()
    params = convert_continuous_transformer(
        sd, num_layers=2, timestep_type="adalayernorm_mlp",
        prefix="transformer.",
    )
    # the codec weights travel too: frozen token embedding + rounder
    my_m.token_emb = jnp.asarray(sd["token_emb.weight"].numpy())
    params["rounder"] = {
        "kernel": jnp.asarray(sd["rounder.weight"].numpy().T),
        "bias": jnp.asarray(sd["rounder.bias"].numpy()),
    }
    return ref_m, my_m, my_tok, params


def _build_bit_pair():
    torch.manual_seed(29)
    ref_tok = ref_shim.make_ref_tokenizer(max_seq_length=S_ELEM)
    ref_m = ref_bit_mod.BitDiffusion(
        backbone=_ref_backbone(),
        tokenizer=ref_tok,
        dim_model=64,
        max_len=ref_tok.max_token_length,
        num_channel=8,
        pos_emb="elem_attr",
        num_timesteps=T,
        use_self_condition=True,
        noise_schedule="cosine",
        use_clamping_trick=False,
    ).eval()

    my_tok = my_tokenizer()
    my_m = MyBit(
        MY_BB, my_tok, num_timesteps=T, noise_schedule="cosine",
        num_channel=8, use_self_condition=True, use_clamping_trick=False,
    )
    params = convert_continuous_transformer(
        ref_m.state_dict(), num_layers=2, timestep_type="adalayernorm_mlp",
        prefix="transformer.",
    )
    return ref_m, my_m, my_tok, params


def _clean_seq(rng, tok, B):
    """Random clean token sequences via the tokenizer's own encode."""
    n = rng.randint(1, S_ELEM + 1, size=(B,))
    mask = np.arange(S_ELEM)[None, :] < n[:, None]
    label = (rng.randint(0, tok.N_category, (B, S_ELEM)) * mask).astype(
        np.int64
    )
    bbox = rng.rand(B, S_ELEM, 4).astype(np.float32) * mask[..., None]
    return np.asarray(
        tok.encode({"label": label, "bbox": bbox, "mask": mask})["seq"],
        np.int64,
    ), (label, bbox, mask)


# ---------------------------------------------------------------------------
# (a) schedules
# ---------------------------------------------------------------------------


def test_log_snr_schedules_parity():
    t = np.linspace(0.0, 0.999, 57, dtype=np.float32)
    tt = torch.from_numpy(t)
    np.testing.assert_allclose(
        np.asarray(beta_linear_log_snr(jnp.asarray(t))),
        ref_base.beta_linear_log_snr(tt).numpy(), rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(alpha_cosine_log_snr(jnp.asarray(t))),
        ref_base.alpha_cosine_log_snr(tt).numpy(), rtol=1e-5, atol=1e-5,
    )
    ls = np.linspace(-12.0, 12.0, 41, dtype=np.float32)
    a, s = log_snr_to_alpha_sigma(jnp.asarray(ls))
    ra, rs = ref_base.log_snr_to_alpha_sigma(torch.from_numpy(ls))
    np.testing.assert_allclose(np.asarray(a), ra.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s), rs.numpy(), atol=1e-6)


# ---------------------------------------------------------------------------
# (b) codecs
# ---------------------------------------------------------------------------


def test_dlm_codec_parity(rng):
    ref_m, my_m, my_tok, params = _build_dlm_pair()
    seq, _ = _clean_seq(rng, my_tok, B=4)
    with torch.no_grad():
        ref_emb = ref_m.dis2con(torch.from_numpy(seq)).numpy()
    my_emb, my_mean = my_m.dis2con(params, jnp.asarray(seq))
    np.testing.assert_allclose(np.asarray(my_emb), ref_emb, atol=1e-6)
    np.testing.assert_allclose(np.asarray(my_mean), ref_emb, atol=1e-6)

    arr = rng.randn(4, my_m.seq_len, 16).astype(np.float32)
    with torch.no_grad():
        ref_logits = ref_m.con2logits(torch.from_numpy(arr)).numpy()
        ref_ids = ref_m.con2dis(torch.from_numpy(arr)).numpy()
    np.testing.assert_allclose(
        np.asarray(my_m.con2logits(params, jnp.asarray(arr))), ref_logits,
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(my_m.con2dis(params, jnp.asarray(arr))), ref_ids
    )


def test_bit_codec_parity(rng):
    ref_m, my_m, my_tok, params = _build_bit_pair()
    seq, _ = _clean_seq(rng, my_tok, B=4)
    ref_bits = ref_bit_mod.ids_to_bits(torch.from_numpy(seq), 8).numpy()
    np.testing.assert_array_equal(
        np.asarray(my_ids_to_bits(jnp.asarray(seq), 8)), ref_bits
    )
    # nearest-legal decode on noisy analog bits
    arr = (ref_bits + 0.7 * rng.randn(*ref_bits.shape)).astype(np.float32)
    ref_ids = ref_bit_mod.bits_to_ids(
        torch.from_numpy(arr), 8, tokenizer=ref_m.tokenizer
    ).numpy()
    np.testing.assert_array_equal(
        np.asarray(my_m.con2dis(params, jnp.asarray(arr))), ref_ids
    )


# ---------------------------------------------------------------------------
# noise-injection plumbing: replicate our sampler's exact JAX noise draws and
# feed them to the reference through patched torch.randn / torch.randn_like
# ---------------------------------------------------------------------------


def _jax_chain_noise(key, B, S, C, steps_with_noise):
    """Replays `ContinuousDiffusionBase.sample_ids`'s split sequence."""
    key, r0 = jax.random.split(key)
    init = np.asarray(jax.random.normal(r0, (B, S, C)))
    per_step = []
    for _ in range(steps_with_noise):
        key, r_n = jax.random.split(key)
        per_step.append(np.asarray(jax.random.normal(r_n, (B, S, C))))
    return init, per_step


def _patch_torch_noise(monkeypatch, init_np, per_step):
    q = [torch.from_numpy(x).clone() for x in per_step]
    monkeypatch.setattr(
        torch, "randn", lambda *a, **k: torch.from_numpy(init_np).clone()
    )
    monkeypatch.setattr(torch, "randn_like", lambda t: q.pop(0))


# ---------------------------------------------------------------------------
# (c) DDIM full chains
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cond_type", [None, "c"])
def test_dlm_ddim_chain_parity(rng, monkeypatch, cond_type):
    ref_m, my_m, my_tok, params = _build_dlm_pair()
    B = 3
    init, _ = _jax_chain_noise(jax.random.PRNGKey(0), B, my_m.seq_len, 16, 0)
    _patch_torch_noise(monkeypatch, init, [])

    sc, ref_cond = None, None
    if cond_type is not None:
        _, (label, bbox, mask) = _clean_seq(rng, my_tok, B)
        my_cond = my_tasks.get_cond(
            jax.random.PRNGKey(1),
            {"label": label, "bbox": bbox, "mask": mask}, my_tok, cond_type,
        )
        ref_cond = {
            "seq": torch.from_numpy(np.asarray(my_cond["seq"], np.int64)),
            "mask": torch.from_numpy(np.asarray(my_cond["mask"]).copy()),
            "type": cond_type,
        }
        sc = my_tasks.to_sampler_cond(my_cond, my_tok, SamplingConfig())

    with torch.no_grad():
        ref_ids = ref_m.sample(
            batch_size=B, cond=ref_cond,
            sampling_cfg=ref_shim.AttrDict(
                num_timesteps=T, use_ddim=True, time_difference=0.0
            ),
        ).numpy()
    my_ids = np.asarray(
        my_m.sample_ids(
            params, jax.random.PRNGKey(0), B, cond=sc,
            sampling=SamplingConfig(num_timesteps=T), use_ddim=True,
        )
    )
    np.testing.assert_array_equal(my_ids, ref_ids)


def test_bit_ddim_chain_parity(monkeypatch):
    ref_m, my_m, my_tok, params = _build_bit_pair()
    B = 3
    init, _ = _jax_chain_noise(jax.random.PRNGKey(2), B, my_m.seq_len, 8, 0)
    _patch_torch_noise(monkeypatch, init, [])
    with torch.no_grad():
        ref_ids = ref_m.sample(
            batch_size=B, cond=None,
            sampling_cfg=ref_shim.AttrDict(
                num_timesteps=T, use_ddim=True, time_difference=0.0
            ),
        ).numpy()
    my_ids = np.asarray(
        my_m.sample_ids(
            params, jax.random.PRNGKey(2), B,
            sampling=SamplingConfig(num_timesteps=T), use_ddim=True,
        )
    )
    np.testing.assert_array_equal(my_ids, ref_ids)


# ---------------------------------------------------------------------------
# (d) DDPM full chains (per-step noise stream shared)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("family", ["dlm", "bit"])
def test_ddpm_chain_parity(rng, monkeypatch, family):
    if family == "dlm":
        ref_m, my_m, my_tok, params = _build_dlm_pair()
        C = 16
    else:
        ref_m, my_m, my_tok, params = _build_bit_pair()
        C = 8
    B = 3
    init, per_step = _jax_chain_noise(
        jax.random.PRNGKey(3), B, my_m.seq_len, C, T
    )
    _patch_torch_noise(monkeypatch, init, per_step)
    with torch.no_grad():
        ref_ids = ref_m.sample(
            batch_size=B, cond=None,
            sampling_cfg=ref_shim.AttrDict(
                num_timesteps=T, use_ddim=False, time_difference=0.0
            ),
        ).numpy()
    my_ids = np.asarray(
        my_m.sample_ids(
            params, jax.random.PRNGKey(3), B,
            sampling=SamplingConfig(num_timesteps=T), use_ddim=False,
        )
    )
    np.testing.assert_array_equal(my_ids, ref_ids)


# ---------------------------------------------------------------------------
# (e) training loss terms
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("family", ["dlm", "bit"])
def test_continuous_loss_parity(rng, monkeypatch, family):
    """Drives the reference's own forward() (`base.py:154-208`) with our
    exact jax noise draws injected through patched torch RNG entry points,
    asserting every loss term."""
    if family == "dlm":
        ref_m, my_m, my_tok, params = _build_dlm_pair()
        C = 16
    else:
        ref_m, my_m, my_tok, params = _build_bit_pair()
        C = 8
    B = 4
    seq, _ = _clean_seq(rng, my_tok, B)
    key = jax.random.PRNGKey(7)

    # replicate our loss()'s split order exactly
    r_t, r_noise, r_rep, r_sc, _ = jax.random.split(key, 5)
    times = np.asarray(jax.random.uniform(r_t, (B,), maxval=0.999))
    S = my_m.seq_len
    noise = np.asarray(jax.random.normal(r_noise, (B, S, C)))
    rep = np.asarray(jax.random.normal(r_rep, (B, S, C)))
    use_sc = bool(jax.random.bernoulli(r_sc))

    # times: forward() draws them via Tensor.uniform_ (`base.py:164`)
    def fake_uniform_(self, a=0.0, b=1.0):
        self.copy_(torch.from_numpy(times))
        return self

    monkeypatch.setattr(torch.Tensor, "uniform_", fake_uniform_)
    # randn_like queue: DiffusionLM's dis2con reparametrization draws first
    # (`diffusion_lm.py:50`), then the corruption noise (`base.py:165`)
    q = [torch.from_numpy(rep), torch.from_numpy(noise)]
    if family == "bit":
        q = q[1:]
    monkeypatch.setattr(torch, "randn_like", lambda t: q.pop(0))
    # the self-conditioning coin flip (`base.py:174`)
    monkeypatch.setattr(
        ref_base.random, "random", lambda: 0.0 if use_sc else 1.0
    )

    with torch.no_grad():
        _, ref_losses = ref_m({"seq": torch.from_numpy(seq)})

    my_losses, _ = my_m.loss(
        params, key, {"seq": jnp.asarray(seq, jnp.int32)},
        my_m.init_state(), is_train=False,
    )
    assert set(ref_losses) == set(my_losses)
    for k, v in ref_losses.items():
        np.testing.assert_allclose(
            float(my_losses[k]), float(v), rtol=2e-4, atol=1e-5,
            err_msg=f"{family}:{k}",
        )
