"""Training-path parity against the REFERENCE'S OWN forward()/optimizer.

Round-2 VERDICT item 2: the sampler was reference-verified, the trainer was
not.  This file drives `vanilla.py:160-240` / `constrained.py:232-333` with
injected timesteps + corruption noise and the reference's own random-init
weights imported into our flax denoiser, asserting:

  (a) every loss term (reweighted KL, decoder NLL at t=0 via the t==0 mix,
      auxiliary KL with the adaptive weight, importance weights 1/pt) matches
      <=1e-4-grade tolerances for BOTH Q variants, plus the returned
      posterior probs and the Lt importance buffers
  (b) ~50 full optimizer steps on identical synthetic data track between
      torch AdamW (reference grouping `base_model.py:54-106`, clip-before-
      step `main.py:229-236`) and our optax chain (decay_mask + global-norm
      clip), validating eps/decay-placement/clipping end to end
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from layoutdm_tpu.models.diffusion.constrained import ConstrainedQ
from layoutdm_tpu.models.diffusion.loss import LtState, diffusion_loss
from layoutdm_tpu.models.diffusion.vanilla import VanillaQ
from layoutdm_tpu.ops import log_math
from layoutdm_tpu.train.step import make_optimizer

from tests import ref_shim
from tests.test_reference_parity import (
    S_FLAGSHIP,
    T,
    V_FLAGSHIP,
    _my_flax_from_ref,
    _my_predict_start,
    from_ref_layout,
    legal_xt_ids,
    make_my_tokenizer,
)

REF = ref_shim.load_reference()


def make_ref_vanilla():
    torch.manual_seed(0)
    tok = ref_shim.make_ref_tokenizer()
    m = REF.vanilla.VanillaMaskAndReplaceDiffusion(
        backbone_cfg=ref_shim.make_backbone_cfg(),
        num_classes=tok.N_total,
        max_token_length=tok.max_token_length,
        num_timesteps=T,
        tokenizer=tok,
    ).eval()
    return m, tok


def make_ref_constrained():
    torch.manual_seed(0)
    tok = ref_shim.make_ref_tokenizer()
    m = REF.constrained.ConstrainedMaskAndReplaceDiffusion(
        backbone_cfg=ref_shim.make_backbone_cfg(),
        num_classes=tok.N_total,
        max_token_length=tok.max_token_length,
        num_timesteps=T,
        tokenizer=tok,
    ).eval()
    return m, tok


def clean_seq(rng, tok, B):
    """Random attribute-legal CLEAN sequences (no MASK anywhere)."""
    seq = legal_xt_ids(rng, tok, B)
    return np.where(
        seq == tok.name_to_id("mask"), tok.name_to_id("pad"), seq
    ).astype(np.int64)


def gumbel(rng, *shape):
    return -np.log(
        -np.log(rng.rand(*shape).astype(np.float32) + 1e-30) + 1e-30
    )


def _inject_time(m, t_np, pt_np):
    m.sample_time = lambda b, device, method="uniform": (
        torch.from_numpy(t_np),
        torch.from_numpy(pt_np),
    )


def _inject_vanilla_noise(m, g_np):
    """Deterministic corruption: argmax(logits + g) (`base.py:167-174`)."""

    def log_sample_categorical(logits):
        sample = (torch.from_numpy(g_np) + logits).argmax(dim=1)
        return REF.util.index_to_log_onehot(sample, m.num_classes)

    m.log_sample_categorical = log_sample_categorical


def _vanilla_xt(m, seq_np, t_np, g_np):
    """The x_t the injected-noise forward() will see, from the reference's
    own q_pred."""
    with torch.no_grad():
        log_x_start = REF.util.index_to_log_onehot(
            torch.from_numpy(seq_np), m.num_classes
        )
        log_qt = m.q_pred(log_x_start, torch.from_numpy(t_np))
        return (torch.from_numpy(g_np) + log_qt).argmax(dim=1).numpy()


def _inject_constrained_noise(m, g_by_key):
    def log_sample_categorical(logits, key):
        sample = (torch.from_numpy(g_by_key[key]) + logits).argmax(dim=1)
        return REF.util.index_to_log_onehot(sample, m.mat_size[key])

    m.log_sample_categorical = log_sample_categorical


def _constrained_xt(m, ref_tok, seq_np, t_np, g_by_key):
    with torch.no_grad():
        B = seq_np.shape[0]
        s_elem = ref_tok.max_seq_length
        step = ref_tok.N_var_per_element
        x_resh = m.converter.f_to_p_id_all(
            torch.from_numpy(seq_np).view(B, s_elem, step)
        )
        cols = []
        for i, key in enumerate(ref_tok.var_names):
            log_x_start = REF.util.index_to_log_onehot(
                x_resh[..., i], m.mat_size[key]
            )
            log_qt = m.q_pred(log_x_start, torch.from_numpy(t_np), key)
            cols.append((torch.from_numpy(g_by_key[key]) + log_qt).argmax(1))
        xt = m.converter.p_to_f_id_all(torch.stack(cols, dim=-1))
        return xt.view(B, -1).numpy()


def _my_loss(q, net, params, seq_np, t_np, pt_np, xt_np, aux_w=1e-1):
    predict_start = _my_predict_start(net, params)
    losses, new_state, aux = diffusion_loss(
        q,
        predict_start,
        params,
        jax.random.PRNGKey(0),
        jnp.asarray(seq_np, jnp.int32),
        LtState.init(T),
        auxiliary_loss_weight=aux_w,
        is_train=True,
        t=jnp.asarray(t_np, jnp.int32),
        pt=jnp.asarray(pt_np, jnp.float32),
        xt=jnp.asarray(xt_np, jnp.int32),
    )
    return losses, new_state, aux


# ---------------------------------------------------------------------------
# (a) loss terms, posterior probs, Lt buffers
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("variant", ["vanilla", "constrained"])
def test_training_loss_terms_parity(rng, variant):
    if variant == "vanilla":
        m, ref_tok = make_ref_vanilla()
    else:
        m, ref_tok = make_ref_constrained()
    my_tok = make_my_tokenizer()
    net, params = _my_flax_from_ref(m, my_tok)

    B = 6
    seq = clean_seq(rng, my_tok, B)
    # distinct timesteps: the reference's scatter_ EMA and our segment-mean
    # EMA coincide exactly, so the Lt buffers are comparable too
    t_np = rng.choice(T, size=B, replace=False).astype(np.int64)
    t_np[0] = 0  # exercise the decoder-NLL mix at t=0
    pt_np = (rng.rand(B).astype(np.float32) * 1.5 + 0.5) / T

    _inject_time(m, t_np, pt_np)
    if variant == "vanilla":
        g = gumbel(rng, B, V_FLAGSHIP, S_FLAGSHIP)
        _inject_vanilla_noise(m, g)
        xt = _vanilla_xt(m, seq, t_np, g)
        q = VanillaQ(num_classes=V_FLAGSHIP, num_timesteps=T)
    else:
        s_elem = ref_tok.max_seq_length
        g_by_key = {
            key: gumbel(rng, B, m.mat_size[key], s_elem)
            for key in ref_tok.var_names
        }
        _inject_constrained_noise(m, g_by_key)
        xt = _constrained_xt(m, ref_tok, seq, t_np, g_by_key)
        q = ConstrainedQ(my_tok, num_timesteps=T)

    with torch.no_grad():
        ref_outputs, ref_losses = m(torch.from_numpy(seq), is_train=True)

    my_losses, my_state, my_aux = _my_loss(q, net, params, seq, t_np, pt_np, xt)

    assert set(ref_losses) == {"kl_loss", "aux_loss"} == set(my_losses)
    for k in ref_losses:
        np.testing.assert_allclose(
            float(my_losses[k]), float(ref_losses[k]), rtol=2e-4, atol=1e-4
        )
    # posterior probs returned by forward()
    np.testing.assert_allclose(
        np.exp(np.asarray(my_aux["log_model_prob"])),
        ref_outputs["probs"].detach().numpy().transpose(0, 2, 1),
        atol=2e-4,
    )
    # importance-sampling buffers (`vanilla.py:214-218`)
    np.testing.assert_allclose(
        np.asarray(my_state.history),
        m.Lt_history.numpy(),
        rtol=2e-4,
        atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(my_state.count), m.Lt_count.numpy()
    )


# ---------------------------------------------------------------------------
# (b) 50-step optimizer trajectory: torch AdamW vs our optax chain
# ---------------------------------------------------------------------------


def _torch_optim_groups(m, weight_decay):
    """The reference grouping (`base_model.py:54-106` + the pos_emb
    additional_no_decay of `layoutdm.py:116-126`), applied to the bare
    diffusion module."""
    decay, no_decay = set(), set()
    whitelist = (torch.nn.Linear, torch.nn.modules.activation.MultiheadAttention)
    blacklist = (torch.nn.LayerNorm, torch.nn.Embedding)
    for mn, mod in m.named_modules():
        for pn, p in mod.named_parameters(recurse=False):
            fpn = f"{mn}.{pn}" if mn else pn
            if pn.endswith("bias"):
                no_decay.add(fpn)
            elif pn.endswith("weight") and isinstance(mod, whitelist):
                decay.add(fpn)
            elif pn.endswith("weight") and isinstance(mod, blacklist):
                no_decay.add(fpn)
    for name in m.transformer.pos_emb.no_decay_param_names:
        no_decay.add(f"transformer.pos_emb.{name}")
    params = dict(m.named_parameters())
    assert not (decay & no_decay)
    leftover = set(params) - (decay | no_decay)
    assert not leftover, leftover
    return [
        {"params": [params[n] for n in sorted(decay)],
         "weight_decay": weight_decay},
        {"params": [params[n] for n in sorted(no_decay)],
         "weight_decay": 0.0},
    ]


def test_optimizer_trajectory_tracks_reference(rng):
    """50 AdamW steps (lr 1e-4, betas (0.9, 0.98), wd 0.1, clip 1.0 — the
    reference's `config/optimizer/adamw.yaml` + `hydra_configs.py:56-57`)
    from identical weights on identical injected batches: per-step total
    losses must track."""
    m, ref_tok = make_ref_vanilla()
    my_tok = make_my_tokenizer()
    net, params = _my_flax_from_ref(m, my_tok)
    q = VanillaQ(num_classes=V_FLAGSHIP, num_timesteps=T)

    STEPS, B = 50, 8
    datas = []
    for i in range(STEPS):
        seq = clean_seq(rng, my_tok, B)
        t_np = rng.randint(0, T, size=B).astype(np.int64)
        pt_np = np.full(B, 1.0 / T, np.float32)
        g = gumbel(rng, B, V_FLAGSHIP, S_FLAGSHIP)
        xt = _vanilla_xt(m, seq, t_np, g)
        datas.append((seq, t_np, pt_np, g, xt))

    # --- reference side
    opt = torch.optim.AdamW(
        _torch_optim_groups(m, weight_decay=0.1), lr=1e-4, betas=(0.9, 0.98)
    )
    ref_losses = []
    for seq, t_np, pt_np, g, xt in datas:
        _inject_time(m, t_np, pt_np)
        _inject_vanilla_noise(m, g)
        opt.zero_grad()
        _, losses = m(torch.from_numpy(seq), is_train=True)
        loss = sum(losses.values())
        loss.backward()
        torch.nn.utils.clip_grad_norm_(m.parameters(), 1.0)
        opt.step()
        ref_losses.append(float(loss.detach()))

    # --- our side (same converted init, our optax chain)
    optimizer = make_optimizer(
        lr=1e-4, weight_decay=0.1, betas=(0.9, 0.98), grad_norm_clip=1.0
    )
    opt_state = optimizer.init(params)
    lt0 = LtState.init(T)

    def apply_fn(p, ids, t, rng_):
        return net.apply({"params": p}, ids, t, deterministic=True)

    from layoutdm_tpu.models.diffusion.sampler import make_predict_start

    predict_start = make_predict_start(apply_fn, net.num_classes)

    @jax.jit
    def train_step(params, opt_state, seq, t, pt, xt):
        def loss_fn(p):
            losses, _, _ = diffusion_loss(
                q, predict_start, p, jax.random.PRNGKey(0), seq, lt0,
                auxiliary_loss_weight=1e-1, is_train=True, t=t, pt=pt, xt=xt,
            )
            return sum(losses.values())

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), new_opt

    my_losses = []
    for seq, t_np, pt_np, g, xt in datas:
        loss, params, opt_state = train_step(
            params, opt_state,
            jnp.asarray(seq, jnp.int32), jnp.asarray(t_np, jnp.int32),
            jnp.asarray(pt_np), jnp.asarray(xt, jnp.int32),
        )
        my_losses.append(float(loss))

    ref_arr, my_arr = np.asarray(ref_losses), np.asarray(my_losses)
    # optimization happened: batch 0 under the final params beats step 0
    seq, t_np, pt_np, g, xt = datas[0]
    final_losses, _, _ = diffusion_loss(
        q, predict_start, params, jax.random.PRNGKey(0),
        jnp.asarray(seq, jnp.int32), lt0, auxiliary_loss_weight=1e-1,
        is_train=True, t=jnp.asarray(t_np, jnp.int32), pt=jnp.asarray(pt_np),
        xt=jnp.asarray(xt, jnp.int32),
    )
    assert float(sum(final_losses.values())) < my_arr[0]
    np.testing.assert_allclose(my_arr, ref_arr, rtol=2e-3, atol=2e-3)
