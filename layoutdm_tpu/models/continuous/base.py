"""Continuous (Gaussian) diffusion over per-token embeddings.

Re-design of `models/continuous_diffusion/base.py:42-413`: log-SNR noise
schedules (linear / cosine), DDPM and DDIM reverse processes as ``lax.scan``
over host-precomputed (t, t_next) pairs, optional self-conditioning and the
clamping trick, and inpainting-style conditioning by
``where(mask, cond_arr, x)`` each step.  Subclasses define the
discrete<->continuous codec (DiffusionLM embeddings / analog bits).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from layoutdm_tpu.configs import BackboneConfig, SamplingConfig
from layoutdm_tpu.models.nn import (
    ElementPositionalEmbedding,
    PositionalEmbedding,
    TransformerEncoder,
)
from layoutdm_tpu.tokenizer.sequence import LayoutSequenceTokenizer


def beta_linear_log_snr(t):
    return -jnp.log(jnp.expm1(1e-4 + 10 * (t**2)))


def alpha_cosine_log_snr(t, s: float = 0.008):
    return -jnp.log(
        jnp.clip(
            (jnp.cos((t + s) / (1 + s) * math.pi * 0.5) ** -2) - 1, min=1e-5
        )
    )


def log_snr_to_alpha_sigma(log_snr):
    return jnp.sqrt(jax.nn.sigmoid(log_snr)), jnp.sqrt(
        jax.nn.sigmoid(-log_snr)
    )


LOG_SNR = {"linear": beta_linear_log_snr, "cosine": alpha_cosine_log_snr}


class ContinuousTransformer(nn.Module):
    """Float-sequence denoiser (`nn_lib.py:240-313`): concat(self_cond, x)
    -> Dense -> pos emb -> timestep-aware encoder -> head."""

    backbone: BackboneConfig
    max_token_length: int
    dim_in: int
    pos_emb: str = "elem_attr"
    n_attr_per_elem: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timestep, x_self_cond=None, deterministic=True):
        if x_self_cond is None:
            x_self_cond = jnp.zeros_like(x)
        h = jnp.concatenate([x_self_cond, x], axis=-1)
        c = self.backbone
        h = nn.Dense(c.d_model, name="emb")(h)
        if self.pos_emb == "default":
            h = h + PositionalEmbedding(
                c.d_model, self.max_token_length, name="pos"
            )(h.shape[1])
        else:
            h = h + ElementPositionalEmbedding(
                c.d_model, self.max_token_length, self.n_attr_per_elem,
                name="pos",
            )(h.shape[1])
        h = nn.Dropout(0.1)(h, deterministic=deterministic)
        h = TransformerEncoder(c, dtype=self.dtype, name="backbone")(
            h.astype(self.dtype), timestep, deterministic=deterministic
        )
        h = h.astype(jnp.float32)
        h = nn.LayerNorm(name="head_norm")(h)
        return nn.Dense(self.dim_in, use_bias=False, name="head")(h)


class ContinuousDiffusionBase:
    """Shared machinery; subclasses implement dis2con / con2dis /
    con2logits (None if no rounding head)."""

    has_rounder = False

    def __init__(
        self,
        backbone: BackboneConfig,
        tokenizer: LayoutSequenceTokenizer,
        num_timesteps: int = 100,
        noise_schedule: str = "cosine",
        num_channel: int = 16,
        use_self_condition: bool = False,
        use_clamping_trick: bool = False,
        time_difference: float = 0.0,
        pos_emb: str = "elem_attr",
        dtype=jnp.float32,
    ):
        assert tokenizer.id_to_name(tokenizer.N_total - 1) == "mask"
        self.tokenizer = tokenizer
        self.num_timesteps = num_timesteps
        self.log_snr = LOG_SNR[noise_schedule]
        self.num_channel = num_channel
        self.use_self_condition = use_self_condition
        self.use_clamping_trick = use_clamping_trick
        self.time_difference = time_difference
        self.scale: Optional[float] = None
        self.seq_len = tokenizer.max_token_length
        self.num_classes = tokenizer.N_total
        # 29/32 shrink for parameter parity
        # (`layout_continuous_diffusion.py:44-46`)
        self.backbone_cfg = backbone.shrunk(29 / 32)
        self.net = ContinuousTransformer(
            backbone=self.backbone_cfg,
            max_token_length=self.seq_len,
            dim_in=num_channel,
            pos_emb=pos_emb,
            n_attr_per_elem=tokenizer.N_var_per_element,
            dtype=dtype,
        )

    # -- codec hooks --------------------------------------------------------
    def dis2con(self, params, seq, rng=None):
        raise NotImplementedError

    def con2dis(self, params, arr):
        raise NotImplementedError

    def con2logits(self, params, arr):
        raise NotImplementedError

    # -- params -------------------------------------------------------------
    def init(self, rng):
        x = jnp.zeros((1, self.seq_len, self.num_channel))
        t = jnp.zeros((1,))
        return self.net.init({"params": rng}, x, t)["params"]

    def init_state(self):
        return jnp.zeros(())

    def _apply(self, params, x, t, self_cond=None, rng=None):
        kwargs = {"deterministic": rng is None}
        if rng is not None:
            kwargs["rngs"] = {"dropout": rng}
        return self.net.apply({"params": params}, x, t, self_cond, **kwargs)

    def preprocess(self, batch: Dict, rng=None) -> Dict:
        return self.tokenizer.encode(batch)

    # -- training (`continuous_diffusion/base.py:154-208`) ------------------
    def loss(self, params, rng, tokens, state, is_train=True):
        seq = tokens["seq"] if isinstance(tokens, dict) else tokens
        B = seq.shape[0]
        r_t, r_noise, r_rep, r_sc, r_drop = jax.random.split(rng, 5)

        x, x_mean = self.dis2con(params, seq, rng=r_rep)
        times = jax.random.uniform(r_t, (B,), maxval=0.999)
        noise = jax.random.normal(r_noise, x.shape)
        noise_level = self.log_snr(times)
        alpha, sigma = log_snr_to_alpha_sigma(noise_level[:, None, None])
        noised = alpha * x + sigma * noise

        self_cond = None
        if self.use_self_condition:
            sc = jax.lax.stop_gradient(
                self._apply(params, noised, noise_level)
            )
            use_sc = jax.random.bernoulli(r_sc)
            self_cond = jnp.where(use_sc, sc, 0.0)

        out = self._apply(
            params, noised, noise_level, self_cond,
            r_drop if is_train else None,
        )

        mse = (out - x) ** 2
        t0 = (out - x_mean) ** 2
        is_t0 = (times < 1 / self.num_timesteps)[:, None, None]
        mse = jnp.where(is_t0, t0, mse)

        final_alpha, _ = log_snr_to_alpha_sigma(
            self.log_snr(jnp.asarray(0.999))
        )
        losses = {
            "mse_loss": mse.mean(),
            "tT_loss": ((final_alpha * x) ** 2).mean(),
        }
        if self.has_rounder:
            logits = self.con2logits(params, out)
            logp = jax.nn.log_softmax(logits, axis=-1)
            losses["rounding_loss"] = -jnp.take_along_axis(
                logp, seq[..., None], axis=-1
            ).mean()
        return losses, state

    # -- sampling -----------------------------------------------------------
    def _time_pairs(self, T: int, td: float) -> Tuple[np.ndarray, np.ndarray]:
        times = np.linspace(1.0, 0.0, T + 1, dtype=np.float32)
        t_now = times[:-1]
        t_next = np.clip(times[1:] - td, 0.0, None)
        return jnp.asarray(t_now), jnp.asarray(t_next)

    def sample_ids(
        self,
        params,
        rng: jax.Array,
        batch_size: int,
        cond=None,
        sampling: Optional[SamplingConfig] = None,
        use_ddim: bool = False,
        **kw,
    ) -> jnp.ndarray:
        """Reverse process -> token ids.  ``cond`` is a SamplerCond; strong
        tokens are held fixed via inpainting-style replacement
        (`continuous_diffusion/base.py:218-225,273-274`)."""
        sampling = sampling or SamplingConfig()
        T = sampling.num_timesteps or self.num_timesteps
        td = sampling.time_difference or self.time_difference
        B = batch_size

        cond_arr, cond_mask = None, None
        if cond is not None:
            cond_arr, _ = self.dis2con(params, cond.seq)
            cond_mask = cond.strong_mask[..., None]

        rng, r0 = jax.random.split(rng)
        x = jax.random.normal(r0, (B, self.seq_len, self.num_channel))
        if cond is not None:
            x = jnp.where(cond_mask, cond_arr, x)

        t_now, t_next = self._time_pairs(T, td)

        def predict_x0(x, log_snr, x_start_prev):
            sc = x_start_prev if self.use_self_condition else None
            x_start = self._apply(params, x, log_snr, sc)
            if self.use_clamping_trick:
                ids = self.con2dis(params, x_start)
                x_start, _ = self.dis2con(params, ids)
                if self.scale:
                    x_start = jnp.clip(x_start, -self.scale, self.scale)
            return x_start

        if use_ddim:

            def step(carry, ts):
                x, x_start, rng = carry
                t, tn = ts
                log_snr = self.log_snr(jnp.full((B,), t))
                log_snr_next = self.log_snr(jnp.full((B,), tn))
                alpha, sigma = log_snr_to_alpha_sigma(
                    log_snr[:, None, None]
                )
                alpha_n, sigma_n = log_snr_to_alpha_sigma(
                    log_snr_next[:, None, None]
                )
                x_start = predict_x0(x, log_snr, x_start)
                pred_noise = (x - alpha * x_start) / jnp.clip(sigma, 1e-8)
                x = x_start * alpha_n + pred_noise * sigma_n
                if cond is not None:
                    x = jnp.where(cond_mask, cond_arr, x)
                return (x, x_start, rng), None

        else:

            def step(carry, ts):
                x, x_start, rng = carry
                t, tn = ts
                rng, r_n = jax.random.split(rng)
                log_snr_s = self.log_snr(jnp.full((B,), t))
                x_start = predict_x0(x, log_snr_s, x_start)
                log_snr = log_snr_s[:, None, None]
                log_snr_next = self.log_snr(jnp.full((B,), tn))[
                    :, None, None
                ]
                alpha, sigma = log_snr_to_alpha_sigma(log_snr)
                alpha_n, sigma_n = log_snr_to_alpha_sigma(log_snr_next)
                c = -jnp.expm1(log_snr - log_snr_next)
                mean = alpha_n * (x * (1 - c) / alpha + c * x_start)
                var = (sigma_n**2) * c
                noise = jnp.where(
                    tn > 0, jax.random.normal(r_n, x.shape), 0.0
                )
                x = mean + jnp.sqrt(jnp.clip(var, 1e-20)) * noise
                if cond is not None:
                    x = jnp.where(cond_mask, cond_arr, x)
                return (x, x_start, rng), None

        x0 = jnp.zeros_like(x)
        (x, _, _), _ = jax.lax.scan(step, (x, x0, rng), (t_now, t_next))
        return self.con2dis(params, x)

    def sample(self, params, rng, batch_size, cond=None, sampling=None, **kw):
        ids = self.sample_ids(params, rng, batch_size, cond, sampling, **kw)
        return self.tokenizer.decode(ids)
