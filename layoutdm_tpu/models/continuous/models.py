"""DiffusionLM and BitDiffusion codecs + the family wrapper.

Parity targets: `continuous_diffusion/diffusion_lm.py:11-75` (learned token
embedding + rounding head initialized to the embedding),
`bitdiffusion.py:12-69` (8-bit analog bits with nearest-valid-token decode
using the legality mask), and the `LayoutContinuousDiffusion` wrapper
(`models/layout_continuous_diffusion.py:22-119`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from layoutdm_tpu.configs import BackboneConfig, ModelConfig
from layoutdm_tpu.models.continuous.base import (
    ContinuousDiffusionBase,
    log_snr_to_alpha_sigma,
)
from layoutdm_tpu.tokenizer.sequence import LayoutSequenceTokenizer


def _trunc_normal(rng: np.random.RandomState, shape, std=1.0):
    """Truncated normal in [-2std, 2std] (`base.py:73-86` init)."""
    x = rng.randn(*shape) * std
    bad = np.abs(x) > 2 * std
    while bad.any():
        x[bad] = rng.randn(int(bad.sum())) * std
        bad = np.abs(x) > 2 * std
    return x.astype(np.float32)


class DiffusionLM(ContinuousDiffusionBase):
    """Diffusion on learned token embeddings with a rounding head."""

    has_rounder = True

    def __init__(self, *args, learnable_token_emb: bool = False,
                 emb_seed: int = 0, **kw):
        super().__init__(*args, **kw)
        self.learnable_token_emb = learnable_token_emb
        # frozen token embedding (default, `base.py:73-86`): a fixed
        # trunc-normal codebook shared by dis2con and the rounder init
        self.token_emb = jnp.asarray(
            _trunc_normal(
                np.random.RandomState(emb_seed),
                (self.num_classes, self.num_channel),
            )
        )

    def init(self, rng):
        params = dict(super().init(rng))
        # rounder initialized to the embedding (inverse map),
        # `layout_continuous_diffusion.py:59-66`
        params["rounder"] = {
            "kernel": self.token_emb.T,
            "bias": jnp.zeros((self.num_classes,)),
        }
        if self.learnable_token_emb:
            params["token_emb"] = self.token_emb
        return params

    def _emb(self, params):
        # checkpoint reloads may hold numpy leaves; keep device arrays so
        # traced indexing works inside scans
        return jnp.asarray(params.get("token_emb", self.token_emb))

    def dis2con(self, params, seq, rng=None):
        emb = self._emb(params)[seq]
        if rng is not None:
            # reparametrize with sigma at t=0 (`diffusion_lm.py:44-52`)
            _, sigma0 = log_snr_to_alpha_sigma(self.log_snr(jnp.asarray(0.0)))
            return emb + sigma0 * jax.random.normal(rng, emb.shape), emb
        return emb, emb

    def con2logits(self, params, arr):
        r = params["rounder"]
        return arr @ r["kernel"] + r["bias"]

    def con2dis(self, params, arr):
        return jnp.argmax(self.con2logits(params, arr), axis=-1)


def ids_to_bits(ids: jnp.ndarray, num_bits: int) -> jnp.ndarray:
    """(B, S) -> (B, S, bits) in {-1, +1} (`bitdiffusion.py:12-24`)."""
    mask = 2 ** jnp.arange(num_bits - 1, -1, -1)
    bits = ((ids[..., None] & mask) != 0).astype(jnp.float32)
    return bits * 2 - 1.0


class BitDiffusion(ContinuousDiffusionBase):
    """Analog-bits diffusion (`bitdiffusion.py:52-69`)."""

    has_rounder = False

    def __init__(self, *args, num_channel: int = 8, **kw):
        super().__init__(*args, num_channel=num_channel, **kw)
        self.scale = 1.0
        assert self.num_classes <= 2**num_channel
        # nearest-valid decode tables: codes for every possible id, with
        # per-slot legality (`bitdiffusion.py:27-48`)
        n = 2**num_channel
        base_bits = np.asarray(ids_to_bits(jnp.arange(n), num_channel))
        self.base_bits = jnp.asarray(base_bits)  # (n, bits)
        legal = np.zeros((self.tokenizer.max_token_length -
                          (1 if "bos" in self.tokenizer.special_tokens else 0),
                          n), bool)
        legal[:, : self.num_classes] = self.tokenizer.token_mask()
        self.legal = jnp.asarray(legal)  # (S, n)

    def dis2con(self, params, seq, rng=None):
        x = ids_to_bits(seq, self.num_channel) * self.scale
        return x, x

    def con2dis(self, params, arr):
        # nearest legal code in L1 distance (`bitdiffusion.py:36-46`)
        dist = jnp.abs(arr[:, :, None, :] - self.base_bits[None, None]).sum(-1)
        dist = jnp.where(self.legal[None], dist, jnp.inf)
        return jnp.argmin(dist, axis=-1)

    def con2logits(self, params, arr):
        raise NotImplementedError


class LayoutContinuousDiffusion:
    """Family wrapper selecting DiffusionLM / BitDiffusion by config
    (`layout_continuous_diffusion.py:20,41-56`)."""

    def __init__(
        self,
        backbone: BackboneConfig,
        tokenizer: LayoutSequenceTokenizer,
        model_cfg: Optional[ModelConfig] = None,
        dtype=jnp.float32,
    ):
        cfg = model_cfg or ModelConfig()
        self.cfg = cfg
        self.tokenizer = tokenizer
        kw = dict(num_timesteps=cfg.num_timesteps, dtype=dtype)
        if cfg.name == "bitdiffusion":
            self.model = BitDiffusion(
                backbone, tokenizer, use_self_condition=True,
                use_clamping_trick=False, **kw,
            )
        else:
            self.model = DiffusionLM(
                backbone, tokenizer, num_channel=16,
                use_self_condition=False, use_clamping_trick=True,
                learnable_token_emb=cfg.learnable_token_emb, **kw,
            )
        self.seq_len = self.model.seq_len
        self.num_classes = self.model.num_classes

    def __getattr__(self, name):
        return getattr(self.model, name)

    def sample(self, params, rng, batch_size, cond=None, sampling=None, **kw):
        ids = self.model.sample_ids(
            params, rng, batch_size, cond, sampling, **kw
        )
        return self.tokenizer.decode(ids)
