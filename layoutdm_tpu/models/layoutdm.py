"""LayoutDM — the flagship model: tokenizer + Q + denoiser + compiled sampler.

Re-design of `models/layoutdm.py:26-126`.  The class is a thin, stateless
binder: parameters live in a pytree owned by the caller (train state or
checkpoint), and every method is pure and jittable.  Backbone dims shrink by
29/32 for parameter parity with the baselines (`models/layoutdm.py:54`).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from layoutdm_tpu.configs import BackboneConfig, ModelConfig, SamplingConfig
from layoutdm_tpu.models.diffusion.constrained import ConstrainedQ
from layoutdm_tpu.models.diffusion.loss import LtState, diffusion_loss
from layoutdm_tpu.models.diffusion.sampler import (
    SamplerCond,
    make_predict_start,
    sample_chain,
)
from layoutdm_tpu.models.diffusion.vanilla import VanillaQ
from layoutdm_tpu.models.nn import CategoricalTransformer
from layoutdm_tpu.tokenizer.sequence import LayoutSequenceTokenizer


class LayoutDM:
    # serving capability flags (`serve_cli`): the diffusion sampler accepts
    # (B,)-batched per-row PRNG keys (request coalescing) and a guidance_fn
    # hook (relation task); the baseline zoo supports neither
    supports_per_row_keys = True
    supports_guidance = True

    def __init__(
        self,
        backbone: BackboneConfig,
        tokenizer: LayoutSequenceTokenizer,
        model_cfg: Optional[ModelConfig] = None,
        dtype=jnp.float32,
    ):
        cfg = model_cfg or ModelConfig()
        assert cfg.q_type in ("vanilla", "constrained")
        assert cfg.seq_type in ("set", "poset")
        # MASK must be the last vocabulary id (`models/layoutdm.py:46`)
        assert tokenizer.id_to_name(tokenizer.N_total - 1) == "mask"

        self.tokenizer = tokenizer
        self.cfg = cfg
        self.seq_len = tokenizer.max_token_length
        self.num_classes = tokenizer.N_total

        sched_kw = dict(
            att_1=cfg.att_1, att_T=cfg.att_T, ctt_1=cfg.ctt_1, ctt_T=cfg.ctt_T
        )
        if cfg.q_type == "constrained":
            self.q = ConstrainedQ(tokenizer, cfg.num_timesteps, **sched_kw)
        else:
            self.q = VanillaQ(
                tokenizer.N_total, cfg.num_timesteps, **sched_kw
            )

        self.backbone_cfg = backbone.shrunk(29 / 32)
        if cfg.transformer_type == "aggregated":
            from layoutdm_tpu.models.nn import CategoricalAggregatedTransformer

            # extra 27/29 shrink for parameter parity (`base.py:85-93`)
            self.backbone_cfg = self.backbone_cfg.shrunk(27 / 29)
            self.net = CategoricalAggregatedTransformer(
                backbone=self.backbone_cfg,
                num_classes=self.num_classes,
                max_token_length=self.seq_len,
                n_attr_per_elem=tokenizer.N_var_per_element,
                dtype=dtype,
            )
        else:
            from layoutdm_tpu.models.nn import use_vocab_pad

            self.net = CategoricalTransformer(
                backbone=self.backbone_cfg,
                num_classes=self.num_classes,
                max_token_length=self.seq_len,
                pos_emb=cfg.pos_emb,
                n_attr_per_elem=tokenizer.N_var_per_element,
                dtype=dtype,
                # safe here because every LayoutDM consumer goes through
                # make_predict_start, which handles the padded width
                vocab_pad=use_vocab_pad(self.num_classes),
            )
        self._predict_start = make_predict_start(
            self._apply_net, self.num_classes
        )
        self._sampler_cache = {}

    # -- parameter management ----------------------------------------------
    def init(self, rng: jax.Array):
        seq = jnp.zeros((1, self.seq_len), jnp.int32)
        t = jnp.zeros((1,), jnp.int32)
        return self.net.init({"params": rng}, seq, t)["params"]

    def init_state(self) -> LtState:
        return LtState.init(self.q.num_timesteps)

    def _apply_net(self, params, ids, t, rng=None):
        kwargs = {}
        if rng is not None:
            kwargs = {"rngs": {"dropout": rng}}
            deterministic = False
        else:
            deterministic = True
        return self.net.apply(
            {"params": params}, ids, t, deterministic=deterministic, **kwargs
        )

    # -- training -----------------------------------------------------------
    def loss(
        self,
        params,
        rng: jax.Array,
        tokens,
        lt_state: LtState,
        is_train: bool = True,
    ):
        """(losses dict, new LtState).  ``tokens``: preprocess output with
        ``seq`` (B, S) clean token ids (or a raw seq array)."""
        seq = tokens["seq"] if isinstance(tokens, dict) else tokens
        losses, new_state, _ = diffusion_loss(
            self.q,
            self._predict_start,
            params,
            rng,
            seq,
            lt_state,
            auxiliary_loss_weight=self.cfg.auxiliary_loss_weight,
            is_train=is_train,
        )
        return losses, new_state

    # -- sampling -----------------------------------------------------------
    def sample_ids(
        self,
        params,
        rng: jax.Array,
        batch_size: int,
        cond: Optional[SamplerCond] = None,
        sampling: Optional[SamplingConfig] = None,
        num_timesteps_eval: Optional[int] = None,
        get_intermediates: bool = False,
        guidance_fn=None,
        **_unused,  # uniform call surface across model families
    ):
        """Run the reverse chain, returning raw token ids (B, S).

        The chain is jitted once per static configuration (sampling
        strategy, eval steps, guidance closure); subsequent calls with new
        batches/conds reuse the compiled program — batch loops in the CLIs
        pay tracing cost once, not per batch.
        """
        sampling = sampling or SamplingConfig()
        if cond is None:
            cond = SamplerCond.empty(batch_size, self.seq_len, self.num_classes)

        key = (
            sampling.name, float(sampling.temperature), int(sampling.top_k),
            float(sampling.top_p), float(sampling.time_difference),
            num_timesteps_eval or sampling.num_timesteps,
            get_intermediates, id(guidance_fn),
        )
        fn = self._sampler_cache.get(key)
        if fn is None:
            fn = jax.jit(
                lambda params, rng, cond: sample_chain(
                    params,
                    self._predict_start,
                    self.q,
                    rng,
                    cond,
                    sampling,
                    pad_id=self.tokenizer.name_to_id("pad"),
                    num_timesteps_eval=num_timesteps_eval
                    or sampling.num_timesteps,
                    get_intermediates=get_intermediates,
                    guidance_fn=guidance_fn,
                )
            )
            self._sampler_cache[key] = fn
        return fn(params, rng, cond)

    def sample(self, params, rng, batch_size, cond=None, sampling=None, **kw):
        """Sample and decode to {bbox, label, mask} (`layoutdm.py:77-88`)."""
        ids = self.sample_ids(params, rng, batch_size, cond, sampling, **kw)
        return self.tokenizer.decode(ids)

    # -- preprocessing ------------------------------------------------------
    def preprocess(self, batch: Dict, rng: Optional[jax.Array] = None) -> Dict:
        """Dense layout batch -> token batch (`layoutdm.py:99-114`).
        ``seq_type == "set"`` shuffles PAD locations per sample."""
        ids = self.tokenizer.encode(batch)
        if self.cfg.seq_type == "set":
            assert rng is not None
            B, S = ids["mask"].shape
            C = self.tokenizer.N_var_per_element
            perm = jax.vmap(
                lambda r: jax.random.permutation(r, S // C)
            )(jax.random.split(rng, B))
            idx = (perm[..., None] * C + jnp.arange(C)[None, None, :]).reshape(
                B, S
            )
            ids = {k: jnp.take_along_axis(v, idx, axis=1) for k, v in ids.items()}
        return ids
