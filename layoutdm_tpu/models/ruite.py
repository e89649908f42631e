"""RUITE baseline — one-shot layout denoiser (refinement-task baseline).

Re-design of `models/ruite.py:22-124`: encode a noise-perturbed layout,
predict the clean tokens with CE (PAD ignored); sampling is a single forward
pass with user-known tokens replaced.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from layoutdm_tpu.configs import BackboneConfig, ModelConfig, SamplingConfig
from layoutdm_tpu.models.base import cross_entropy
from layoutdm_tpu.models.diffusion.sampler import SamplerCond
from layoutdm_tpu.models.nn import CategoricalTransformer
from layoutdm_tpu.ops.samplers import sample_tokens
from layoutdm_tpu.tokenizer.sequence import LayoutSequenceTokenizer


class RUITE:
    def __init__(
        self,
        backbone: BackboneConfig,
        tokenizer: LayoutSequenceTokenizer,
        model_cfg: Optional[ModelConfig] = None,
        dtype=jnp.float32,
    ):
        self.tokenizer = tokenizer
        self.cfg = model_cfg or ModelConfig()
        self.seq_len = tokenizer.max_token_length
        self.num_classes = tokenizer.N_total
        self.pad_id = tokenizer.name_to_id("pad")
        self.net = CategoricalTransformer(
            backbone=dataclasses.replace(backbone, timestep_type=None),
            num_classes=self.num_classes,
            max_token_length=self.seq_len,
            pos_emb="default",
            dtype=dtype,
        )

    def init(self, rng):
        return self.net.init(
            {"params": rng}, jnp.zeros((1, self.seq_len), jnp.int32)
        )["params"]

    def init_state(self):
        return jnp.zeros(())  # no aux state

    def _apply(self, params, seq, padding_mask=None, rng=None):
        kwargs = {"deterministic": rng is None}
        if rng is not None:
            kwargs["rngs"] = {"dropout": rng}
        return self.net.apply(
            {"params": params}, seq, None, padding_mask, **kwargs
        )

    def preprocess(self, batch: Dict, rng: Optional[jax.Array] = None) -> Dict:
        """Noisy input -> clean target (`ruite.py:102-114`).  Noise is added
        here when the loader did not already provide ``bbox_orig``."""
        if "bbox_orig" in batch:
            noisy_bbox, clean_bbox = batch["bbox"], batch["bbox_orig"]
        else:
            assert rng is not None
            noise = 0.05 * jax.random.normal(
                rng, jnp.asarray(batch["bbox"]).shape
            )
            clean_bbox = jnp.asarray(batch["bbox"])
            noisy_bbox = clean_bbox + noise * jnp.asarray(batch["mask"])[..., None]
        inputs = self.tokenizer.encode(
            {"label": batch["label"], "mask": batch["mask"], "bbox": noisy_bbox}
        )
        targets = self.tokenizer.encode(
            {"label": batch["label"], "mask": batch["mask"], "bbox": clean_bbox}
        )
        return {
            "seq": inputs["seq"],
            "mask": inputs["mask"],
            "target": targets["seq"],
        }

    def loss(self, params, rng, tokens, state, is_train=True):
        logits = self._apply(
            params, tokens["seq"], ~tokens["mask"], rng if is_train else None
        )
        # CE ignoring PAD targets (`ruite.py:52-54`)
        nll = cross_entropy(logits, tokens["target"],
                            tokens["target"] != self.pad_id)
        return {"nll_loss": nll}, state

    def sample_ids(
        self,
        params,
        rng: jax.Array,
        batch_size: int,
        cond: Optional[SamplerCond] = None,
        sampling: Optional[SamplingConfig] = None,
        **kw,
    ) -> jnp.ndarray:
        sampling = sampling or SamplingConfig()
        if cond is None:
            # RUITE cannot generate unconditionally; emit a dummy layout
            # (`ruite.py:91-97`)
            seq = jnp.full((batch_size, self.seq_len), self.pad_id, jnp.int32)
            seq = seq.at[:, 0].set(0)
            seq = seq.at[:, 1:5].set(self.tokenizer.N_category)
            return seq
        padding = cond.seq == self.pad_id
        logits = self._apply(params, cond.seq, padding)
        seq = sample_tokens(
            rng, logits, sampling.name, sampling.temperature,
            sampling.top_k, sampling.top_p,
        )
        return jnp.where(cond.strong_mask, cond.seq, seq)

    def sample(self, params, rng, batch_size, cond=None, sampling=None, **kw):
        ids = self.sample_ids(params, rng, batch_size, cond, sampling, **kw)
        return self.tokenizer.decode(ids)
