"""LayoutTransformer baseline — pure autoregressive decoder-only model.

Re-design of `models/elem_wise_autoreg.py:24-156`.  Training is standard
next-token CE (label smoothing 0.1, PAD ignored) over BOS+sequence with a
causal mask.  Sampling replaces the reference's growing-python-loop decode
with a ``lax.scan`` over a FIXED-length buffer: each step runs the causal
transformer on the full (static-shape) sequence and reads position i —
per-slot vocabulary legality, conditioning-token forcing, and the
refinement weak prior are masked ops inside the scan.
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


class ElemWiseAutoreg:
    def __init__(
        self,
        backbone: BackboneConfig,
        tokenizer: LayoutSequenceTokenizer,
        model_cfg: Optional[ModelConfig] = None,
        pos_emb: str = "default",
        dtype=jnp.float32,
    ):
        assert "bos" in tokenizer.special_tokens
        self.tokenizer = tokenizer
        self.cfg = model_cfg or ModelConfig()
        # token length including BOS; decode positions exclude it
        self.seq_len = tokenizer.max_token_length  # already includes BOS
        self.gen_len = self.seq_len - 1
        self.num_classes = tokenizer.N_total
        self.pad_id = tokenizer.name_to_id("pad")
        self.bos_id = tokenizer.name_to_id("bos")
        # -1 sentinel when no [MASK] exists — the cond-forcing comparison
        # then always uses the model's prediction for unmasked slots
        self.mask_id = (
            tokenizer.name_to_id("mask")
            if "mask" in tokenizer.special_tokens
            else -1
        )
        self.net = CategoricalTransformer(
            backbone=dataclasses.replace(backbone, timestep_type=None),
            num_classes=self.num_classes,
            max_token_length=self.seq_len,
            pos_emb=pos_emb,
            n_attr_per_elem=tokenizer.N_var_per_element,
            lookahead=False,  # causal mask
            dtype=dtype,
        )
        # same params, KV-cached single-token decode variant
        self.net_decode = dataclasses.replace(self.net, decode=True)
        self._legal = jnp.asarray(tokenizer.token_mask())  # (gen_len, V)
        self._sampler_cache = {}

    def init(self, rng):
        return self.net.init(
            {"params": rng}, jnp.zeros((1, self.gen_len), jnp.int32)
        )["params"]

    def init_state(self):
        return jnp.zeros(())

    def _apply(self, params, seq, rng=None):
        kwargs = {"deterministic": rng is None}
        if rng is not None:
            kwargs["rngs"] = {"dropout": rng}
        return self.net.apply({"params": params}, seq, **kwargs)

    def preprocess(self, batch: Dict, rng: Optional[jax.Array] = None) -> Dict:
        """input = seq[:-1], target = seq[1:] (`elem_wise_autoreg.py:140-145`)."""
        tokens = self.tokenizer.encode(batch)
        return {
            "seq": tokens["seq"][:, :-1],
            "target": tokens["seq"][:, 1:],
            "mask": tokens["mask"][:, 1:],
        }

    def loss(self, params, rng, tokens, state, is_train=True):
        logits = self._apply(params, tokens["seq"], rng if is_train else None)
        nll = cross_entropy(
            logits,
            tokens["target"],
            tokens["target"] != self.pad_id,
            label_smoothing=0.1,
        )
        return {"nll_loss": nll}, state

    def sample_ids(
        self,
        params,
        rng: jax.Array,
        batch_size: int,
        cond: Optional[SamplerCond] = None,
        sampling: Optional[SamplingConfig] = None,
        use_cache: bool = True,
        **kw,
    ) -> jnp.ndarray:
        """Token-by-token causal decode (`elem_wise_autoreg.py:74-138`);
        returns generated ids WITHOUT the BOS column.

        ``use_cache=True`` (default) runs the KV-cached O(S) formulation:
        each scan step feeds ONE token through the stack against per-layer
        key/value caches.  ``use_cache=False`` recomputes the full prefix
        per step like the reference — kept for equivalence testing.
        """
        sampling = sampling or SamplingConfig()
        B, L = batch_size, self.gen_len

        has_cond = cond is not None
        if has_cond:
            # cond.seq includes the BOS column (tokenizer encodes it)
            cond_seq = cond.seq[:, 1:] if cond.seq.shape[1] == L + 1 \
                else cond.seq
            weak = cond.weak_logits
            if weak.shape[1] == L + 1:
                weak = weak[:, 1:]
            weak_mask = cond.weak_mask
            if weak_mask.shape[1] == L + 1:
                weak_mask = weak_mask[:, 1:]
        else:
            cond_seq = jnp.full((B, L), self.mask_id, jnp.int32)
            weak = jnp.zeros((B, L, self.num_classes), jnp.float32)
            weak_mask = jnp.zeros((B, L), bool)

        key = (
            B, bool(use_cache), sampling.name, float(sampling.temperature),
            int(sampling.top_k), float(sampling.top_p),
        )
        fn = self._sampler_cache.get(key)
        if fn is None:
            fn = jax.jit(
                lambda params, rng, cond_seq, weak, weak_mask: self._decode(
                    params, rng, cond_seq, weak, weak_mask, sampling,
                    use_cache,
                )
            )
            self._sampler_cache[key] = fn
        return fn(params, rng, cond_seq, weak, weak_mask)

    def _decode(
        self, params, rng, cond_seq, weak, weak_mask, sampling, use_cache
    ):
        B, L = cond_seq.shape

        # fixed-length buffer: [BOS, 0, 0, ...]; step i fills position i+1
        buf = jnp.full((B, L), self.bos_id, jnp.int32)

        def constrain_and_sample(logit_i, i, r_s):
            logit_i = logit_i + jnp.where(
                weak_mask[:, i][:, None], weak[:, i], 0.0
            )
            legal_i = self._legal[i]  # traced gather over (L, V)
            logit_i = jnp.where(legal_i[None, :], logit_i, -jnp.inf)
            pred = sample_tokens(
                r_s, logit_i, sampling.name, sampling.temperature,
                sampling.top_k, sampling.top_p,
            )
            # force user-specified tokens (`elem_wise_autoreg.py:128-133`)
            given = cond_seq[:, i]
            return jnp.where(given == self.mask_id, pred, given)

        if use_cache:
            # init traces one step (index bumps to 1) — zero the whole
            # cache tree to start decoding at position 0
            cache = jax.tree.map(
                jnp.zeros_like,
                self.net_decode.init(
                    {"params": jax.random.PRNGKey(0)},
                    jnp.zeros((B, 1), jnp.int32),
                )["cache"],
            )

            def step(carry, i):
                tok, cache, rng = carry
                rng, r_s = jax.random.split(rng)
                logits, vars_ = self.net_decode.apply(
                    {"params": params, "cache": cache},
                    tok,
                    mutable=["cache"],
                )
                cache = vars_["cache"]
                pred = constrain_and_sample(logits[:, 0], i, r_s)
                return (pred[:, None], cache, rng), pred

            bos = jnp.full((B, 1), self.bos_id, jnp.int32)
            (_, _, _), preds = jax.lax.scan(
                step, (bos, cache, rng), jnp.arange(L)
            )
            return preds.T  # (B, L)

        def step(carry, i):
            buf, rng = carry
            rng, r_s = jax.random.split(rng)
            logits = self._apply(params, buf)  # (B, L, V)
            pred = constrain_and_sample(logits[:, i], i, r_s)
            # write at position i+1 (the final step's write is a no-op since
            # no position equals L)
            buf = jnp.where(
                (jnp.arange(L) == i + 1)[None, :], pred[:, None], buf
            )
            return (buf, rng), pred

        (_, _), preds = jax.lax.scan(
            step, (buf, rng), jnp.arange(L)
        )
        return preds.T  # (B, L)

    def sample(self, params, rng, batch_size, cond=None, sampling=None, **kw):
        ids = self.sample_ids(params, rng, batch_size, cond, sampling, **kw)
        return self.tokenizer.decode(ids)
