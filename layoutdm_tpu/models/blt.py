"""BLT baseline — grouped iterative decoding (category -> size -> position).

Re-design of `models/blt.py:39-236`: same masked-token transformer as
MaskGIT but decoding proceeds in three attribute groups
(``TARGET_ATTRS`` = c / (w,h) / (x,y), `blt.py:27`), each refined for T/3
steps; training masks a random amount of one random attribute group per
sample.  All loops are scans over static per-step group masks.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from layoutdm_tpu.configs import BackboneConfig, ModelConfig, SamplingConfig
from layoutdm_tpu.models.base import SeqLenState, cross_entropy
from layoutdm_tpu.models.diffusion.sampler import SamplerCond
from layoutdm_tpu.models.maskgit import MaskGIT
from layoutdm_tpu.ops.masking import batch_topk_mask
from layoutdm_tpu.ops.samplers import sample_tokens
from layoutdm_tpu.tokenizer.sequence import LayoutSequenceTokenizer

TARGET_ATTRS = (("c",), ("w", "h"), ("x", "y"))  # `blt.py:27`


class BLT(MaskGIT):
    def __init__(
        self,
        backbone: BackboneConfig,
        tokenizer: LayoutSequenceTokenizer,
        model_cfg: Optional[ModelConfig] = None,
        dtype=jnp.float32,
    ):
        assert tokenizer.var_names == ("c", "x", "y", "w", "h")
        super().__init__(backbone, tokenizer, model_cfg, dtype=dtype)
        C = tokenizer.N_var_per_element
        # (3, C) bool: which attribute slots belong to each group
        groups = np.zeros((len(TARGET_ATTRS), C), bool)
        for g, attrs in enumerate(TARGET_ATTRS):
            for a in attrs:
                groups[g, tokenizer.var_names.index(a)] = True
        self.group_attr = groups

    # -- training -----------------------------------------------------------
    def loss(self, params, rng, tokens, state: SeqLenState, is_train=True):
        """Mask a random count of one random attribute group per sample
        (`blt.py:192-226`); plain CE (no label smoothing, `blt.py:74`)."""
        seq, mask = tokens["seq"], tokens["mask"]
        B, S = seq.shape
        C = self.tokenizer.N_var_per_element
        r_grp, r_cnt, r_scores, r_drop = jax.random.split(rng, 4)

        grp = jax.random.randint(r_grp, (B,), 0, len(TARGET_ATTRS))
        attr_of_slot = jnp.arange(S) % C
        in_group = jnp.asarray(self.group_attr)[grp][:, attr_of_slot]  # (B, S)
        candidates = in_group & mask

        # uniform count in [1, #candidates] (`blt.py:30-36`)
        n_cand = candidates.sum(axis=1)
        u = jax.random.uniform(r_cnt, (B,))
        topk = (u * n_cand).astype(jnp.int32) + 1
        topk = jnp.minimum(topk, jnp.maximum(n_cand, 1))
        scores = jax.random.uniform(r_scores, (B, S))
        loss_mask, _ = batch_topk_mask(scores, topk, mask=candidates)

        masked = jnp.where(loss_mask, self.mask_id, seq)
        logits = self._apply(
            params, masked, ~mask, r_drop if is_train else None
        )
        nll = cross_entropy(logits, seq, loss_mask)
        new_state = state.update(tokens["elem_mask"]) if is_train else state
        return {"nll_loss": nll}, new_state

    # -- sampling -----------------------------------------------------------
    def sample_ids(
        self,
        params,
        rng: jax.Array,
        batch_size: int,
        cond: Optional[SamplerCond] = None,
        sampling: Optional[SamplingConfig] = None,
        state: Optional[SeqLenState] = None,
        num_timesteps_eval: Optional[int] = None,
        guidance_fn=None,
        **kw,
    ) -> jnp.ndarray:
        """Three grouped refinement phases, T/3 steps each
        (`blt.py:98-190`)."""
        sampling = sampling or SamplingConfig()
        total_T = num_timesteps_eval or sampling.num_timesteps or 9
        assert total_T % 3 == 0
        T = total_T // 3
        B, S = batch_size, self.seq_len
        C = self.tokenizer.N_var_per_element

        if cond is not None:
            seq = cond.seq
            mask_user = cond.strong_mask
        else:
            probs = (state or self.init_state()).probs
            rng, r_n = jax.random.split(rng)
            n_el = SeqLenState(probs).sample(r_n, B) * C
            valid = jnp.arange(S)[None, :] < n_el[:, None]
            seq = jnp.where(valid, self.mask_id, self.pad_id)
            mask_user = ~valid

        key = (
            "blt", B, T, sampling.name, float(sampling.temperature),
            int(sampling.top_k), float(sampling.top_p),
        )
        fn = self._sampler_cache.get(key)
        if fn is None:
            fn = jax.jit(
                lambda params, rng, seq, mask_user: self._grouped_scan(
                    params, rng, seq, mask_user, T, sampling
                )
            )
            self._sampler_cache[key] = fn
        return fn(params, rng, seq, mask_user)

    def _grouped_scan(self, params, rng, seq, mask_user, T, sampling):
        B, S = seq.shape
        C = self.tokenizer.N_var_per_element
        seq_user = seq  # user-specified slots, restored every step
        # static key-padding mask like the reference (`blt.py:126-159`)
        padding_mask = (seq == self.pad_id) & mask_user
        illegal = ~jnp.broadcast_to(self._legal[None], (B, S, self.num_classes))
        attr_of_slot = jnp.arange(S) % C

        for g in range(len(TARGET_ATTRS)):
            in_group = jnp.asarray(self.group_attr[g])[attr_of_slot]  # (S,)
            keep_attr = ~jnp.broadcast_to(in_group[None, :], (B, S))
            n_free = (~(mask_user | keep_attr)).sum(axis=1)

            def step(carry, t):
                seq, rng = carry
                rng, r_s = jax.random.split(rng)
                ratio = (T - (t + 1)) / T
                logits = self._apply(params, seq, padding_mask)
                logits = jnp.where(illegal, -jnp.inf, logits)
                seq_pred = sample_tokens(
                    r_s, logits, sampling.name, sampling.temperature,
                    sampling.top_k, sampling.top_p,
                )
                conf = jnp.take_along_axis(
                    logits, seq_pred[..., None], axis=-1
                )[..., 0]
                upd = (seq == self.mask_id) & ~keep_attr
                new_seq = jnp.where(upd, seq_pred, seq)

                topk = (n_free * ratio).astype(jnp.int32)
                unconfident, _ = batch_topk_mask(-conf, topk, mask=upd)
                remask = unconfident & (t < T - 1)
                new_seq = jnp.where(remask, self.mask_id, new_seq)
                new_seq = jnp.where(mask_user, seq_user, new_seq)
                return (new_seq, rng), None

            (seq, rng), _ = jax.lax.scan(
                step, (seq, rng), jnp.arange(T, dtype=jnp.float32)
            )
        return seq
