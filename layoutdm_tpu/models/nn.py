"""Neural network library: timestep-conditioned transformer encoder in flax.

Re-design of `models/transformer_utils.py:34-246` and
`models/common/nn_lib.py:73-237` for TPU:

* pre-norm blocks with AdaLayerNorm / AdaInsNorm timestep modulation
  (scale-shift), matching the reference block wiring exactly — note the
  reference REPLACES the trunk with norm1(x) before the attention residual
  (`transformer_utils.py:173-179`), an intentional VQDiffusion quirk we keep;
* self-attention with a packed qkv projection (one matmul feeding the MXU,
  and a 1:1 layout with torch's ``in_proj_weight`` for checkpoint porting);
* factored element/attribute positional embedding (`nn_lib.py:91-134`);
* a ``dtype`` knob so activations can run bf16 with f32 params/logits.

Everything is standard flax.linen; the modules contain no python-level state.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from layoutdm_tpu.configs import BackboneConfig


def gelu2(x):
    return x * jax.nn.sigmoid(1.702 * x)


ACTIVATIONS = {"relu": jax.nn.relu, "gelu": jax.nn.gelu, "gelu2": gelu2}


def embed_tokens(
    embedder: nn.Embed, seq: jnp.ndarray, dtype=None
) -> jnp.ndarray:
    """Token embedding as a one-hot matmul instead of a gather.

    TPU gathers bypass the MXU and run bandwidth-limited: at bench shapes
    (B=1024, S=125, V=155, d=464) ``jnp.take`` costs 2.5 ms/step while the
    one-hot route costs 0.79 ms.  ``Precision.HIGHEST`` keeps the f32 dot
    exact (no bf16 passes), so the result is BITWISE equal to the gather —
    each output row is 1.0 x one table row summed with exact zeros
    (verified on-chip; `tests/test_model.py::test_embed_tokens_exact`).

    ``dtype``: when the model's COMPUTE dtype is low-precision (bf16), pass
    it to run the dot in that dtype — each output row is then exactly the
    bf16-rounded table row (one-hot selection has no accumulation error:
    1.0*x and 0.0*x are exact, and f32 accumulation of one nonzero term is
    the term).  The stream is cast to the compute dtype a few ops later
    anyway, so the only numerical change is WHERE the rounding happens
    (before vs after the positional add) — invisible next to bf16 GEMM
    noise, and it replaces a 6-pass f32 MXU dot (which XLA further lowers
    to a ~10x-slow fused conv emitter in the train step's backward) with a
    plain bf16 GEMM in both directions.  f32 models are unaffected.

    The tiny ``arange`` gather materializes the table through the bound
    module so the param tree keeps flax's ``cat_emb/embedding`` path.
    """
    table = embedder(jnp.arange(embedder.num_embeddings))
    if (
        dtype is not None
        and jnp.dtype(dtype) != jnp.float32
        and os.environ.get("LAYOUTDM_TPU_EMBED_F32", "0") != "1"
    ):
        oh = jax.nn.one_hot(seq, embedder.num_embeddings, dtype=dtype)
        return jax.lax.dot_general(
            oh,
            table.astype(dtype),
            (((oh.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
    oh = jax.nn.one_hot(seq, embedder.num_embeddings, dtype=table.dtype)
    return jax.lax.dot_general(
        oh,
        table,
        (((oh.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )


class SinusoidalTimestepEmb(nn.Module):
    """`transformer_utils.py:34-49` — sinusoidal embedding of the diffusion
    timestep, rescaled to 4000 steps."""

    num_steps: int
    dim: int
    rescale_steps: int = 4000

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        x = t.astype(jnp.float32) / self.num_steps * self.rescale_steps
        half = self.dim // 2
        freq = jnp.exp(jnp.arange(half) * -(math.log(10000) / (half - 1)))
        ang = x[:, None] * freq[None, :]
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class AdaNormCond(nn.Module):
    """Timestep -> (scale, shift) modulation (`transformer_utils.py:52-69`)."""

    d_model: int
    max_timestep: int
    emb_type: str  # "adalayernorm" | + "_abs" | "_mlp" suffixes

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        if "abs" in self.emb_type:
            emb = SinusoidalTimestepEmb(self.max_timestep, self.d_model)(t)
        elif "mlp" in self.emb_type:
            h = t.astype(jnp.float32)[:, None]
            h = nn.Dense(self.d_model // 2, name="mlp1")(h)
            emb = nn.Dense(self.d_model, name="mlp2")(jax.nn.relu(h))
        else:
            emb = nn.Embed(self.max_timestep, self.d_model, name="emb")(t)
        emb = nn.Dense(self.d_model * 2, name="linear")(jax.nn.silu(emb))
        return emb[:, None, :]  # (B, 1, 2D)


class AdaLayerNorm(nn.Module):
    d_model: int
    max_timestep: int
    emb_type: str = "adalayernorm"

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        emb = AdaNormCond(self.d_model, self.max_timestep, self.emb_type)(t)
        scale, shift = jnp.split(emb, 2, axis=-1)
        x = nn.LayerNorm(use_bias=False, use_scale=False)(x)
        return x * (1 + scale) + shift


class AdaInsNorm(nn.Module):
    d_model: int
    max_timestep: int
    emb_type: str = "adainnorm"

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        emb = AdaNormCond(self.d_model, self.max_timestep, self.emb_type)(t)
        scale, shift = jnp.split(emb, 2, axis=-1)
        # instance norm over the sequence axis (`transformer_utils.py:86-100`)
        mean = x.mean(axis=1, keepdims=True)
        var = x.var(axis=1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return x * (1 + scale) + shift


class SelfAttention(nn.Module):
    """Multi-head self-attention with packed qkv (torch MHA layout).

    ``decode=True`` enables single-token autoregressive decoding with a
    KV-cache carried in the "cache" variable collection (the lax.scan-able
    formulation SURVEY.md §7 hard-part #6 calls for): each call consumes
    one token, updates the (B, L, H, hd) caches at ``cache_index`` and
    attends against the filled prefix.
    """

    d_model: int
    nhead: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    decode: bool = False
    decode_length: int = 0  # cache length L when decode=True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,  # (S, S) additive or bool
        key_padding_mask: Optional[jnp.ndarray] = None,  # (B, S) True=pad
        deterministic: bool = True,
        fold_residual: bool = False,  # return x + attn via the block kernel
    ) -> jnp.ndarray:
        if self.decode:
            return self._decode_step(x)
        return self._full(
            x, mask, key_padding_mask, deterministic, fold_residual
        )

    def _decode_step(self, x: jnp.ndarray) -> jnp.ndarray:
        B, S, D = x.shape
        assert S == 1, "decode mode consumes one token per call"
        H, hd, L = self.nhead, D // self.nhead, self.decode_length
        qkv = nn.Dense(3 * D, name="qkv", dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, 1, H, hd)
        ck = self.variable(
            "cache", "cached_key", jnp.zeros, (B, L, H, hd), self.dtype
        )
        cv = self.variable(
            "cache", "cached_value", jnp.zeros, (B, L, H, hd), self.dtype
        )
        ci = self.variable(
            "cache", "cache_index", lambda: jnp.zeros((), jnp.int32)
        )
        idx = ci.value
        ck.value = jax.lax.dynamic_update_slice(
            ck.value, k.reshape(B, 1, H, hd).astype(self.dtype), (0, idx, 0, 0)
        )
        cv.value = jax.lax.dynamic_update_slice(
            cv.value, v.reshape(B, 1, H, hd).astype(self.dtype), (0, idx, 0, 0)
        )
        ci.value = idx + 1
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, ck.value) / math.sqrt(hd)
        valid = jnp.arange(L) <= idx
        scores = jnp.where(valid[None, None, None, :], scores, -1e9)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            self.dtype
        )
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, cv.value).reshape(B, 1, D)
        return nn.Dense(D, name="out", dtype=self.dtype)(out)

    def _full(self, x, mask, key_padding_mask, deterministic,
              fold_residual=False):
        B, S, D = x.shape
        H = self.nhead
        assert D % H == 0, f"d_model {D} not divisible by nhead {H}"
        hd = D // H

        from layoutdm_tpu.ops.attention_blockdiag import (
            blockdiag_attention,
            can_use_blockdiag,
            scatter_out_weights,
            scatter_qkv_weights,
        )

        from layoutdm_tpu.ops.attention import (
            can_use_fused_block,
            fused_attention_block,
            head_pad_target,
        )

        # whole-sandwich kernel: qkv + attention + out (+ residual) in one
        # pallas call — the (B, S, 3Dp) qkv slab never touches HBM (the
        # split-kernel pipeline wrote it, layout-copied it for the custom
        # call, and read it back).  Weights are zero-scattered to
        # 64-aligned head blocks (exact; `scatter_qkv_weights`)
        if deterministic and fold_residual and can_use_fused_block(
            S, mask, key_padding_mask, hd, num_heads=H, d_model=D,
            itemsize=jnp.dtype(self.dtype).itemsize,
        ):
            hp = head_pad_target(hd)
            wq, bq = _DenseParams(3 * D, name="qkv")(D)
            wp, bp = scatter_qkv_weights(
                wq.astype(self.dtype), bq.astype(self.dtype), H, hd, hp
            )
            wo, bo = _DenseParams(D, name="out")(D)
            wop = scatter_out_weights(wo.astype(self.dtype), H, hd, hp)
            return fused_attention_block(
                x.astype(self.dtype), wp, bp, wop, bo.astype(self.dtype),
                num_heads=H, head_pad=hp, scale=1.0 / math.sqrt(hd),
                residual=True,
            )
        # a caller asking for the folded residual when the kernel gate
        # declines would silently get attn-only back — fail loudly instead
        # (Block computes `fold` with the SAME gate, so it never hits this)
        assert not fold_residual, (
            "fold_residual=True but can_use_fused_block declined; "
            "check the gate before asking for the folded form"
        )

        # experimental block-diagonal kernel (LAYOUTDM_TPU_ATTN_V2=1):
        # projection weights are scattered into a padded-head layout so the
        # GEMM itself emits aligned heads; deterministic-only like the other
        # pallas paths.  Param tree identical to the nn.Dense branches.
        if deterministic and can_use_blockdiag(
            S, mask, key_padding_mask, hd, num_heads=H,
            itemsize=jnp.dtype(self.dtype).itemsize,
        ):
            hp = hd if hd % 64 == 0 else -(-hd // 64) * 64
            wq, bq = _DenseParams(3 * D, name="qkv")(D)
            wp, bp = scatter_qkv_weights(
                wq.astype(self.dtype), bq.astype(self.dtype), H, hd, hp
            )
            qkv_pad = x.astype(self.dtype) @ wp + bp
            o = blockdiag_attention(
                qkv_pad, num_heads=H, head_pad=hp,
                scale=1.0 / math.sqrt(hd),
            )
            wo, bo = _DenseParams(D, name="out")(D)
            wop = scatter_out_weights(wo.astype(self.dtype), H, hd, hp)
            return o @ wop + bo.astype(self.dtype)

        from layoutdm_tpu.ops.attention import (
            can_use_fused,
            can_use_padded_qkv,
            can_use_smajor,
            fused_attention_qkv,
            fused_attention_qkv_smajor,
            head_pad_target,
        )

        # weight-padded-head packed-qkv kernel (default ON where hd is not
        # 64-aligned; LAYOUTDM_TPU_HEADPAD_W=0 disables): same per-head
        # kernel as the plain fused path, but the projection weights are
        # zero-scattered to 64-aligned head blocks so the kernel's lane
        # slices stop crossing tiles; no runtime pad copies (the GEMM
        # emits the padded layout), exact up to bf16 accumulation order
        if deterministic and can_use_padded_qkv(
            S, mask, key_padding_mask, hd, num_heads=H,
            itemsize=jnp.dtype(self.dtype).itemsize,
        ):
            hp = head_pad_target(hd)
            wq, bq = _DenseParams(3 * D, name="qkv")(D)
            wp, bp = scatter_qkv_weights(
                wq.astype(self.dtype), bq.astype(self.dtype), H, hd, hp
            )
            if can_use_smajor(
                S, mask, key_padding_mask, d_model=H * hp,
                itemsize=jnp.dtype(self.dtype).itemsize,
            ):
                # S-major variant: the swapaxes is a free bitcast of the
                # projection GEMM's batch-minor output layout — the bias
                # and the transpose move into the kernel's VMEM
                qkv_sm = jnp.swapaxes(x.astype(self.dtype) @ wp, 0, 1)
                o = fused_attention_qkv_smajor(
                    qkv_sm, bp, num_heads=H, scale=1.0 / math.sqrt(hd)
                )
            else:
                qkv_pad = x.astype(self.dtype) @ wp + bp
                o = fused_attention_qkv(
                    qkv_pad, num_heads=H, scale=1.0 / math.sqrt(hd)
                )
            wo, bo = _DenseParams(D, name="out")(D)
            wop = scatter_out_weights(wo.astype(self.dtype), H, hd, hp)
            return o @ wop + bo.astype(self.dtype)

        # S-major variant of the plain fused path (hd already aligned);
        # same param tree as the nn.Dense branches below
        if deterministic and can_use_fused(
            S, mask, key_padding_mask, d_model=D,
            itemsize=jnp.dtype(self.dtype).itemsize,
        ) and can_use_smajor(
            S, mask, key_padding_mask, d_model=D,
            itemsize=jnp.dtype(self.dtype).itemsize,
        ):
            wq, bq = _DenseParams(3 * D, name="qkv")(D)
            qkv_sm = jnp.swapaxes(
                x.astype(self.dtype) @ wq.astype(self.dtype), 0, 1
            )
            out = fused_attention_qkv_smajor(
                qkv_sm, bq.astype(self.dtype), num_heads=H
            )
            return nn.Dense(D, name="out", dtype=self.dtype)(out)

        from layoutdm_tpu.ops.attention import (
            can_use_fused_diff,
            fused_attention_qkv_diff,
        )

        # DIFFERENTIABLE fused attention (custom_vjp, pallas fwd + bwd):
        # the branch jax.grad-wrapped training takes — the f32 (B,H,S,S)
        # scores never touch HBM in either direction and no head-split
        # relayout copies surround the einsums (~19% of the train step in
        # the round-5 xplane profile).  Exact only at attention-dropout
        # 0.0 (the flagship family's training config); weights are
        # zero-scattered to 64-aligned head blocks when hd is misaligned,
        # same as the serving path (the scatter is linear, AD-exact).
        _hp = head_pad_target(hd)
        if can_use_fused_diff(
            S, mask, key_padding_mask, self.dropout,
            d_model=H * _hp if hd % 64 else D,
            itemsize=jnp.dtype(self.dtype).itemsize,
        ):
            wq, bq = _DenseParams(3 * D, name="qkv")(D)
            wo, bo = _DenseParams(D, name="out")(D)
            if hd % 64:
                wp, bp = scatter_qkv_weights(
                    wq.astype(self.dtype), bq.astype(self.dtype), H, hd, _hp
                )
                qkv_pad = x.astype(self.dtype) @ wp + bp
                o = fused_attention_qkv_diff(
                    qkv_pad, H, 1.0 / math.sqrt(hd)
                )
                wop = scatter_out_weights(wo.astype(self.dtype), H, hd, _hp)
                return o @ wop + bo.astype(self.dtype)
            qkv = x.astype(self.dtype) @ wq.astype(self.dtype) + bq.astype(
                self.dtype
            )
            o = fused_attention_qkv_diff(qkv, H)
            return o @ wo.astype(self.dtype) + bo.astype(self.dtype)

        from layoutdm_tpu.ops.attention import use_train_headpad_w

        # differentiable weight-scattered padded heads (OFF by default —
        # measured 0.2% wash at flagship train shapes, see
        # use_train_headpad_w; LAYOUTDM_TPU_TRAIN_HEADPAD=1 enables): the
        # serving trick (scatter projection WEIGHTS to 64-aligned head
        # blocks so the GEMMs emit aligned layouts with zero runtime pad
        # copies) is linear, hence AD-safe — this is the pallas-free
        # branch jax.grad-wrapped training can take.  Supports masks and
        # attention dropout like the plain XLA path below.
        if use_train_headpad_w(hd):
            hp = head_pad_target(hd)
            wq, bq = _DenseParams(3 * D, name="qkv")(D)
            wp, bp = scatter_qkv_weights(
                wq.astype(self.dtype), bq.astype(self.dtype), H, hd, hp
            )
            qkv_pad = x.astype(self.dtype) @ wp + bp  # (B, S, 3*H*hp)
            q, k, v = jnp.split(qkv_pad, 3, axis=-1)
            q = q.reshape(B, S, H, hp)
            k = k.reshape(B, S, H, hp)
            v = v.reshape(B, S, H, hp)
            # zero lanes add zero score terms; scale by the TRUE head dim
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
            if mask is not None:
                scores = scores + mask[None, None].astype(scores.dtype)
            if key_padding_mask is not None:
                neg = jnp.asarray(-1e9, dtype=scores.dtype)
                scores = jnp.where(
                    key_padding_mask[:, None, None, :], neg, scores
                )
            attn = jax.nn.softmax(
                scores.astype(jnp.float32), axis=-1
            ).astype(self.dtype)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, S, H * hp)
            wo, bo = _DenseParams(D, name="out")(D)
            # zero rows under the padded lanes drop v's zero outputs exactly
            wop = scatter_out_weights(wo.astype(self.dtype), H, hd, hp)
            return o @ wop + bo.astype(self.dtype)

        qkv = nn.Dense(3 * D, name="qkv", dtype=self.dtype)(x)

        # fused path ONLY when deterministic: (a) attention dropout needs
        # the XLA path, and (b) training differentiates through attention
        # and pallas_call has no reverse-mode AD rule — the deterministic
        # flag cleanly separates the compiled samplers/eval (fused) from
        # jax.grad-wrapped training (XLA)
        use_fused = (
            can_use_fused(
                S, mask, key_padding_mask, d_model=D,
                itemsize=qkv.dtype.itemsize,
            )
            and deterministic
        )
        if use_fused:
            # the packed (B, S, 3D) projection output feeds the kernel
            # directly — q/k/v never exist as separate HBM buffers and no
            # head reshape/transpose surrounds the custom call
            out = fused_attention_qkv(qkv, num_heads=H)
            return nn.Dense(D, name="out", dtype=self.dtype)(out)

        from layoutdm_tpu.ops.attention import head_pad_target, use_head_pad

        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, H, hd)
        k = k.reshape(B, S, H, hd)
        v = v.reshape(B, S, H, hd)
        if use_head_pad(hd):
            # zero-pad heads to a lane multiple: exact (zero lanes add
            # zero score terms / zero output lanes) and linear (AD-safe),
            # so training takes this path too — see ops/attention.py
            hp = head_pad_target(hd)
            pad = ((0, 0), (0, 0), (0, 0), (0, hp - hd))
            q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        if mask is not None:
            scores = scores + mask[None, None].astype(scores.dtype)
        if key_padding_mask is not None:
            neg = jnp.asarray(-1e9, dtype=scores.dtype)
            scores = jnp.where(
                key_padding_mask[:, None, None, :], neg, scores
            )
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            self.dtype
        )
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)[..., :hd]
        out = out.reshape(B, S, D)
        return nn.Dense(D, name="out", dtype=self.dtype)(out)


def vocab_pad_target(V: int) -> int:
    """Next multiple-of-128 lane width for the vocabulary head GEMM."""
    return -(-V // 128) * 128


def use_vocab_pad(V: int) -> bool:
    """Gate for the lane-padded vocabulary head (LAYOUTDM_TPU_VOCAB_PAD=1
    forces on, =0 forces off).

    Hypothesis: the flagship head GEMM's N=155 is lane-hostile — the
    round-3 roofline measured the (464, 155) pair at 51 TF/s vs 150+ for
    aligned shapes (docs/DESIGN.md §5).  Zero-padding the head KERNEL to
    the next 128-lane multiple is exact and loop-invariant (XLA hoists the
    pad out of the sampling scan); the -1e9 bias on MASK+pad lanes makes
    the downstream log_softmax normalizer identical (exp(-1e9-max)
    underflows to exactly 0 in f32), so `make_predict_start` can slice
    AFTER the reduction — slicing the GEMM output directly would let XLA
    propagate the slice into the GEMM and narrow N right back (the
    slice-DCE pitfall, docs/DESIGN.md §5).

    MEASURED, REJECTED as default (round 4, docs/DESIGN.md §6): 357.0 vs
    360.0 layouts/s end-to-end — the head is only ~0.7% of step FLOPs,
    so its low GEMM rate never mattered.  Exactness and wiring stay
    tested (`test_vocab_padded_head_exact`); =1 forces for vocabularies
    large enough for the head to be a real cost."""
    import os

    force = os.environ.get("LAYOUTDM_TPU_VOCAB_PAD")
    if force == "0":
        return False
    if V % 128 == 0:
        return False  # already aligned; padding is a no-op
    if force == "1":
        return True
    return False


class _DenseKernel(nn.Module):
    """`nn.Dense(use_bias=False)`'s kernel param (same name, shape, default
    initializer) without running it — lets the lane-padded vocabulary head
    share one param tree with the plain `nn.Dense` head."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
        )


class _DenseParams(nn.Module):
    """Declares exactly `nn.Dense`'s params (same names, shapes, default
    initializers) without running it — lets the fused-FFN pallas path share
    one param tree with the XLA path."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _NormParams(nn.Module):
    """`nn.LayerNorm`'s params (scale/bias) without running it."""

    @nn.compact
    def __call__(self, features: int):
        g = self.param("scale", nn.initializers.ones, (features,))
        b = self.param("bias", nn.initializers.zeros, (features,))
        return g, b


class Block(nn.Module):
    """Pre-norm encoder block (`transformer_utils.py:103-210`)."""

    cfg: BackboneConfig
    dtype: jnp.dtype = jnp.float32
    decode: bool = False
    decode_length: int = 0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timestep: Optional[jnp.ndarray] = None,
        attn_mask: Optional[jnp.ndarray] = None,
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        c = self.cfg
        tt = c.timestep_type
        if tt is not None:
            norm_cls = AdaInsNorm if "adainnorm" in tt else AdaLayerNorm
            x = norm_cls(c.d_model, c.diffusion_step, tt, name="norm1")(
                x, timestep
            )
        else:
            x = nn.LayerNorm(name="norm1")(x)
        # keep the RESIDUAL STREAM in the compute dtype: the norms promote
        # to f32 (their stats/params stay f32 — that precision is kept),
        # but carrying the (B, S, d) trunk itself in f32 doubles the HBM
        # traffic of every elementwise fusion between the GEMMs (profiled
        # at ~10% of the bf16 sampler step)
        x = x.astype(self.dtype)
        from layoutdm_tpu.ops.attention import can_use_fused_block

        # fold the x + attn residual into the sandwich kernel when it will
        # engage (same gate SelfAttention checks; deterministic => the
        # dropout below is identity anyway)
        fold = (
            deterministic
            and not self.decode
            and can_use_fused_block(
                x.shape[1], attn_mask, key_padding_mask,
                c.d_model // c.nhead, num_heads=c.nhead, d_model=c.d_model,
                itemsize=jnp.dtype(self.dtype).itemsize,
            )
        )
        attn = SelfAttention(
            c.d_model, c.nhead, c.dropout, dtype=self.dtype,
            decode=self.decode, decode_length=self.decode_length,
            name="attn",
        )(x, attn_mask, key_padding_mask, deterministic, fold_residual=fold)
        if fold:
            x = attn
        else:
            x = x + nn.Dropout(c.dropout)(attn, deterministic=deterministic)

        from layoutdm_tpu.ops.ffn import can_use_fused_ffn, fused_ln_ffn_residual

        # fused FFN ONLY on the deterministic path (same rules as fused
        # attention above: no dropout, no AD through pallas_call); the
        # param trees of both paths are identical so a checkpoint works
        # with either
        if deterministic and can_use_fused_ffn(
            c.d_model, c.dim_feedforward, c.activation,
            itemsize=jnp.dtype(self.dtype).itemsize,
        ):
            g, b = _NormParams(name="norm2")(c.d_model)
            w1, b1 = _DenseParams(c.dim_feedforward, name="linear1")(c.d_model)
            w2, b2 = _DenseParams(c.d_model, name="linear2")(c.dim_feedforward)
            return fused_ln_ffn_residual(
                x.astype(self.dtype), g, b, w1, b1, w2, b2,
                activation=c.activation,
            ).astype(x.dtype)

        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(c.dim_feedforward, name="linear1", dtype=self.dtype)(h)
        h = ACTIVATIONS[c.activation](h)
        h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
        h = nn.Dense(c.d_model, name="linear2", dtype=self.dtype)(h)
        x = x + nn.Dropout(c.dropout)(h, deterministic=deterministic)
        return x


class TransformerEncoder(nn.Module):
    """Stack of Blocks threading the timestep (`transformer_utils.py:213-246`)."""

    cfg: BackboneConfig
    dtype: jnp.dtype = jnp.float32
    decode: bool = False
    decode_length: int = 0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timestep: Optional[jnp.ndarray] = None,
        attn_mask: Optional[jnp.ndarray] = None,
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        for i in range(self.cfg.num_layers):
            x = Block(
                self.cfg, dtype=self.dtype, decode=self.decode,
                decode_length=self.decode_length, name=f"layer{i}",
            )(x, timestep, attn_mask, key_padding_mask, deterministic)
        return x


class PositionalEmbedding(nn.Module):
    """Learned absolute positions (`nn_lib.py:73-89`)."""

    d_model: int
    max_token_length: int

    @nn.compact
    def __call__(self, S: int, position=None) -> jnp.ndarray:
        emb = self.param(
            "pos_emb",
            nn.initializers.uniform(scale=1.0),
            (self.max_token_length, self.d_model),
        )
        if position is not None:
            return jax.lax.dynamic_slice_in_dim(emb, position, 1)[None]
        return emb[:S][None]


class ElementPositionalEmbedding(nn.Module):
    """Factored (element-id + attribute-id) positions (`nn_lib.py:91-134`).
    Handles the optional BOS slot when max_token_length % n_attr == 1."""

    d_model: int
    max_token_length: int
    n_attr_per_elem: int = 5

    @nn.compact
    def __call__(self, S: int, position=None) -> jnp.ndarray:
        remainder = self.max_token_length % self.n_attr_per_elem
        assert remainder in (0, 1)
        n_elem = self.max_token_length // self.n_attr_per_elem
        init = nn.initializers.uniform(scale=1.0)
        elem = self.param("elem_emb", init, (n_elem, self.d_model))
        attr = self.param("attr_emb", init, (self.n_attr_per_elem, self.d_model))
        emb = (
            jnp.repeat(elem, self.n_attr_per_elem, axis=0)
            + jnp.tile(attr, (n_elem, 1))
        )
        if remainder == 1:
            bos = self.param("bos_emb", init, (1, self.d_model))
            emb = jnp.concatenate([bos, emb], axis=0)[: self.max_token_length]
        if position is not None:
            return jax.lax.dynamic_slice_in_dim(emb, position, 1)[None]
        return emb[:S][None]


class LayoutElementEncoder(nn.Module):
    """Element-wise (label, quantized-bbox) -> vector codec
    (`models/common/layout.py` LayoutEncoder with emb_concat + concat_fc)."""

    d_model: int
    num_labels: int
    num_bins: int

    @nn.compact
    def __call__(self, label: jnp.ndarray, bbox_ids: jnp.ndarray):
        embs = [nn.Embed(self.num_labels, self.d_model, name="label_emb")(label)]
        for i, key in enumerate("xywh"):
            embs.append(
                nn.Embed(self.num_bins, self.d_model, name=f"{key}_emb")(
                    bbox_ids[..., i]
                )
            )
        return nn.Dense(self.d_model, name="fc")(
            jnp.concatenate(embs, axis=-1)
        )


class LayoutElementDecoder(nn.Module):
    """Vector -> per-attribute logits (`models/common/layout.py`
    LayoutDecoder counterpart)."""

    num_labels: int
    num_bins: int

    @nn.compact
    def __call__(self, h: jnp.ndarray):
        return {
            "label": nn.Dense(self.num_labels, name="label_head")(h),
            "bbox": nn.Dense(4 * self.num_bins, name="bbox_head")(h).reshape(
                h.shape[:-1] + (4, self.num_bins)
            ),
        }


class ElementTransformer(nn.Module):
    """Element-level transformer (`nn_lib.py:455-509`): one token per
    element via the layout codec, causal or bidirectional encoder, decoded
    to per-attribute logits."""

    backbone: BackboneConfig
    num_labels: int
    num_bins: int
    lookahead: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        label: jnp.ndarray,
        bbox_ids: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,
        timestep: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        c = self.backbone
        h = LayoutElementEncoder(
            c.d_model, self.num_labels, self.num_bins, name="enc"
        )(label, bbox_ids)
        h = nn.Dropout(0.1)(h, deterministic=deterministic)
        attn_mask = None
        if not self.lookahead:
            S = label.shape[1]
            attn_mask = jnp.triu(jnp.full((S, S), -jnp.inf), k=1)
        h = TransformerEncoder(c, dtype=self.dtype, name="backbone")(
            h.astype(self.dtype), timestep, attn_mask, key_padding_mask,
            deterministic,
        )
        h = nn.LayerNorm(name="norm")(h.astype(jnp.float32))
        return LayoutElementDecoder(
            self.num_labels, self.num_bins, name="dec"
        )(h)


class CategoricalAggregatedTransformer(nn.Module):
    """Element-aggregated denoiser (`nn_lib.py:403-452`): the 5 attribute
    embeddings of each element are fused to one token before the encoder and
    expanded back afterwards — 5x shorter attention at the cost of
    intra-element mixing.  Used by LayoutDM's ``transformer_type =
    "aggregated"`` ablation (`categorical_diffusion/base.py:85-93`)."""

    backbone: BackboneConfig
    num_classes: int
    max_token_length: int
    n_attr_per_elem: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        seq: jnp.ndarray,
        timestep: Optional[jnp.ndarray] = None,
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        c = self.backbone
        A = self.n_attr_per_elem
        B, S = seq.shape
        h = embed_tokens(
            nn.Embed(self.num_classes, c.d_model, name="cat_emb"),
            seq,
            dtype=self.dtype,
        )
        h = nn.Dropout(0.1)(h, deterministic=deterministic)
        h = h.reshape(B, S // A, A * c.d_model)
        h = jax.nn.relu(nn.Dense(c.d_model, name="enc")(h))
        h = h + PositionalEmbedding(
            c.d_model, self.max_token_length, name="pos"
        )(S // A)
        h = TransformerEncoder(c, dtype=self.dtype, name="backbone")(
            h.astype(self.dtype), timestep, None, key_padding_mask,
            deterministic,
        )
        h = h.astype(jnp.float32)
        h = jax.nn.relu(nn.Dense(A * c.d_model, name="dec")(h))
        h = h.reshape(B, S, c.d_model)
        h = nn.LayerNorm(name="head_norm")(h)
        return nn.Dense(self.num_classes, use_bias=False, name="head")(h)


class CrossAttention(nn.Module):
    """Decoder cross-attention (packed kv for torch-layout porting).

    ``decode=True`` caches the memory projections: the encoder output is
    constant during AR decoding, so k/v are computed on the first step and
    reused from the "cache" collection afterwards."""

    d_model: int
    nhead: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    decode: bool = False  # read k/v from the prefilled cache
    prefill: bool = False  # project memory k/v into the cache and return

    @nn.compact
    def __call__(self, x, memory, deterministic: bool = True):
        H = self.nhead
        hd = self.d_model // H

        if self.prefill:
            B, M, _ = memory.shape
            kv = nn.Dense(2 * self.d_model, name="kv", dtype=self.dtype)(
                memory
            )
            k, v = jnp.split(kv, 2, axis=-1)
            ck = self.variable(
                "cache", "cross_key", jnp.zeros, (B, M, H, hd), self.dtype
            )
            cv = self.variable(
                "cache", "cross_value", jnp.zeros, (B, M, H, hd), self.dtype
            )
            ck.value = k.reshape(B, M, H, hd).astype(self.dtype)
            cv.value = v.reshape(B, M, H, hd).astype(self.dtype)
            return x

        B, S, D = x.shape
        q = nn.Dense(D, name="q", dtype=self.dtype)(x).reshape(B, S, H, hd)
        if self.decode:
            # memory is passed for its shape; values come from the cache
            # written by the prefill pass
            M = memory.shape[1]
            k = self.variable(
                "cache", "cross_key", jnp.zeros, (B, M, H, hd), self.dtype
            ).value
            v = self.variable(
                "cache", "cross_value", jnp.zeros, (B, M, H, hd), self.dtype
            ).value
        else:
            kv = nn.Dense(2 * D, name="kv", dtype=self.dtype)(memory)
            k, v = jnp.split(kv, 2, axis=-1)
            M = memory.shape[1]
            k = k.reshape(B, M, H, hd)
            v = v.reshape(B, M, H, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            self.dtype
        )
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, S, D)
        return nn.Dense(D, name="out", dtype=self.dtype)(out)


class DecoderBlock(nn.Module):
    """Pre-norm transformer decoder block (causal self-attn + cross-attn +
    FF), mirroring torch ``nn.TransformerDecoderLayer(norm_first=True)`` as
    instantiated at `models/bart.py:66-74`."""

    cfg: BackboneConfig
    dtype: jnp.dtype = jnp.float32
    decode: bool = False
    decode_length: int = 0
    prefill: bool = False

    @nn.compact
    def __call__(self, x, memory, attn_mask=None, deterministic=True):
        c = self.cfg
        if self.prefill:
            # project memory into the per-layer cross k/v cache only
            return CrossAttention(
                c.d_model, c.nhead, c.dropout, dtype=self.dtype,
                prefill=True, name="cross_attn",
            )(x, memory, deterministic)

        h = nn.LayerNorm(name="norm1")(x)
        h = SelfAttention(c.d_model, c.nhead, c.dropout, dtype=self.dtype,
                          decode=self.decode,
                          decode_length=self.decode_length,
                          name="self_attn")(h, attn_mask,
                                            deterministic=deterministic)
        x = x + nn.Dropout(c.dropout)(h, deterministic=deterministic)
        h = nn.LayerNorm(name="norm2")(x)
        h = CrossAttention(c.d_model, c.nhead, c.dropout, dtype=self.dtype,
                           decode=self.decode,
                           name="cross_attn")(h, memory, deterministic)
        x = x + nn.Dropout(c.dropout)(h, deterministic=deterministic)
        from layoutdm_tpu.ops.ffn import can_use_fused_ffn, fused_ln_ffn_residual

        # same fused-FFN rules as Block; skipped in KV-cached decode where
        # the (B, 1, D) step has no HBM intermediate worth saving
        if (
            deterministic
            and not self.decode
            and can_use_fused_ffn(
                c.d_model, c.dim_feedforward, c.activation,
                itemsize=jnp.dtype(self.dtype).itemsize,
            )
        ):
            g, b = _NormParams(name="norm3")(c.d_model)
            w1, b1 = _DenseParams(c.dim_feedforward, name="linear1")(c.d_model)
            w2, b2 = _DenseParams(c.d_model, name="linear2")(c.dim_feedforward)
            return fused_ln_ffn_residual(
                x.astype(self.dtype), g, b, w1, b1, w2, b2,
                activation=c.activation,
            ).astype(x.dtype)

        h = nn.LayerNorm(name="norm3")(x)
        h = nn.Dense(c.dim_feedforward, name="linear1", dtype=self.dtype)(h)
        h = ACTIVATIONS[c.activation](h)
        h = nn.Dense(c.d_model, name="linear2", dtype=self.dtype)(h)
        x = x + nn.Dropout(c.dropout)(h, deterministic=deterministic)
        return x


class CategoricalEncDecTransformer(nn.Module):
    """BART-style encoder-decoder over token sequences
    (`nn_lib.py:316-400`): encoder = the shared timestep-free encoder,
    decoder = pre-norm causal decoder with cross-attention."""

    backbone: BackboneConfig
    num_classes: int
    max_token_length: int  # decoder length (incl BOS)
    pos_emb: str = "default"
    n_attr_per_elem: int = 5
    dtype: jnp.dtype = jnp.float32
    decode: bool = False  # KV-cached single-token decoding
    prefill: bool = False  # fill the cross-attention caches from memory

    @nn.compact
    def __call__(
        self,
        input_seq: Optional[jnp.ndarray],  # (B, S_enc) encoder tokens
        target_seq: Optional[jnp.ndarray] = None,  # (B, S_dec) decoder input
        deterministic: bool = True,
        memory: Optional[jnp.ndarray] = None,  # precomputed encoder output
    ) -> jnp.ndarray:
        """Full enc-dec by default; ``target_seq=None`` returns the encoder
        memory only and ``memory=...`` skips the encoder — so AR decode
        loops hoist the encoder out of the scan."""
        c = self.backbone

        def posmod(name):
            if self.pos_emb == "default":
                return PositionalEmbedding(
                    c.d_model, self.max_token_length, name=name
                )
            return ElementPositionalEmbedding(
                c.d_model, self.max_token_length, self.n_attr_per_elem,
                name=name,
            )

        if self.prefill:
            B = memory.shape[0]
            dummy = jnp.zeros((B, 1, c.d_model), self.dtype)
            for i in range(c.num_layers):
                DecoderBlock(c, dtype=self.dtype, prefill=True,
                             name=f"dec{i}")(dummy, memory)
            return memory

        if memory is None:
            h_enc = embed_tokens(
                nn.Embed(self.num_classes, c.d_model, name="input_emb"),
                input_seq,
                dtype=self.dtype,
            )
            h_enc = h_enc + posmod("input_pos")(input_seq.shape[1])
            h_enc = nn.Dropout(0.1)(h_enc, deterministic=deterministic)
            memory = TransformerEncoder(c, dtype=self.dtype, name="encoder")(
                h_enc.astype(self.dtype), deterministic=deterministic
            )
            if target_seq is None:
                return memory

        tgt = embed_tokens(
            nn.Embed(self.num_classes, c.d_model, name="target_emb"),
            target_seq,
            dtype=self.dtype,
        )
        S = target_seq.shape[1]
        position = None
        if self.decode:
            pi = self.variable(
                "cache", "pos_index", lambda: jnp.zeros((), jnp.int32)
            )
            position = pi.value
            pi.value = position + 1
        tgt = tgt + posmod("target_pos")(S, position)
        causal = None
        if not self.decode:
            causal = jnp.triu(jnp.full((S, S), -jnp.inf), k=1)
        h = tgt.astype(self.dtype)
        for i in range(c.num_layers):
            h = DecoderBlock(c, dtype=self.dtype, decode=self.decode,
                             decode_length=self.max_token_length,
                             name=f"dec{i}")(
                h, memory, causal, deterministic
            )
        h = h.astype(jnp.float32)
        h = nn.LayerNorm(name="head_norm")(h)
        return nn.Dense(self.num_classes, use_bias=False, name="head")(h)


class CategoricalTransformer(nn.Module):
    """Token-sequence denoiser (`nn_lib.py:137-237`): embed -> pos ->
    timestep-aware encoder -> LN + linear head over the vocabulary."""

    backbone: BackboneConfig
    num_classes: int
    max_token_length: int
    pos_emb: str = "elem_attr"  # "default" | "elem_attr"
    n_attr_per_elem: int = 5
    lookahead: bool = True  # False => causal mask (AR models)
    dtype: jnp.dtype = jnp.float32
    decode: bool = False  # KV-cached single-token AR decoding
    # opt-in lane-padded head: emit (B, S, vocab_pad_target(V)) logits with
    # a -1e9 bias on MASK+pad lanes.  Only callers whose downstream is
    # `make_predict_start` (LayoutDM) may set this — other consumers
    # (MaskGIT/BLT/AR decode) read raw per-lane logits and keep V lanes.
    vocab_pad: bool = False

    @nn.compact
    def __call__(
        self,
        seq: jnp.ndarray,  # (B, S) int token ids
        timestep: Optional[jnp.ndarray] = None,  # (B,) int
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        c = self.backbone
        S = seq.shape[1]
        h = embed_tokens(
            nn.Embed(self.num_classes, c.d_model, name="cat_emb"),
            seq,
            dtype=self.dtype,
        )

        position = None
        if self.decode:
            # track the decode position for the positional embedding
            pi = self.variable(
                "cache", "pos_index", lambda: jnp.zeros((), jnp.int32)
            )
            position = pi.value
            pi.value = position + 1

        if self.pos_emb == "default":
            h = h + PositionalEmbedding(
                c.d_model, self.max_token_length, name="pos"
            )(S, position)
        else:
            h = h + ElementPositionalEmbedding(
                c.d_model,
                self.max_token_length,
                self.n_attr_per_elem,
                name="pos",
            )(S, position)
        h = nn.Dropout(0.1)(h, deterministic=deterministic)
        h = h.astype(self.dtype)

        attn_mask = None
        if not self.lookahead and not self.decode:
            attn_mask = jnp.triu(jnp.full((S, S), -jnp.inf), k=1)

        h = TransformerEncoder(
            c, dtype=self.dtype, decode=self.decode,
            decode_length=self.max_token_length, name="backbone",
        )(h, timestep, attn_mask, key_padding_mask, deterministic)
        h = h.astype(jnp.float32)
        h = nn.LayerNorm(name="head_norm")(h)
        if self.vocab_pad and use_vocab_pad(self.num_classes):
            # lane-padded head (see `use_vocab_pad`): zero-pad the kernel
            # columns to a 128-lane multiple and bias MASK+pad lanes to
            # -1e9; `make_predict_start` log_softmaxes over the padded
            # width (identical normalizer) and slices after the reduction
            w = _DenseKernel(self.num_classes, name="head")(h.shape[-1])
            Vp = vocab_pad_target(self.num_classes)
            wp = jnp.pad(w, ((0, 0), (0, Vp - self.num_classes)))
            lane_bias = jnp.where(
                jnp.arange(Vp) >= self.num_classes - 1, -1e9, 0.0
            ).astype(h.dtype)
            return h @ wp + lane_bias
        logits = nn.Dense(
            self.num_classes, use_bias=False, name="head"
        )(h)
        return logits
