"""Lane-aligned (d_model-padded) serving engine for the LayoutDM denoiser.

The flagship's d_model=464 / ff=1856 (the reference's 29/32 shrink of
512/2048, `models/layoutdm.py:54`) is lane-hostile on the MXU: the
slope-timed GEMM ladder (docs/DESIGN.md §5) measures the 464-wide FFN
pair at 151.5 TF/s while its 128-aligned 512x2048 twin reaches 191.6
(97% of the chip's bf16 peak).  Padding the *weights* to the aligned
twin's shapes is exact — zero input lanes contribute exactly 0.0 to
every dot product — EXCEPT through the layer norms, whose statistics
would see the pad lanes.  This module is the complete exact construction:

  * every GEMM runs at the padded width: embedding table (V, Dp),
    qkv (Dp, 3*H*hp) with per-head 64-lane scatter (the round-3
    `scatter_qkv_weights` trick), out-proj (H*hp, Dp), FFN (Dp, FFp) /
    (FFp, Dp), vocabulary head (Dp, Vp) with the lane-padded-head
    -1e9 bias (`nn.use_vocab_pad` convention);
  * norms compute MASKED statistics: pad lanes hold exact zeros, so
    mean = sum/d and E[x^2] = sum(x^2)/d over the padded width are the
    unpadded statistics exactly (the zero lanes add zero to both sums);
  * pad lanes are re-zeroed after each norm: affine norms get
    zero-padded scale/bias (0*xn + 0 == 0); the affine-free
    AdaLayerNorm multiplies by the lane mask before modulation, and its
    (scale, shift) modulations are zero-padded.

Residual adds, GELU(0)=0, and zero-padded GEMM outputs then keep the
pad lanes at exact 0.0 through the whole trunk, so no other site needs
masking.  The construction is exact up to f32 summation order (tested
to 2e-5 vs the flax forward).

Like `int8_serving`, this is a MIRROR of `nn.CategoricalTransformer`'s
forward reading the SAME param tree — padding happens once at
`pad_weights` time, so the sampling scan sees only loop-invariant
aligned weights.  Scope (`can_use_dpad`): the flagship family —
elem_attr positions, adalayernorm (embedding-table variant), lookahead
dense attention, d_model not already 128-aligned.

MEASURED OUTCOME (docs/DESIGN.md §6 "dpad" ledger entry): REJECTED —
`LAYOUTDM_TPU_DPAD=1 python bench.py` measures 340.2 layouts/s / MFU
0.615 vs the 359.4 / 0.641 default.  The masked-norm statistics over the
padded width, the pad-lane re-zeroing, and the +10% wider bf16 residual
stream cost more than the GEMM alignment saves at these
not-MXU-rate-bound shapes.  Kept gated (off by default) with its
exactness test pack for a future compute-bound model.
"""

from __future__ import annotations

import math
import os
from typing import Dict

import jax
import jax.numpy as jnp

from layoutdm_tpu.configs import BackboneConfig
from layoutdm_tpu.models.nn import ACTIVATIONS, vocab_pad_target
from layoutdm_tpu.ops.attention import (
    can_use_fused,
    can_use_smajor,
    fused_attention_qkv,
    fused_attention_qkv_smajor,
    head_pad_target,
)
from layoutdm_tpu.ops.attention_blockdiag import (
    scatter_out_weights,
    scatter_qkv_weights,
)


def dpad_target(d: int) -> int:
    """Next multiple-of-128 lane width for the residual stream."""
    return -(-d // 128) * 128


def can_use_dpad(
    bb: BackboneConfig, pos_emb: str = "elem_attr", lookahead: bool = True
) -> bool:
    """Gate for the lane-aligned serving mirror (LAYOUTDM_TPU_DPAD=1).

    Default OFF — a measured negative result (module docstring /
    docs/DESIGN.md §6: 340.2 vs 359.4 layouts/s on the flagship bench);
    scope limits mirror `can_use_int8`'s (the mirror has no
    attention-mask support and reads the embedding-table AdaLayerNorm
    layout)."""
    if os.environ.get("LAYOUTDM_TPU_DPAD") != "1":
        return False
    if not lookahead:
        return False
    if bb.timestep_type is None or "adalayernorm" not in bb.timestep_type:
        return False
    if "mlp" in bb.timestep_type or "abs" in bb.timestep_type:
        return False
    if bb.d_model % 128 == 0 and bb.dim_feedforward % 128 == 0:
        return False  # already aligned; padding is a no-op
    return pos_emb == "elem_attr"


def pad_weights(
    params, bb: BackboneConfig, num_classes: int
) -> Dict[str, jnp.ndarray]:
    """Pad every trunk weight to 128-aligned widths, once.

    Exactness per site (D=d_model -> Dp, FF=dim_feedforward -> FFp,
    per-head hd -> hp):
      * zero COLUMN pads produce exact 0.0 output lanes;
      * zero ROW pads consume the trunk's exact-0.0 pad lanes;
      * per-head scatter (`scatter_qkv_weights`) keeps each head's
        logical hd lanes in its own aligned hp block, so softmax scale
        stays 1/sqrt(hd) and the k/v pad lanes add zero score terms;
      * norm scale/bias pads are ZERO so affine norms re-zero the pad
        lanes ((xn)*0 + 0); AdaLayerNorm has no affine — the forward
        masks instead;
      * the head gets the lane-padded-head treatment (columns to Vp,
        -1e9 bias on MASK+pad lanes) so `make_predict_start`'s padded
        branch applies unchanged.
    """
    D, FF, H = bb.d_model, bb.dim_feedforward, bb.nhead
    hd = D // H
    hp = head_pad_target(hd)
    Dp, FFp = dpad_target(D), dpad_target(FF)
    V, Vp = num_classes, vocab_pad_target(num_classes)

    def cols(w, n):  # pad output lanes with zeros
        return jnp.pad(w, ((0, 0), (0, n - w.shape[1])))

    def rows(w, n):  # pad input lanes with zeros
        return jnp.pad(w, ((0, n - w.shape[0]), (0, 0)))

    def vec(b, n):
        return jnp.pad(b, (0, n - b.shape[0]))

    pw: Dict[str, jnp.ndarray] = {
        "emb": cols(params["cat_emb"]["embedding"], Dp),  # (V, Dp)
        "head_w": cols(rows(params["head"]["kernel"], Dp), Vp),  # (Dp, Vp)
        "head_bias": jnp.where(jnp.arange(Vp) >= V - 1, -1e9, 0.0),
        "hn_scale": vec(params["head_norm"]["scale"], Dp),
        "hn_bias": vec(params["head_norm"]["bias"], Dp),
    }
    pos = params["pos"]
    assert "elem_emb" in pos and "attr_emb" in pos, (
        "dpad mirror requires elem_attr positional embeddings; this param "
        "tree has " + "/".join(sorted(pos))
    )
    assert "bos_emb" not in pos, "BOS positional slot not supported here"
    n_elem, n_attr = pos["elem_emb"].shape[0], pos["attr_emb"].shape[0]
    pe = jnp.repeat(pos["elem_emb"], n_attr, axis=0) + jnp.tile(
        pos["attr_emb"], (n_elem, 1)
    )
    pw["pe"] = cols(pe, Dp)  # (S_max, Dp)

    for i in range(bb.num_layers):
        lp = params["backbone"][f"layer{i}"]
        cond = lp["norm1"]["AdaNormCond_0"]
        # the cond branch stays at the LOGICAL width (tiny (B, D) tensors;
        # its GEMM is ~1e-4 of the step) — the forward pads its
        # (scale, shift) outputs with zeros instead
        pw[f"l{i}/cond_emb"] = cond["emb"]["embedding"]
        pw[f"l{i}/cond_w"] = cond["linear"]["kernel"]
        pw[f"l{i}/cond_b"] = cond["linear"]["bias"]
        wq, bq = lp["attn"]["qkv"]["kernel"], lp["attn"]["qkv"]["bias"]
        wqs, bqs = scatter_qkv_weights(wq, bq, H, hd, hp)
        pw[f"l{i}/qkv_w"] = rows(wqs, Dp)  # (Dp, 3*H*hp)
        pw[f"l{i}/qkv_b"] = bqs
        wo = scatter_out_weights(lp["attn"]["out"]["kernel"], H, hd, hp)
        pw[f"l{i}/out_w"] = cols(wo, Dp)  # (H*hp, Dp)
        pw[f"l{i}/out_b"] = vec(lp["attn"]["out"]["bias"], Dp)
        pw[f"l{i}/n2_scale"] = vec(lp["norm2"]["scale"], Dp)
        pw[f"l{i}/n2_bias"] = vec(lp["norm2"]["bias"], Dp)
        pw[f"l{i}/w1"] = cols(rows(lp["linear1"]["kernel"], Dp), FFp)
        pw[f"l{i}/b1"] = vec(lp["linear1"]["bias"], FFp)
        pw[f"l{i}/w2"] = cols(rows(lp["linear2"]["kernel"], FFp), Dp)
        pw[f"l{i}/b2"] = vec(lp["linear2"]["bias"], Dp)
    return pw


def _masked_stats(xf: jnp.ndarray, d_real: int):
    """Mean and variance of the d_real REAL lanes of a padded-width f32
    tensor whose pad lanes are exact zeros: the zero lanes add nothing to
    either sum, so dividing by d_real recovers the unpadded statistics
    (flax's use_fast_variance form: E[x^2] - mean^2)."""
    mean = xf.sum(-1, keepdims=True) / d_real
    ex2 = (xf * xf).sum(-1, keepdims=True) / d_real
    var = ex2 - mean * mean
    return mean, var


def mirror_forward_dpad(
    pw: Dict[str, jnp.ndarray],
    bb: BackboneConfig,
    num_classes: int,
    seq: jnp.ndarray,  # (B, S) int32
    t: jnp.ndarray,  # (B,) int32
    dtype=jnp.bfloat16,
):
    """Forward at the PADDED widths reading `pad_weights`' tree; returns
    (B, S, Vp) lane-padded logits (`make_predict_start`'s padded branch
    slices after its log_softmax).  Structure mirrors
    `int8_serving.mirror_forward` (embed -> pos -> L x (AdaLN -> attn ->
    LN -> FFN) -> head LN -> head), which is itself tested equal to the
    flax forward — including the reference's norm1-replaces-trunk quirk."""
    D, H = bb.d_model, bb.nhead
    hd = D // H
    hp = head_pad_target(hd)
    Dp = pw["emb"].shape[1]
    S = seq.shape[1]
    lane_real = (jnp.arange(Dp) < D).astype(jnp.float32)  # (Dp,)

    # one-hot embed (the `embed_tokens` route: TPU gathers bypass the MXU)
    oh = jax.nn.one_hot(seq, num_classes, dtype=pw["emb"].dtype)
    h = jax.lax.dot_general(
        oh, pw["emb"], (((2,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    h = (h + pw["pe"][None, :S]).astype(dtype)

    def ada_ln(i, x):
        emb = pw[f"l{i}/cond_emb"][t]  # (B, D) logical width
        emb = jax.nn.silu(emb)
        emb = emb @ pw[f"l{i}/cond_w"] + pw[f"l{i}/cond_b"]  # (B, 2D)
        scale, shift = jnp.split(emb[:, None, :], 2, axis=-1)
        scale = jnp.pad(scale, ((0, 0), (0, 0), (0, Dp - D)))
        shift = jnp.pad(shift, ((0, 0), (0, 0), (0, Dp - D)))
        xf = x.astype(jnp.float32)
        mean, var = _masked_stats(xf, D)
        xn = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
        # no affine to re-zero the pads ((0-mean)/sigma != 0): mask, then
        # modulate — pad lanes get 0*(1+0)+0 == 0
        xn = xn * lane_real
        return xn * (1 + scale) + shift

    def layer_norm(x, g, b):
        xf = x.astype(jnp.float32)
        mean, var = _masked_stats(xf, D)
        xn = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
        return xn * g + b  # zero-padded scale/bias re-zero the pad lanes

    for i in range(bb.num_layers):
        # norm1 REPLACES the trunk (the reference's quirk, kept by
        # models/nn.py Block)
        x = ada_ln(i, h).astype(dtype)
        h = x
        scale = 1.0 / math.sqrt(hd)  # logical head size, not hp
        itemsize = jnp.dtype(dtype).itemsize
        if can_use_smajor(S, None, None, d_model=H * hp, itemsize=itemsize):
            # S-major variant (same as nn.py's default path): the swap is
            # a free bitcast of the GEMM's batch-minor output layout; the
            # bias add moves into the kernel's VMEM
            qkv_sm = jnp.swapaxes(x @ pw[f"l{i}/qkv_w"].astype(dtype), 0, 1)
            attn = fused_attention_qkv_smajor(
                qkv_sm, pw[f"l{i}/qkv_b"].astype(dtype),
                num_heads=H, scale=scale,
            )
        elif can_use_fused(S, None, None, d_model=H * hp, itemsize=itemsize):
            qkv = (x @ pw[f"l{i}/qkv_w"].astype(dtype)) + pw[
                f"l{i}/qkv_b"
            ].astype(dtype)
            attn = fused_attention_qkv(qkv, num_heads=H, scale=scale)
        else:
            qkv = (x @ pw[f"l{i}/qkv_w"].astype(dtype)) + pw[
                f"l{i}/qkv_b"
            ].astype(dtype)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            B = q.shape[0]
            q = q.reshape(B, S, H, hp)
            k = k.reshape(B, S, H, hp)
            v = v.reshape(B, S, H, hp)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(dtype)
            attn = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, S, H * hp)
        attn = (attn @ pw[f"l{i}/out_w"].astype(dtype)) + pw[
            f"l{i}/out_b"
        ].astype(dtype)
        h = h + attn.astype(dtype)

        x = layer_norm(h, pw[f"l{i}/n2_scale"], pw[f"l{i}/n2_bias"]).astype(
            dtype
        )
        f = (x @ pw[f"l{i}/w1"].astype(dtype)) + pw[f"l{i}/b1"].astype(dtype)
        f = ACTIVATIONS[bb.activation](f)
        f = (f @ pw[f"l{i}/w2"].astype(dtype)) + pw[f"l{i}/b2"].astype(dtype)
        h = h + f.astype(dtype)

    # head in f32, matching the flax forward (nn.py's head has no dtype
    # override) — precision-critical
    hf = layer_norm(h.astype(jnp.float32), pw["hn_scale"], pw["hn_bias"])
    return hf @ pw["head_w"].astype(jnp.float32) + pw["head_bias"]


def make_dpad_predict_start(model, params):
    """Drop-in replacement for the model's `_predict_start` running the
    lane-aligned mirror; the log_softmax runs over the padded vocabulary
    width (the -1e9 lanes underflow to exactly zero probability, so the
    normalizer is identical — `nn.use_vocab_pad` reasoning) and the slice
    to V-1 happens AFTER that reduction (slice-DCE pitfall,
    docs/DESIGN.md §5)."""
    if not getattr(model.net, "lookahead", True):
        raise ValueError(
            "dpad serving path requires a mask-free (lookahead) "
            "transformer; this model's net is causal"
        )
    bb = model.backbone_cfg
    V = model.num_classes
    dtype = getattr(model.net, "dtype", jnp.bfloat16)  # match the model's
    pw = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x), pad_weights(params, bb, V)
    )

    def predict_start(p, ids, t_b, _rng=None):
        logits = mirror_forward_dpad(pw, bb, V, ids, t_b, dtype=dtype)
        log_pred = jax.nn.log_softmax(logits, axis=-1)[..., : V - 1]
        mask_lane = jnp.full_like(log_pred[..., :1], -70.0)
        log_pred = jnp.concatenate([log_pred, mask_lane], axis=-1)
        return jnp.clip(log_pred, -70.0, 0.0)

    return predict_start
