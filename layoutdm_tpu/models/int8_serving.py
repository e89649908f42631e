"""int8 serving engine for the LayoutDM denoiser.

The MXU runs int8 x int8 -> int32 at ~2x its bf16 rate (measured on this
chip: 292 vs 152 TF/s on the flagship FFN pair, `bin/bench_int8.py`), but
*dynamic* per-tensor quantization gives the gain straight back (164 TOP/s
— the runtime max-abs reduce + rescale costs a full extra pass per GEMM).
The serving-grade recipe is therefore STATIC quantization:

  * weights: per-output-channel int8, scales computed once from params
    (`quantize_weights`);
  * activations: per-site scalar scales calibrated offline by running a
    few bf16 batches and recording max|x| at every GEMM input
    (`calibrate_scales`); at serving time the quantize is a scale+round+
    clip+cast that XLA fuses into the producing op's epilogue.

This module is a MIRROR of `nn.CategoricalTransformer`'s forward that
reads the SAME param tree (no new checkpoint format): embed -> elem/attr
positions -> L x (AdaLayerNorm -> int8 qkv -> pallas fused attention ->
int8 out-proj -> LayerNorm -> int8 FFN) -> head LayerNorm -> bf16 head.
Attention internals and the vocabulary head stay bf16/f32 (precision-
critical, and together <15% of step time).  A bf16 run of the mirror is
asserted equal to the flax forward in tests, so drift between the two
implementations fails CI.

Scope (gated by `can_use_int8`): the flagship family — elem_attr
positions, adalayernorm (embedding-table variant), lookahead dense
attention.  Everything else falls back to the bf16 path.

MEASURED OUTCOME (docs/DESIGN.md §6): rejected as default on the
flagship.  End-to-end the denoiser forward is 53.4 ms int8 vs 32.1 ms
bf16 (slope-timed, B=1024) and the full chain 185.5 vs 311.9 layouts/s
— at d_model=464 the GEMMs are HBM/overhead-bound, not MXU-rate-bound,
so the 2x int8 arithmetic rate buys nothing while the quantize passes
add HBM traffic.  Kept env-gated (LAYOUTDM_TPU_INT8=1, bench.py picks
it up) because the recipe is correct for compute-bound model sizes.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from layoutdm_tpu.configs import BackboneConfig
from layoutdm_tpu.models.nn import ACTIVATIONS
from layoutdm_tpu.ops.attention import can_use_fused, fused_attention_qkv

GEMM_SITES = ("qkv", "out", "linear1", "linear2")


# -- static quantization helpers -------------------------------------------


def quantize_weights(params) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Per-output-channel int8 weights + f32 scales for every GEMM site of
    every backbone layer.  Reads the flax param tree in place."""
    out = {}
    backbone = params["backbone"]
    for lname, layer in backbone.items():
        for site in GEMM_SITES:
            holder = layer["attn"] if site in ("qkv", "out") else layer
            w = holder[site]["kernel"]
            sw = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0
            out[f"{lname}/{site}"] = {
                "w_q": jnp.round(w / sw[None, :]).astype(jnp.int8),
                "s_w": sw.astype(jnp.float32),
                "b": holder[site]["bias"].astype(jnp.float32),
            }
    return out


def _int8_dense(x, wq_entry, s_act):
    """x (.., K) bf16 -> int8 GEMM -> f32 out.  The quantize is a
    scale+round+clip+cast epilogue of whatever produced x."""
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) * (1.0 / s_act)), -127, 127
    ).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q, wq_entry["w_q"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (s_act * wq_entry["s_w"]) + wq_entry["b"]


# -- the mirror forward ----------------------------------------------------


def _ada_layer_norm(lp, x, t):
    """AdaLayerNorm (embedding-table variant): params under
    norm1/AdaNormCond_0/{emb,linear}."""
    cond = lp["norm1"]["AdaNormCond_0"]
    emb = cond["emb"]["embedding"][t]  # (B, D)
    emb = jax.nn.silu(emb)
    emb = emb @ cond["linear"]["kernel"] + cond["linear"]["bias"]  # (B, 2D)
    scale, shift = jnp.split(emb[:, None, :], 2, axis=-1)
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    return xn * (1 + scale) + shift


def _layer_norm(p, x):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    return xn * p["scale"] + p["bias"]


def mirror_forward(
    params,
    bb: BackboneConfig,
    num_classes: int,
    seq: jnp.ndarray,  # (B, S) int32
    t: jnp.ndarray,  # (B,) int32
    wq: Optional[Dict] = None,
    act_scales: Optional[Dict[str, jnp.ndarray]] = None,
    observe: bool = False,
    dtype=jnp.bfloat16,
):
    """Forward pass reading the flax param tree directly.

    * wq=None, observe=False: plain bf16 mirror (tested == flax apply).
    * observe=True: returns (logits, {site: max|input|}) for calibration.
    * wq + act_scales set: int8 GEMMs at the four sites per layer.
    """
    assert bb.timestep_type is not None and "adalayernorm" in bb.timestep_type
    D, H, L = bb.d_model, bb.nhead, bb.num_layers
    S = seq.shape[1]
    observed: Dict[str, jnp.ndarray] = {}

    h = params["cat_emb"]["embedding"][seq]  # (B, S, D) f32
    pos = params["pos"]
    assert "elem_emb" in pos and "attr_emb" in pos, (
        "int8 mirror requires elem_attr positional embeddings; this param "
        "tree has " + "/".join(sorted(pos))
    )
    n_elem = pos["elem_emb"].shape[0]
    n_attr = pos["attr_emb"].shape[0]
    assert "bos_emb" not in pos, "BOS positional slot not supported here"
    pe = jnp.repeat(pos["elem_emb"], n_attr, axis=0) + jnp.tile(
        pos["attr_emb"], (n_elem, 1)
    )
    h = (h + pe[None, :S]).astype(dtype)

    def gemm(site_key, x, holder_w):
        if wq is not None:
            return _int8_dense(x, wq[site_key], act_scales[site_key])
        if observe:
            observed[site_key] = jnp.max(jnp.abs(x.astype(jnp.float32)))
        w = holder_w["kernel"].astype(x.dtype)
        b = holder_w["bias"].astype(jnp.float32)
        return x @ w + b

    for i in range(L):
        lp = params["backbone"][f"layer{i}"]
        # norm1 REPLACES the trunk (the reference's quirk, kept by
        # models/nn.py Block): the attention residual is based on the
        # normed activations, not the block input
        x = _ada_layer_norm(lp, h, t).astype(dtype)
        h = x
        qkv = gemm(f"layer{i}/qkv", x, lp["attn"]["qkv"]).astype(dtype)
        if can_use_fused(
            S, None, None, d_model=D, itemsize=jnp.dtype(dtype).itemsize
        ):
            attn = fused_attention_qkv(qkv, num_heads=H)
        else:
            hd = D // H
            q, k, v = jnp.split(qkv, 3, axis=-1)
            B = q.shape[0]
            q = q.reshape(B, S, H, hd)
            k = k.reshape(B, S, H, hd)
            v = v.reshape(B, S, H, hd)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
            p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(dtype)
            attn = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, S, D)
        attn = gemm(f"layer{i}/out", attn.astype(dtype), lp["attn"]["out"])
        h = h + attn.astype(dtype)

        x = _layer_norm(lp["norm2"], h).astype(dtype)
        f = gemm(f"layer{i}/linear1", x, lp["linear1"])
        f = ACTIVATIONS[bb.activation](f.astype(dtype))
        f = gemm(f"layer{i}/linear2", f, lp["linear2"])
        h = h + f.astype(dtype)

    # vocabulary head in f32, matching the flax forward (nn.py runs the
    # head Dense without a dtype override) — precision-critical
    hf = _layer_norm(params["head_norm"], h)
    logits = hf @ params["head"]["kernel"].astype(jnp.float32)
    if observe:
        return logits, observed
    return logits


# -- calibration + drop-in predict_start -----------------------------------


def calibrate_scales(
    params, bb: BackboneConfig, num_classes: int, seq, t, margin: float = 1.0
) -> Dict[str, jnp.ndarray]:
    """Run one bf16 observe pass and turn per-site max|x| into scalar
    quantization scales (max/127, with a safety margin)."""
    _, observed = jax.jit(
        lambda p, s, tt: mirror_forward(
            p, bb, num_classes, s, tt, observe=True
        )
    )(params, seq, t)
    return {
        k: (jnp.maximum(v, 1e-6) * margin / 127.0).astype(jnp.float32)
        for k, v in observed.items()
    }


def can_use_int8(
    bb: BackboneConfig, pos_emb: str = "elem_attr", lookahead: bool = True
) -> bool:
    import os

    if os.environ.get("LAYOUTDM_TPU_INT8") != "1":
        return False
    if not lookahead:
        # mirror_forward has no attention-mask support: a causal
        # (lookahead=False) config would silently drop the causal mask and
        # produce wrong logits — refuse loudly here instead
        return False
    if bb.timestep_type is None or "adalayernorm" not in bb.timestep_type:
        return False
    if "mlp" in bb.timestep_type or "abs" in bb.timestep_type:
        return False
    return pos_emb == "elem_attr"


def make_int8_predict_start(model, params, calib_batch: int = 64, rng=None):
    """Drop-in replacement for the model's `_predict_start` using int8
    GEMMs: quantizes weights once, calibrates activation scales on one
    batch of model-sampled noise levels, and wraps the mirror in the
    same log-softmax/MASK-lane head as `make_predict_start`."""
    # the guard that matters lives HERE, where the model's real attention
    # mode is in hand (can_use_int8's `lookahead` param relies on callers
    # already knowing the flag): mirror_forward has no attention-mask
    # support, so a causal transformer would silently lose its mask
    if not getattr(model.net, "lookahead", True):
        raise ValueError(
            "int8 serving path requires a mask-free (lookahead) "
            "transformer; this model's net is causal"
        )
    bb = model.backbone_cfg
    V, S = model.num_classes, model.seq_len
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    # calibration inputs: random token ids at a spread of timesteps —
    # activations are bounded by embeddings+LN so this covers serving
    r1, r2 = jax.random.split(rng)
    seq = jax.random.randint(r1, (calib_batch, S), 0, V)
    t = jax.random.randint(r2, (calib_batch,), 0, model.q.num_timesteps)
    scales = calibrate_scales(params, bb, V, seq, t)
    wq = quantize_weights(params)

    def predict_start(p, ids, t_b, _rng=None):
        logits = mirror_forward(
            p, bb, V, ids, t_b, wq=wq, act_scales=scales
        )
        out = logits[..., :-1]
        log_pred = jax.nn.log_softmax(out, axis=-1)
        mask_lane = jnp.full_like(log_pred[..., :1], -70.0)
        log_pred = jnp.concatenate([log_pred, mask_lane], axis=-1)
        return jnp.clip(log_pred, -70.0, 0.0)

    return predict_start
