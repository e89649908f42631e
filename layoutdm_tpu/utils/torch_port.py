"""Import reference PyTorch checkpoints into this framework's flax params.

The released LayoutDM weights (`{best,final}_model.pt`, saved at
`models/common/util.py:60-64`) are a torch ``state_dict`` with keys under
``model.module.`` (DataParallel) — transformer weights, per-attribute
schedule buffers, and the importance-sampling buffers.  This module maps the
denoiser weights onto `models.nn.CategoricalTransformer` params (the
schedule tables are recomputed exactly from config, and Lt buffers transfer
into `LtState`), enabling token-level parity runs against the reference.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from layoutdm_tpu.models.diffusion.loss import LtState


def _np(t):
    # copy=True: .numpy() shares storage with the torch tensor, so an
    # in-place torch mutation (e.g. optimizer.step()) would silently
    # corrupt already-imported parameters
    return np.array(t.detach().cpu().numpy(), copy=True)


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return sd


def strip_prefix(sd: Dict, prefix: str = "model.module.") -> Dict:
    return {
        (k[len(prefix) :] if k.startswith(prefix) else k): v
        for k, v in sd.items()
    }


def convert_categorical_transformer(
    sd: Dict,
    num_layers: int,
    timestep_type: Optional[str] = "adalayernorm",
    prefix: str = "transformer.",
) -> Dict:
    """torch `CategoricalTransformer` (`nn_lib.py:137-237`) -> flax params
    for `models.nn.CategoricalTransformer`."""
    g = lambda k: _np(sd[prefix + k])

    def dense(k):
        return {"kernel": g(f"{k}.weight").T, "bias": g(f"{k}.bias")}

    def layernorm(k):
        return {"scale": g(f"{k}.weight"), "bias": g(f"{k}.bias")}

    params: Dict[str, Any] = {
        "cat_emb": {"embedding": g("cat_emb.weight")},
    }
    # positional embedding variants (`nn_lib.py:73-134`)
    pos = {}
    if prefix + "pos_emb.pos_emb" in sd:
        pos["pos_emb"] = g("pos_emb.pos_emb")
    else:
        pos["elem_emb"] = g("pos_emb.elem_emb")
        pos["attr_emb"] = g("pos_emb.attr_emb")
        if prefix + "pos_emb.bos_emb" in sd:
            pos["bos_emb"] = g("pos_emb.bos_emb")
    params["pos"] = pos

    for i in range(num_layers):
        lp = f"backbone.layers.{i}"
        layer: Dict[str, Any] = {}
        if timestep_type is not None:
            cond = {"linear": dense(f"{lp}.norm1.linear")}
            if "mlp" in timestep_type:
                cond["mlp1"] = dense(f"{lp}.norm1.emb.1")
                cond["mlp2"] = dense(f"{lp}.norm1.emb.3")
            elif "abs" not in timestep_type:
                cond["emb"] = {"embedding": g(f"{lp}.norm1.emb.weight")}
            layer["norm1"] = {"AdaNormCond_0": cond}
        else:
            layer["norm1"] = layernorm(f"{lp}.norm1")
        layer["attn"] = {
            "qkv": {
                "kernel": g(f"{lp}.self_attn.in_proj_weight").T,
                "bias": g(f"{lp}.self_attn.in_proj_bias"),
            },
            "out": dense(f"{lp}.self_attn.out_proj"),
        }
        layer["linear1"] = dense(f"{lp}.linear1")
        layer["linear2"] = dense(f"{lp}.linear2")
        layer["norm2"] = layernorm(f"{lp}.norm2")
        params[f"backbone"] = params.get("backbone", {})
        params["backbone"][f"layer{i}"] = layer

    params["head_norm"] = layernorm("head.0")
    params["head"] = {"kernel": g("head.1.weight").T}
    return params


def convert_continuous_transformer(
    sd: Dict,
    num_layers: int,
    timestep_type: Optional[str] = "adalayernorm_mlp",
    prefix: str = "transformer.",
) -> Dict:
    """torch `ContinuousTransformer` (`nn_lib.py:240-313`) -> flax params for
    `models.continuous.base.ContinuousTransformer`.

    Differences from the categorical port: the input embedding is a Linear
    over concat(self_cond, x) instead of an Embedding, and the head keeps the
    same LayerNorm+Linear(no-bias) Sequential split."""
    g = lambda k: _np(sd[prefix + k])

    def dense(k):
        return {"kernel": g(f"{k}.weight").T, "bias": g(f"{k}.bias")}

    def layernorm(k):
        return {"scale": g(f"{k}.weight"), "bias": g(f"{k}.bias")}

    params: Dict[str, Any] = {"emb": dense("emb")}
    pos = {}
    if prefix + "pos_emb.pos_emb" in sd:
        pos["pos_emb"] = g("pos_emb.pos_emb")
    else:
        pos["elem_emb"] = g("pos_emb.elem_emb")
        pos["attr_emb"] = g("pos_emb.attr_emb")
        if prefix + "pos_emb.bos_emb" in sd:
            pos["bos_emb"] = g("pos_emb.bos_emb")
    params["pos"] = pos

    params["backbone"] = {}
    for i in range(num_layers):
        lp = f"backbone.layers.{i}"
        layer: Dict[str, Any] = {}
        if timestep_type is not None:
            cond = {"linear": dense(f"{lp}.norm1.linear")}
            if "mlp" in timestep_type:
                cond["mlp1"] = dense(f"{lp}.norm1.emb.1")
                cond["mlp2"] = dense(f"{lp}.norm1.emb.3")
            elif "abs" not in timestep_type:
                cond["emb"] = {"embedding": g(f"{lp}.norm1.emb.weight")}
            layer["norm1"] = {"AdaNormCond_0": cond}
        else:
            layer["norm1"] = layernorm(f"{lp}.norm1")
        layer["attn"] = {
            "qkv": {
                "kernel": g(f"{lp}.self_attn.in_proj_weight").T,
                "bias": g(f"{lp}.self_attn.in_proj_bias"),
            },
            "out": dense(f"{lp}.self_attn.out_proj"),
        }
        layer["linear1"] = dense(f"{lp}.linear1")
        layer["linear2"] = dense(f"{lp}.linear2")
        layer["norm2"] = layernorm(f"{lp}.norm2")
        params["backbone"][f"layer{i}"] = layer

    params["head_norm"] = layernorm("head.0")
    params["head"] = {"kernel": g("head.1.weight").T}
    return params


def convert_categorical_encdec_transformer(
    sd: Dict,
    num_layers: int,
    d_model: int,
    prefix: str = "",
) -> Dict:
    """torch `CategoricalEncDecTransformer` (`nn_lib.py:316-400`, encoder =
    TransformerEncoder Blocks, decoder = torch nn.TransformerDecoder with
    norm_first layers) -> flax params for `models.nn
    .CategoricalEncDecTransformer`."""
    g = lambda k: _np(sd[prefix + k])

    def dense(k):
        return {"kernel": g(f"{k}.weight").T, "bias": g(f"{k}.bias")}

    def layernorm(k):
        return {"scale": g(f"{k}.weight"), "bias": g(f"{k}.bias")}

    def posmod(src):
        if f"{prefix}{src}.pos_emb" in sd:
            return {"pos_emb": g(f"{src}.pos_emb")}
        pos = {
            "elem_emb": g(f"{src}.elem_emb"),
            "attr_emb": g(f"{src}.attr_emb"),
        }
        if f"{prefix}{src}.bos_emb" in sd:
            pos["bos_emb"] = g(f"{src}.bos_emb")
        return pos

    params: Dict[str, Any] = {
        "input_emb": {"embedding": g("input_cat_emb.weight")},
        "target_emb": {"embedding": g("target_cat_emb.weight")},
        "input_pos": posmod("input_pos_emb"),
        "target_pos": posmod("target_pos_emb"),
        "encoder": {},
    }
    for i in range(num_layers):
        lp = f"encoder.layers.{i}"
        params["encoder"][f"layer{i}"] = {
            "norm1": layernorm(f"{lp}.norm1"),
            "attn": {
                "qkv": {
                    "kernel": g(f"{lp}.self_attn.in_proj_weight").T,
                    "bias": g(f"{lp}.self_attn.in_proj_bias"),
                },
                "out": dense(f"{lp}.self_attn.out_proj"),
            },
            "linear1": dense(f"{lp}.linear1"),
            "linear2": dense(f"{lp}.linear2"),
            "norm2": layernorm(f"{lp}.norm2"),
        }

    D = d_model
    for i in range(num_layers):
        lp = f"decoder.layers.{i}"
        w_in = g(f"{lp}.multihead_attn.in_proj_weight")  # (3D, D)
        b_in = g(f"{lp}.multihead_attn.in_proj_bias")
        params[f"dec{i}"] = {
            "norm1": layernorm(f"{lp}.norm1"),
            "self_attn": {
                "qkv": {
                    "kernel": g(f"{lp}.self_attn.in_proj_weight").T,
                    "bias": g(f"{lp}.self_attn.in_proj_bias"),
                },
                "out": dense(f"{lp}.self_attn.out_proj"),
            },
            "norm2": layernorm(f"{lp}.norm2"),
            "cross_attn": {
                "q": {"kernel": w_in[:D].T, "bias": b_in[:D]},
                "kv": {"kernel": w_in[D:].T, "bias": b_in[D:]},
                "out": dense(f"{lp}.multihead_attn.out_proj"),
            },
            "norm3": layernorm(f"{lp}.norm3"),
            "linear1": dense(f"{lp}.linear1"),
            "linear2": dense(f"{lp}.linear2"),
        }

    params["head_norm"] = layernorm("head.0")
    params["head"] = {"kernel": g("head.1.weight").T}
    return params


def import_layoutdm_checkpoint(
    path: str,
    num_layers: int = 4,
    timestep_type: Optional[str] = "adalayernorm",
) -> Tuple[Dict, LtState]:
    """Full reference LayoutDM `.pt` -> (denoiser flax params, LtState).

    Schedule buffers (`{key}_log_at` etc.) are NOT imported: they are pure
    functions of the config and our `ScheduleTables` reproduces them from
    the same float64 construction.
    """
    sd = strip_prefix(load_torch_state_dict(path))
    params = convert_categorical_transformer(sd, num_layers, timestep_type)
    lt = LtState(
        history=np.asarray(_np(sd["Lt_history"])),
        count=np.asarray(_np(sd["Lt_count"])),
    )
    return params, lt
