"""FIDNetV3 — the layout feature extractor for FID, in flax.

Re-design of `fid/model.py:123-180` (+ the CLS-token encoder of `:8-41`).
Architecture parity: bbox-fc + label-emb -> fused fc -> relu -> 4-layer
POST-norm transformer encoder (torch `nn.TransformerEncoderLayer` defaults:
relu, d_ff = d_model/2) with a learned CLS token; the 256-d CLS output is
the FID feature.  The auxiliary decoder (broadcast feature + learned
positional token -> per-element class/bbox heads) and the real/fake
discriminator head are used only when (re)training the extractor
(`fid/train.py:112-117`).

Feature extraction is a single jitted call over padded batches — on-TPU
eval as SURVEY.md §7.6 prescribes.  A torch checkpoint importer maps the
released `model_best.pth.tar` weights into this module.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class PostNormBlock(nn.Module):
    """torch nn.TransformerEncoderLayer semantics: post-norm, relu."""

    d_model: int
    nhead: int
    dim_feedforward: int

    @nn.compact
    def __call__(self, x, key_padding_mask=None):
        B, S, D = x.shape
        H = self.nhead
        qkv = nn.Dense(3 * D, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, H, D // H)
        k = k.reshape(B, S, H, D // H)
        v = v.reshape(B, S, H, D // H)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(D // H)
        if key_padding_mask is not None:
            scores = jnp.where(
                key_padding_mask[:, None, None, :], -1e9, scores
            )
        attn = jax.nn.softmax(scores, axis=-1)
        sa = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, S, D)
        sa = nn.Dense(D, name="out")(sa)
        x = nn.LayerNorm(name="norm1")(x + sa)
        h = nn.Dense(self.dim_feedforward, name="linear1")(x)
        h = nn.Dense(self.d_model, name="linear2")(jax.nn.relu(h))
        return nn.LayerNorm(name="norm2")(x + h)


class FIDNetV3(nn.Module):
    num_labels: int
    d_model: int = 256
    nhead: int = 4
    num_layers: int = 4
    max_bbox: int = 50

    def setup(self):
        D = self.d_model
        self.emb_label = nn.Embed(self.num_labels, D)
        self.fc_bbox = nn.Dense(D)
        self.enc_fc_in = nn.Dense(D)
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, D)
        )
        self.enc_layers = [
            PostNormBlock(D, self.nhead, D // 2, name=f"enc{i}")
            for i in range(self.num_layers)
        ]
        self.fc_out_disc = nn.Dense(1)

        self.pos_token = self.param(
            "pos_token", nn.initializers.uniform(1.0), (self.max_bbox, 1, D)
        )
        self.dec_fc_in = nn.Dense(D)
        self.dec_layers = [
            PostNormBlock(D, self.nhead, D // 2, name=f"dec{i}")
            for i in range(self.num_layers)
        ]
        self.fc_out_cls = nn.Dense(self.num_labels)
        self.fc_out_bbox = nn.Dense(4)

    def extract_features(self, bbox, label, padding_mask):
        """(B,S,4),(B,S),(B,S) True=pad -> (B, d_model) CLS features
        (`fid/model.py:153-159`)."""
        B = bbox.shape[0]
        x = jnp.concatenate(
            [self.fc_bbox(bbox), self.emb_label(label)], axis=-1
        )
        x = jax.nn.relu(self.enc_fc_in(x))
        cls = jnp.broadcast_to(self.cls_token, (B, 1, self.d_model))
        x = jnp.concatenate([cls, x], axis=1)
        kpm = jnp.concatenate(
            [jnp.zeros((B, 1), bool), padding_mask], axis=1
        )
        for layer in self.enc_layers:
            x = layer(x, kpm)
        return x[:, 0]

    def __call__(self, bbox, label, padding_mask):
        """Training heads (`fid/model.py:161-180`): disc logit + per-element
        reconstruction."""
        B, N, _ = bbox.shape
        feat = self.extract_features(bbox, label, padding_mask)
        logit_disc = self.fc_out_disc(feat)[..., 0]

        x = jnp.broadcast_to(feat[:, None, :], (B, N, self.d_model))
        t = jnp.broadcast_to(
            self.pos_token[:N, 0][None], (B, N, self.d_model)
        )
        x = jax.nn.relu(self.dec_fc_in(jnp.concatenate([x, t], axis=-1)))
        for layer in self.dec_layers:
            x = layer(x, padding_mask)
        logit_cls = self.fc_out_cls(x)
        bbox_pred = jax.nn.sigmoid(self.fc_out_bbox(x))
        return logit_disc, logit_cls, bbox_pred


def make_feature_extractor(model: FIDNetV3, params):
    """Jitted (bbox, label, mask) -> (B, 256) features; mask True = valid."""

    @jax.jit
    def extract(bbox, label, mask):
        return model.apply(
            {"params": params},
            bbox,
            label,
            ~mask,
            method=FIDNetV3.extract_features,
        )

    return extract


# ---------------------------------------------------------------------------
# torch checkpoint import (`fid/model.py:183-193` load path)
# ---------------------------------------------------------------------------


def load_torch_fidnet(path: str, num_labels: int, max_bbox: int = 50):
    """Port a reference `model_best.pth.tar` into flax params."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    g = lambda k: np.asarray(sd[k].detach().numpy())

    def dense(prefix):
        return {"kernel": g(f"{prefix}.weight").T, "bias": g(f"{prefix}.bias")}

    def block(tprefix):
        w_in = g(f"{tprefix}.self_attn.in_proj_weight")
        b_in = g(f"{tprefix}.self_attn.in_proj_bias")
        return {
            "qkv": {"kernel": w_in.T, "bias": b_in},
            "out": dense(f"{tprefix}.self_attn.out_proj"),
            "linear1": dense(f"{tprefix}.linear1"),
            "linear2": dense(f"{tprefix}.linear2"),
            "norm1": {
                "scale": g(f"{tprefix}.norm1.weight"),
                "bias": g(f"{tprefix}.norm1.bias"),
            },
            "norm2": {
                "scale": g(f"{tprefix}.norm2.weight"),
                "bias": g(f"{tprefix}.norm2.bias"),
            },
        }

    params = {
        "emb_label": {"embedding": g("emb_label.weight")},
        "fc_bbox": dense("fc_bbox"),
        "enc_fc_in": dense("enc_fc_in"),
        "cls_token": g("enc_transformer.token").transpose(1, 0, 2),
        "fc_out_disc": dense("fc_out_disc"),
        "pos_token": g("pos_token"),
        "dec_fc_in": dense("dec_fc_in"),
        "fc_out_cls": dense("fc_out_cls"),
        "fc_out_bbox": dense("fc_out_bbox"),
    }
    for i in range(4):
        params[f"enc{i}"] = block(f"enc_transformer.core.layers.{i}")
        params[f"dec{i}"] = block(f"dec_transformer.layers.{i}")
    model = FIDNetV3(num_labels=num_labels, max_bbox=max_bbox)
    return model, jax.tree.map(jnp.asarray, params)


def load_fidnet_v3(
    dataset_name: str, num_labels: int, weight_dir: str, max_bbox: int = 25
):
    """Resolve weights like the reference (`fid/model.py:183-193`):
    `{weight_dir}/{name}-max{S}/model_best.pth.tar` (torch) or `.msgpack`
    (ours)."""
    import os

    from flax import serialization

    prefix = f"{dataset_name}-max{max_bbox}"
    torch_path = os.path.join(weight_dir, prefix, "model_best.pth.tar")
    flax_path = os.path.join(weight_dir, prefix, "model_best.msgpack")
    model = FIDNetV3(num_labels=num_labels, max_bbox=max_bbox)
    if os.path.exists(flax_path):
        template = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, max_bbox, 4)),
            jnp.zeros((1, max_bbox), jnp.int32),
            jnp.zeros((1, max_bbox), bool),
        )["params"]
        with open(flax_path, "rb") as f:
            restored = serialization.from_bytes(template, f.read())
        # commit to device once — from_bytes yields host numpy, which
        # would re-upload per extract_features batch (checkpoint.py has
        # the same fix, with measured numbers)
        return model, jax.tree.map(jnp.asarray, restored)
    return load_torch_fidnet(torch_path, num_labels, max_bbox)


# ---------------------------------------------------------------------------
# legacy variants (`fid/model.py:44-120`) — kept for checkpoint
# compatibility; V3 is what the eval pipeline uses
# ---------------------------------------------------------------------------


class FIDNetV1(nn.Module):
    """`fid/model.py:44-65`: 32-d label emb + 32-d bbox fc CONCATENATED
    (label first, no fused projection), 4-layer d=64 CLS encoder."""

    num_labels: int
    d_model: int = 64
    nhead: int = 4
    num_layers: int = 4

    def setup(self):
        D = self.d_model
        self.emb_label = nn.Embed(self.num_labels, D // 2)
        self.fc_bbox = nn.Dense(D // 2)
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, D)
        )
        self.enc_layers = [
            PostNormBlock(D, self.nhead, D // 2, name=f"enc{i}")
            for i in range(self.num_layers)
        ]
        self.fc_out = nn.Dense(1)

    def extract_features(self, bbox, label, padding_mask):
        B = bbox.shape[0]
        x = jnp.concatenate(
            [self.emb_label(label), self.fc_bbox(bbox)], axis=-1
        )
        cls = jnp.broadcast_to(self.cls_token, (B, 1, self.d_model))
        x = jnp.concatenate([cls, x], axis=1)
        kpm = jnp.concatenate([jnp.zeros((B, 1), bool), padding_mask], axis=1)
        for layer in self.enc_layers:
            x = layer(x, kpm)
        return x[:, 0]

    def __call__(self, bbox, label, padding_mask):
        return self.fc_out(self.extract_features(bbox, label, padding_mask))[
            ..., 0
        ]


class FIDNetV2(nn.Module):
    """`fid/model.py:68-120`: 128+128 concat (label first), 8-layer d=256
    CLS encoder; reconstruction decoder prepends the feature to learned
    positional tokens."""

    num_labels: int
    d_model: int = 256
    nhead: int = 4
    num_layers: int = 8
    max_bbox: int = 50

    def setup(self):
        D = self.d_model
        self.emb_label = nn.Embed(self.num_labels, D // 2)
        self.fc_bbox = nn.Dense(D // 2)
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, D)
        )
        self.enc_layers = [
            PostNormBlock(D, self.nhead, D // 2, name=f"enc{i}")
            for i in range(self.num_layers)
        ]
        # fc_out Sequential: Linear-BN-ReLU-Linear-BN-ReLU-Linear
        self.fc_out_1 = nn.Dense(D // 2)
        self.bn_1 = nn.BatchNorm(use_running_average=True)
        self.fc_out_2 = nn.Dense(D // 4)
        self.bn_2 = nn.BatchNorm(use_running_average=True)
        self.fc_out_3 = nn.Dense(1)
        self.pos_token = self.param(
            "pos_token", nn.initializers.uniform(1.0), (self.max_bbox, 1, D)
        )
        self.dec_layers = [
            PostNormBlock(D, self.nhead, D // 2, name=f"dec{i}")
            for i in range(self.num_layers)
        ]
        self.fc_out_cls = nn.Dense(self.num_labels)
        self.fc_out_bbox = nn.Dense(4)

    def extract_features(self, bbox, label, padding_mask):
        B = bbox.shape[0]
        x = jnp.concatenate(
            [self.emb_label(label), self.fc_bbox(bbox)], axis=-1
        )
        cls = jnp.broadcast_to(self.cls_token, (B, 1, self.d_model))
        x = jnp.concatenate([cls, x], axis=1)
        kpm = jnp.concatenate([jnp.zeros((B, 1), bool), padding_mask], axis=1)
        for layer in self.enc_layers:
            x = layer(x, kpm)
        return x[:, 0]

    def __call__(self, bbox, label, padding_mask):
        B, N, _ = bbox.shape
        feat = self.extract_features(bbox, label, padding_mask)
        h = jax.nn.relu(self.bn_1(self.fc_out_1(feat)))
        h = jax.nn.relu(self.bn_2(self.fc_out_2(h)))
        logit = self.fc_out_3(h)[..., 0]

        t = jnp.broadcast_to(self.pos_token[:N, 0][None], (B, N, self.d_model))
        x = jnp.concatenate([feat[:, None, :], t], axis=1)
        kpm = jnp.concatenate([jnp.zeros((B, 1), bool), padding_mask], axis=1)
        for layer in self.dec_layers:
            x = layer(x, kpm)
        x = x[:, 1:]
        return logit, self.fc_out_cls(x), jax.nn.sigmoid(self.fc_out_bbox(x))


def load_torch_fidnet_v1(path: str, num_labels: int):
    """Port a torch FIDNet (V1) state dict into `FIDNetV1` params."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    g = lambda k: np.asarray(sd[k].detach().numpy())

    def dense(prefix):
        return {"kernel": g(f"{prefix}.weight").T, "bias": g(f"{prefix}.bias")}

    def block(tprefix):
        return {
            "qkv": {
                "kernel": g(f"{tprefix}.self_attn.in_proj_weight").T,
                "bias": g(f"{tprefix}.self_attn.in_proj_bias"),
            },
            "out": dense(f"{tprefix}.self_attn.out_proj"),
            "linear1": dense(f"{tprefix}.linear1"),
            "linear2": dense(f"{tprefix}.linear2"),
            "norm1": {
                "scale": g(f"{tprefix}.norm1.weight"),
                "bias": g(f"{tprefix}.norm1.bias"),
            },
            "norm2": {
                "scale": g(f"{tprefix}.norm2.weight"),
                "bias": g(f"{tprefix}.norm2.bias"),
            },
        }

    params = {
        "emb_label": {"embedding": g("emb_label.weight")},
        "fc_bbox": dense("fc_bbox"),
        "cls_token": g("transformer.token").transpose(1, 0, 2),
        "fc_out": dense("fc_out"),
    }
    for i in range(4):
        params[f"enc{i}"] = block(f"transformer.core.layers.{i}")
    model = FIDNetV1(num_labels=num_labels)
    return model, jax.tree.map(jnp.asarray, params)


def load_torch_fidnet_v2(path: str, num_labels: int, max_bbox: int = 50):
    """Port a torch FIDNetV2 state dict into `FIDNetV2` params."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    g = lambda k: np.asarray(sd[k].detach().numpy())

    def dense(prefix):
        return {"kernel": g(f"{prefix}.weight").T, "bias": g(f"{prefix}.bias")}

    def bn(prefix):
        return (
            {"scale": g(f"{prefix}.weight"), "bias": g(f"{prefix}.bias")},
            {
                "mean": g(f"{prefix}.running_mean"),
                "var": g(f"{prefix}.running_var"),
            },
        )

    def block(tprefix):
        return {
            "qkv": {
                "kernel": g(f"{tprefix}.self_attn.in_proj_weight").T,
                "bias": g(f"{tprefix}.self_attn.in_proj_bias"),
            },
            "out": dense(f"{tprefix}.self_attn.out_proj"),
            "linear1": dense(f"{tprefix}.linear1"),
            "linear2": dense(f"{tprefix}.linear2"),
            "norm1": {
                "scale": g(f"{tprefix}.norm1.weight"),
                "bias": g(f"{tprefix}.norm1.bias"),
            },
            "norm2": {
                "scale": g(f"{tprefix}.norm2.weight"),
                "bias": g(f"{tprefix}.norm2.bias"),
            },
        }

    bn1_p, bn1_s = bn("fc_out.1")
    bn2_p, bn2_s = bn("fc_out.4")
    params = {
        "emb_label": {"embedding": g("emb_label.weight")},
        "fc_bbox": dense("fc_bbox"),
        "cls_token": g("encoder.token").transpose(1, 0, 2),
        "fc_out_1": dense("fc_out.0"),
        "bn_1": bn1_p,
        "fc_out_2": dense("fc_out.3"),
        "bn_2": bn2_p,
        "fc_out_3": dense("fc_out.6"),
        "pos_token": g("token"),
        "fc_out_cls": dense("fc_out_cls"),
        "fc_out_bbox": dense("fc_out_bbox"),
    }
    for i in range(8):
        params[f"enc{i}"] = block(f"encoder.core.layers.{i}")
        params[f"dec{i}"] = block(f"decoder.layers.{i}")
    model = FIDNetV2(num_labels=num_labels, max_bbox=max_bbox)
    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": {
            "bn_1": jax.tree.map(jnp.asarray, bn1_s),
            "bn_2": jax.tree.map(jnp.asarray, bn2_s),
        },
    }
    return model, variables
