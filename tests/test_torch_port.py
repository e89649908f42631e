"""Denoiser parity: a torch twin with the reference's exact wiring
(`transformer_utils.py:34-246`, `nn_lib.py:91-237`) must produce the same
logits as our flax CategoricalTransformer after weight import."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from layoutdm_tpu.configs import BackboneConfig
from layoutdm_tpu.models.nn import CategoricalTransformer
from layoutdm_tpu.utils.torch_port import convert_categorical_transformer

D, H, FF, L, T_STEPS = 64, 4, 128, 2, 8
V, S = 30, 20


class TorchSinusoidal(nn.Module):
    def __init__(self, num_steps, dim, rescale=4000):
        super().__init__()
        self.num_steps, self.dim, self.rescale = float(num_steps), dim, rescale

    def forward(self, x):
        x = x / self.num_steps * self.rescale
        half = self.dim // 2
        emb = math.log(10000) / (half - 1)
        emb = torch.exp(torch.arange(half) * -emb)
        emb = x[:, None] * emb[None, :]
        return torch.cat((emb.sin(), emb.cos()), dim=-1)


class TorchAdaLN(nn.Module):
    def __init__(self, d, max_t, emb_type="adalayernorm"):
        super().__init__()
        if "abs" in emb_type:
            self.emb = TorchSinusoidal(max_t, d)
        else:
            self.emb = nn.Embedding(max_t, d)
        self.silu = nn.SiLU()
        self.linear = nn.Linear(d, d * 2)
        self.layernorm = nn.LayerNorm(d, elementwise_affine=False)

    def forward(self, x, t):
        emb = self.linear(self.silu(self.emb(t))).unsqueeze(1)
        scale, shift = torch.chunk(emb, 2, dim=2)
        return self.layernorm(x) * (1 + scale) + shift


class TorchBlock(nn.Module):
    """Pre-norm block with the reference's trunk-replacing norm1
    (`transformer_utils.py:165-188`)."""

    def __init__(self, emb_type):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(D, H, batch_first=True)
        self.linear1, self.linear2 = nn.Linear(D, FF), nn.Linear(FF, D)
        self.norm1 = TorchAdaLN(D, T_STEPS, emb_type)
        self.norm2 = nn.LayerNorm(D)

    def forward(self, x, t):
        x = self.norm1(x, t)
        x = x + self.self_attn(x, x, x, need_weights=False)[0]
        return x + self.linear2(F.relu(self.linear1(self.norm2(x))))


class TorchDenoiser(nn.Module):
    def __init__(self, emb_type="adalayernorm", pos="elem_attr"):
        super().__init__()
        self.cat_emb = nn.Embedding(V, D)

        class Pos(nn.Module):
            def __init__(self):
                super().__init__()
                self.elem_emb = nn.Parameter(torch.rand(S // 5, D))
                self.attr_emb = nn.Parameter(torch.rand(5, D))

        class PosDefault(nn.Module):
            def __init__(self):
                super().__init__()
                self.pos_emb = nn.Parameter(torch.rand(S, D))

        self.pos_emb = Pos() if pos == "elem_attr" else PosDefault()
        self.pos_kind = pos

        class Backbone(nn.Module):
            def __init__(self):
                super().__init__()
                self.layers = nn.ModuleList(
                    [TorchBlock(emb_type) for _ in range(L)]
                )

        self.backbone = Backbone()
        self.head = nn.Sequential(
            nn.LayerNorm(D), nn.Linear(D, V, bias=False)
        )

    @torch.no_grad()
    def forward(self, seq, t):
        h = self.cat_emb(seq)
        if self.pos_kind == "elem_attr":
            emb = self.pos_emb.elem_emb.repeat_interleave(5, dim=0)
            emb = emb + self.pos_emb.attr_emb.repeat(S // 5, 1)
        else:
            emb = self.pos_emb.pos_emb
        h = h + emb[None, :S]
        for blk in self.backbone.layers:
            h = blk(h, t)
        return self.head(h)


def _run_parity(emb_type, pos):
    torch.manual_seed(0)
    twin = TorchDenoiser(emb_type, pos).eval()
    sd = {f"transformer.{k}": v for k, v in twin.state_dict().items()}

    params = convert_categorical_transformer(
        sd, num_layers=L, timestep_type=emb_type
    )
    cfg = BackboneConfig(
        d_model=D, nhead=H, dim_feedforward=FF, num_layers=L, dropout=0.0,
        timestep_type=emb_type, diffusion_step=T_STEPS,
    )
    net = CategoricalTransformer(
        backbone=cfg, num_classes=V, max_token_length=S, pos_emb=pos,
        n_attr_per_elem=5,
    )

    rng = np.random.RandomState(0)
    seq = rng.randint(0, V, (3, S))
    t = rng.randint(0, T_STEPS, (3,))
    want = twin(torch.tensor(seq), torch.tensor(t)).numpy()
    got = np.asarray(
        net.apply(
            {"params": params}, jnp.asarray(seq), jnp.asarray(t),
            deterministic=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_parity_adalayernorm_elem_attr():
    _run_parity("adalayernorm", "elem_attr")


def test_parity_adalayernorm_abs_default_pos():
    _run_parity("adalayernorm_abs", "default")


def test_import_layoutdm_checkpoint(tmp_path):
    """Full reference-format .pt (DataParallel prefixes + Lt buffers) loads
    into a working LayoutDM."""
    from layoutdm_tpu.configs import BackboneConfig, ModelConfig
    from layoutdm_tpu.models.layoutdm import LayoutDM
    from layoutdm_tpu.utils.torch_port import import_layoutdm_checkpoint
    from tests.test_tokenizer import make_tokenizer

    tok = make_tokenizer(
        shared_vocab="x-y-w-h", num_categories=4, max_elements=4
    )
    torch.manual_seed(0)
    twin = TorchDenoiser("adalayernorm", "elem_attr")
    # patch the twin dims to the tiny tokenizer's shapes via a fresh module
    global V, S
    sd = {}
    for k, v in twin.state_dict().items():
        sd[f"model.module.transformer.{k}"] = v
    sd["model.module.Lt_history"] = torch.arange(T_STEPS, dtype=torch.float32)
    sd["model.module.Lt_count"] = torch.full((T_STEPS,), 11.0)
    path = tmp_path / "best_model.pt"
    torch.save(sd, path)

    params, lt = import_layoutdm_checkpoint(
        str(path), num_layers=L, timestep_type="adalayernorm"
    )
    np.testing.assert_array_equal(np.asarray(lt.history), np.arange(T_STEPS))
    assert (np.asarray(lt.count) == 11).all()
    # params tree has the expected top-level modules
    for k in ("cat_emb", "pos", "backbone", "head_norm", "head"):
        assert k in params
