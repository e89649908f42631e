"""int8 serving engine: mirror-forward parity with the flax denoiser,
weight-quantization error bounds, calibrated int8 logits sanity, gating."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layoutdm_tpu.configs import BackboneConfig
from layoutdm_tpu.models.int8_serving import (
    calibrate_scales,
    can_use_int8,
    make_int8_predict_start,
    mirror_forward,
    quantize_weights,
)
from layoutdm_tpu.models.nn import CategoricalTransformer


def _small(seed=0, num_layers=2):
    bb = BackboneConfig(
        d_model=64, nhead=4, dim_feedforward=128, num_layers=num_layers,
        dropout=0.0, timestep_type="adalayernorm", diffusion_step=20,
    )
    V, S = 33, 15  # 3 elems x 5 attrs
    net = CategoricalTransformer(
        backbone=bb, num_classes=V, max_token_length=S, dtype=jnp.float32
    )
    seq = jnp.asarray(
        np.random.RandomState(seed).randint(0, V, (4, S)), jnp.int32
    )
    t = jnp.asarray([0, 5, 11, 19], jnp.int32)
    params = net.init(jax.random.PRNGKey(seed), seq, t)["params"]
    return bb, net, params, seq, t, V


def test_mirror_matches_flax_forward():
    bb, net, params, seq, t, V = _small()
    want = net.apply({"params": params}, seq, t, deterministic=True)
    got = mirror_forward(params, bb, V, seq, t, dtype=jnp.float32)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_mirror_matches_flax_forward_bf16():
    # the SERVING dtype: bf16 trunk with the f32 head (nn.py's head Dense
    # has no dtype override) — parity within bf16 rounding of the trunk
    bb, net, params, seq, t, V = _small()
    want = net.apply({"params": params}, seq, t, deterministic=True)
    got = mirror_forward(params, bb, V, seq, t, dtype=jnp.bfloat16)
    np.testing.assert_allclose(got, want, atol=0.15, rtol=0.05)
    assert (
        np.mean(np.argmax(got, -1) == np.argmax(np.asarray(want), -1)) > 0.98
    )


def test_quantize_weights_roundtrip():
    bb, net, params, seq, t, V = _small()
    wq = quantize_weights(params)
    w = params["backbone"]["layer0"]["linear1"]["kernel"]
    entry = wq["layer0/linear1"]
    deq = entry["w_q"].astype(jnp.float32) * entry["s_w"][None, :]
    # per-channel scale bounds the roundtrip error at half a step
    err = np.max(np.abs(np.asarray(deq - w)))
    assert err <= float(jnp.max(entry["s_w"])) * 0.51


def test_int8_logits_close_and_argmax_agrees():
    bb, net, params, seq, t, V = _small(seed=1)
    f32 = mirror_forward(params, bb, V, seq, t, dtype=jnp.float32)
    scales = calibrate_scales(params, bb, V, seq, t)
    assert set(scales) == {
        f"layer{i}/{s}" for i in range(2)
        for s in ("qkv", "out", "linear1", "linear2")
    }
    wq = quantize_weights(params)
    q = mirror_forward(
        params, bb, V, seq, t, wq=wq, act_scales=scales, dtype=jnp.float32
    )
    p32 = jax.nn.softmax(f32, -1)
    pq = jax.nn.softmax(q, -1)
    l1 = float(jnp.mean(jnp.sum(jnp.abs(p32 - pq), -1)))
    assert l1 < 0.25, l1
    agree = float(
        jnp.mean((jnp.argmax(f32, -1) == jnp.argmax(q, -1)).astype(jnp.float32))
    )
    assert agree > 0.9, agree


def test_predict_start_contract():
    """The int8 predict_start obeys the sampler head contract: log-probs
    clipped to [-70, 0], MASK lane pinned at -70."""
    from layoutdm_tpu.models.layoutdm import LayoutDM
    from layoutdm_tpu.tokenizer.bbox import BboxTokenizer
    from layoutdm_tpu.tokenizer.sequence import LayoutSequenceTokenizer

    bbt = BboxTokenizer(num_bins=4, shared_vocab="x-y-w-h", quantization="linear")
    tok = LayoutSequenceTokenizer(
        bbox_tokenizer=bbt, num_categories=3, max_elements=3,
        special_tokens=("pad", "mask"), pad_until_max=True,
    )
    # LayoutDM shrinks d_model by 29/32 (512 -> 464); 128 -> 116 stays
    # divisible by nhead=4
    backbone = BackboneConfig(
        d_model=128, nhead=4, dim_feedforward=256, num_layers=1,
        dropout=0.0, timestep_type="adalayernorm", diffusion_step=10,
    )
    from layoutdm_tpu.configs import ModelConfig

    model = LayoutDM(backbone, tok, ModelConfig(q_type="vanilla", num_timesteps=10))
    params = model.init(jax.random.PRNGKey(0))
    ps = make_int8_predict_start(model, params, calib_batch=8)
    ids = jnp.zeros((2, model.seq_len), jnp.int32)
    t = jnp.asarray([3, 7], jnp.int32)
    lp = ps(params, ids, t)
    assert lp.shape == (2, model.seq_len, model.num_classes)
    assert float(jnp.max(lp)) <= 0.0
    assert float(jnp.min(lp)) >= -70.0
    np.testing.assert_allclose(np.asarray(lp[..., -1]), -70.0)


def test_gate(monkeypatch):
    bb = BackboneConfig(timestep_type="adalayernorm")
    monkeypatch.delenv("LAYOUTDM_TPU_INT8", raising=False)
    assert not can_use_int8(bb)
    monkeypatch.setenv("LAYOUTDM_TPU_INT8", "1")
    assert can_use_int8(bb)
    assert not can_use_int8(BackboneConfig(timestep_type=None))
    assert not can_use_int8(BackboneConfig(timestep_type="adalayernorm_mlp"))
    assert not can_use_int8(bb, pos_emb="default")
    # causal configs must refuse: mirror_forward has no attn-mask support
    assert not can_use_int8(bb, lookahead=False)


def test_causal_net_refused():
    """make_int8_predict_start guards on the model's REAL attention mode:
    mirror_forward has no mask support, so a causal net must fail loudly."""
    from layoutdm_tpu.models.autoreg import ElemWiseAutoreg
    from layoutdm_tpu.models.int8_serving import make_int8_predict_start
    from tests.test_tokenizer import make_tokenizer

    t = make_tokenizer(
        shared_vocab="x-y-w-h", num_categories=4, max_elements=4,
        special=("pad", "bos", "mask"),
    )
    model = ElemWiseAutoreg(
        BackboneConfig(
            d_model=64, nhead=4, dim_feedforward=64, num_layers=1
        ),
        t,
    )
    with pytest.raises(ValueError, match="causal"):
        make_int8_predict_start(model, model.init(jax.random.PRNGKey(0)))
