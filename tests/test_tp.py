"""Tensor parallelism (parallel/tp.py) on the virtual 8-device CPU mesh:
the 2-D (data x model) train step matches the single-device step, FFN
weights and Adam moments are genuinely distributed, and the TP-sharded
params drive the sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from layoutdm_tpu.configs import SamplingConfig
from layoutdm_tpu.models.diffusion.sampler import SamplerCond, sample_chain
from layoutdm_tpu.parallel.mesh import make_mesh
from layoutdm_tpu.parallel.tp import (
    make_train_step_tp,
    shard_train_state,
    tp_param_specs,
)
from layoutdm_tpu.train.step import (
    init_train_state,
    make_optimizer,
    make_train_step,
)
from tests.test_model import tiny_model


def _tokens(model, seed=0, B=16):
    rng = np.random.RandomState(seed)
    S = model.tokenizer.max_elements
    n = rng.randint(1, S + 1, size=(B,))
    mask = np.arange(S)[None, :] < n[:, None]
    batch = {
        "label": rng.randint(0, model.tokenizer.N_category, mask.shape)
        * mask,
        "bbox": rng.rand(*mask.shape, 4).astype(np.float32),
        "mask": mask,
    }
    return model.preprocess(
        {k: jnp.asarray(v) for k, v in batch.items()},
        rng=jax.random.PRNGKey(3),
    )["seq"]


def test_tp_specs_cover_ffn():
    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    specs = tp_param_specs(params)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    col = [p for p, s in flat if s == P(None, "model")]
    row = [p for p, s in flat if s == P("model", None)]
    # one column-split linear1 and one row-split linear2 per layer
    assert len(col) == model.net.backbone.num_layers == len(row)


def test_tp_train_step_matches_single_device():
    model = tiny_model()
    optimizer = make_optimizer(lr=1e-3)
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}

    state0 = init_train_state(model, optimizer, jax.random.PRNGKey(0))
    tokens = _tokens(model)

    # single-device reference trajectory (2 steps)
    ref_step = make_train_step(model, optimizer)
    ref_state = state0
    ref_metrics = []
    for i in range(2):
        ref_state, m = ref_step(ref_state, jax.random.PRNGKey(10 + i),
                                tokens)
        ref_metrics.append({k: float(v) for k, v in m.items()})

    # TP x DP trajectory on the same data/rng
    state = init_train_state(model, optimizer, jax.random.PRNGKey(0))
    tp_step = make_train_step_tp(model, optimizer, mesh, state)
    with mesh:
        state = shard_train_state(state, mesh)
        data = NamedSharding(mesh, P("data"))
        tok_sh = jax.device_put(tokens, data)
        for i in range(2):
            state, m = tp_step(state, jax.random.PRNGKey(10 + i), tok_sh)
        jax.block_until_ready(m)

    for k, v in ref_metrics[-1].items():
        np.testing.assert_allclose(float(m[k]), v, rtol=2e-5, atol=1e-5,
                                   err_msg=k)

    # FFN weights stay distributed across the model axis after updates:
    # replicated over data (4), halved over model (2)
    l1 = state.params["backbone"]["layer0"]["linear1"]["kernel"]
    assert len(l1.sharding.device_set) == 8
    assert l1.addressable_shards[0].data.shape == (
        l1.shape[0], l1.shape[1] // 2
    )
    # Adam moments shard with their parameters
    import optax

    adam = [
        s
        for s in jax.tree.leaves(
            state.opt_state,
            is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState),
        )
        if isinstance(s, optax.ScaleByAdamState)
    ]
    mu_l1 = adam[0].mu["backbone"]["layer0"]["linear1"]["kernel"]
    assert mu_l1.addressable_shards[0].data.shape[1] == l1.shape[1] // 2

    # params trajectory matches the single-device one
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        jax.device_get(state.params), jax.device_get(ref_state.params),
    )
    # f32 reduction-order noise passes through Adam's m/(sqrt(v)+eps)
    # normalization, so per-weight drift is larger than the loss drift
    assert max(jax.tree.leaves(diffs)) < 3e-4


def test_tp_sharded_params_drive_sampler():
    model = tiny_model()
    optimizer = make_optimizer()
    mesh = make_mesh(8, model_parallel=2)
    state = init_train_state(model, optimizer, jax.random.PRNGKey(0))
    with mesh:
        state = shard_train_state(state, mesh)
        B = 8
        cond = SamplerCond.empty(B, model.seq_len, model.num_classes)
        data = NamedSharding(mesh, P("data"))
        cond = jax.tree.map(lambda x: jax.device_put(x, data), cond)
        ids = jax.jit(
            lambda p, r, c: sample_chain(
                p, model._predict_start, model.q, r, c,
                SamplingConfig(name="random"),
                pad_id=model.tokenizer.name_to_id("pad"),
                num_timesteps_eval=4,
            ),
            out_shardings=data,
        )(state.params, jax.random.PRNGKey(1), cond)
        ids.block_until_ready()
    assert ids.shape == (B, model.seq_len)
    assert int(ids.min()) >= 0 and int(ids.max()) < model.num_classes


def test_tp_degree_must_divide():
    model = tiny_model()
    optimizer = make_optimizer()
    state = init_train_state(model, optimizer, jax.random.PRNGKey(0))
    # dim_feedforward 116 is not divisible by 8
    mesh = make_mesh(8, model_parallel=8)
    with pytest.raises(ValueError, match="does not divide"):
        shard_train_state(state, mesh)
