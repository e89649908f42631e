"""Integration: data-parallel train step over the virtual 8-device CPU mesh,
loss decreases on synthetic data, checkpoint round-trips, dryrun entry."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from layoutdm_tpu.data.datasets import load_dataset
from layoutdm_tpu.data.loader import batch_iterator
from layoutdm_tpu.data.transforms import compose_transform
from layoutdm_tpu.parallel.mesh import make_mesh
from layoutdm_tpu.train.step import (
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    set_learning_rate,
)
from tests.test_model import tiny_model


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


def test_train_step_dp_loss_decreases():
    model = tiny_model()
    optimizer = make_optimizer(lr=2e-3)
    state = init_train_state(model, optimizer, jax.random.PRNGKey(0))
    mesh = make_mesh()
    step = make_train_step(model, optimizer, mesh)

    data = load_dataset("synthetic", "", "train", max_seq_length=4,
                        synthetic_size=256)
    transform = compose_transform(["RandomOrder"])
    rng_np = np.random.RandomState(0)
    rng = jax.random.PRNGKey(1)

    losses = []
    with mesh:
        for epoch in range(4):
            for batch in batch_iterator(data, 32, rng_np, transform):
                rng, r1, r2 = jax.random.split(rng, 3)
                tokens = model.preprocess(batch, r1)
                state, metrics = step(state, r2, tokens["seq"])
                losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # training signal: last-quarter mean well below first-quarter mean
    k = len(losses) // 4
    assert np.mean(losses[-k:]) < 0.8 * np.mean(losses[:k])
    # importance-sampling state accumulated across shards
    assert float(state.lt_state.count.sum()) > 0


def test_set_learning_rate():
    model = tiny_model()
    optimizer = make_optimizer(lr=1e-3)
    state = init_train_state(model, optimizer, jax.random.PRNGKey(0))
    state = set_learning_rate(state, 5e-4)
    assert np.isclose(
        float(state.opt_state.hyperparams["learning_rate"]), 5e-4
    )


def test_checkpoint_roundtrip(tmp_path):
    from layoutdm_tpu.train import checkpoint as ckpt

    model = tiny_model()
    optimizer = make_optimizer()
    state = init_train_state(model, optimizer, jax.random.PRNGKey(0))
    ckpt.save_params(state.params, str(tmp_path), "best")
    zeros = jax.tree.map(jnp.zeros_like, state.params)
    loaded = ckpt.load_params(zeros, str(tmp_path), "best")
    chex_ok = jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b), state.params, loaded
    )
    # full state round-trip
    ckpt.save_train_state(state, str(tmp_path))
    loaded_state = ckpt.load_train_state(state, str(tmp_path))
    np.testing.assert_allclose(
        np.asarray(loaded_state.lt_state.history),
        np.asarray(state.lt_state.history),
    )


def test_checkpoint_write_is_atomic(tmp_path, monkeypatch):
    """A kill mid-save must never corrupt the previous checkpoint: saves go
    through temp + os.replace, so the pre-crash state file stays readable
    (a truncated msgpack at last_state.msgpack makes resume impossible)."""
    from layoutdm_tpu.train import checkpoint as ckpt

    model = tiny_model()
    optimizer = make_optimizer()
    state = init_train_state(model, optimizer, jax.random.PRNGKey(0))
    path = ckpt.save_train_state(state, str(tmp_path))

    # simulate a kill partway through the NEXT save's write()
    real_open = open

    class _Killed(RuntimeError):
        pass

    def dying_open(p, mode="r", *a, **k):
        f = real_open(p, mode, *a, **k)
        if str(p).endswith(".tmp") and "w" in mode:
            real_write = f.write

            def write(data):
                real_write(data[: len(data) // 2])
                raise _Killed()

            f.write = write
        return f

    import builtins

    monkeypatch.setattr(builtins, "open", dying_open)
    with pytest.raises(_Killed):
        ckpt.save_train_state(state, str(tmp_path))
    monkeypatch.undo()

    # the original file is intact and still loads
    loaded = ckpt.load_train_state(state, str(tmp_path))
    np.testing.assert_allclose(
        np.asarray(loaded.step), np.asarray(state.step)
    )
    assert os.path.getsize(path) > 0


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as ge

    # use the tiny model path rather than the flagship (CPU test budget):
    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    seq = jnp.zeros((2, model.seq_len), jnp.int32)
    t = jnp.zeros((2,), jnp.int32)
    out = jax.jit(model._apply_net)(params, seq, t)
    assert out.shape == (2, model.seq_len, model.num_classes)


def test_sampling_shards_over_data_mesh():
    """The compiled sampler is GSPMD-shardable: batch-sharded conds keep
    the whole reverse chain distributed over the data axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from layoutdm_tpu.models.diffusion.sampler import SamplerCond

    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh()
    B = 16
    cond = SamplerCond.empty(B, model.seq_len, model.num_classes)
    sharded_cond = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), cond
    )
    with mesh:
        ids = model.sample_ids(
            params, jax.random.PRNGKey(1), B, cond=sharded_cond
        )
    assert ids.shape == (B, model.seq_len)
    # output stays distributed across the 8 devices
    assert len(ids.sharding.device_set) == 8


def test_shardmap_step_runs_and_trains():
    """Explicit-collective (shard_map + psum) train step decreases loss."""
    from layoutdm_tpu.train.step import make_train_step_shardmap

    model = tiny_model()
    optimizer = make_optimizer(lr=2e-3)
    state = init_train_state(model, optimizer, jax.random.PRNGKey(0))
    mesh = make_mesh()
    step = make_train_step_shardmap(model, optimizer, mesh)

    data = load_dataset("synthetic", "", "train", max_seq_length=4,
                        synthetic_size=128)
    rng = jax.random.PRNGKey(1)
    rng_np = np.random.RandomState(0)
    losses = []
    with mesh:
        for epoch in range(4):
            for batch in batch_iterator(data, 32, rng_np):
                rng, r1, r2 = jax.random.split(rng, 3)
                tokens = model.preprocess(batch, r1)
                state, metrics = step(state, r2, tokens)
                losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    k = len(losses) // 4
    assert np.mean(losses[-k:]) < np.mean(losses[:k])
    assert float(state.lt_state.count.sum()) == 32 * len(losses)


def test_two_axis_mesh_train_step():
    """(data, model) 2-D mesh: the GSPMD step runs with a nontrivial model
    axis declared (size 2), params replicated across both axes."""
    model = tiny_model()
    optimizer = make_optimizer(lr=1e-3)
    state = init_train_state(model, optimizer, jax.random.PRNGKey(0))
    mesh = make_mesh(model_parallel=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    step = make_train_step(model, optimizer, mesh)
    data = load_dataset("synthetic", "", "train", max_seq_length=4,
                        synthetic_size=64)
    rng = jax.random.PRNGKey(1)
    with mesh:
        for batch in batch_iterator(data, 16, np.random.RandomState(0)):
            rng, r1, r2 = jax.random.split(rng, 3)
            tokens = model.preprocess(batch, r1)
            state, metrics = step(state, r2, tokens)
            break
    assert np.isfinite(float(metrics["loss"]))


def test_multislice_dcn_mesh_train_step():
    """("dcn", "data") two-axis layout: flagship-config train step with the
    batch sharded over BOTH axes on 2 virtual slices x 4 devices."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from layoutdm_tpu.parallel.mesh import (
        hierarchical_batch_spec,
        make_multislice_mesh,
    )
    from layoutdm_tpu.train.step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from tests.test_model import tiny_model

    model = tiny_model()
    mesh = make_multislice_mesh(num_slices=2)
    assert mesh.axis_names == ("dcn", "data")
    assert mesh.shape["dcn"] == 2 and mesh.shape["data"] == 4

    optimizer = make_optimizer(lr=1e-3)
    state = init_train_state(model, optimizer, jax.random.PRNGKey(0))

    # GSPMD step with the batch split over (dcn, data) jointly
    def step_fn(state, rng, tokens):
        return make_train_step(model, optimizer, None)(state, rng, tokens)

    repl = NamedSharding(mesh, P())
    bspec = NamedSharding(mesh, hierarchical_batch_spec(mesh))
    step = jax.jit(
        lambda s, r, t: step_fn(s, r, t),
        in_shardings=(repl, repl, bspec),
        out_shardings=(repl, repl),
    )
    B = 16
    seq = jnp.tile(
        jnp.arange(model.seq_len, dtype=jnp.int32) % model.tokenizer.N_category,
        (B, 1),
    )
    with mesh:
        state, metrics = step(state, jax.random.PRNGKey(1), seq)
    assert jnp.isfinite(metrics["loss"])
