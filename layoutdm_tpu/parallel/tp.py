"""Tensor parallelism over the mesh's "model" axis (Megatron FFN pattern).

The reference has no tensor parallelism (SURVEY.md §2.2: ~12M params, a
single GPU mandated), and at this scale TP buys nothing — the "model" axis
in `parallel.mesh.make_mesh` stays size 1 in production.  This module makes
the declared axis REAL so the framework scales past data parallelism when
backbones grow: Megatron-style column/row sharding of the FFN expansion
(`linear1`/`linear2`, 2/3 of the transformer FLOPs), expressed as GSPMD
parameter shardings so XLA derives the activation shardings and inserts the
partial-sum all-reduce on the `linear2` output.

The attention projections stay replicated by design: the packed-qkv kernel
keeps the torch MHA layout `(D, 3D)` for checkpoint-port parity
(`utils/torch_port.py`), and a flat column split of that axis crosses the
q/k/v block boundaries unless the model-parallel degree is a multiple of 3
— XLA would silently reshard every step.  With 8 heads of dim 58 the
attention GEMMs are far too small to pay for that; the FFN is where TP
earns its collectives.

Optimizer state shards with the parameters: AdamW's first/second moments
(`optax.ScaleByAdamState`) mirror the param tree, so each moment leaf gets
its parameter's sharding — TP therefore also divides optimizer memory,
which is the usual reason to turn it on.
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from layoutdm_tpu.train.step import TrainState, train_step_fn

# leaf-name -> PartitionSpec over ("model",): column-parallel linear1
# (hidden dim split, bias split with it), row-parallel linear2 (input dim
# split, bias replicated — it is added after the partial-sum reduce)
_FFN_RULES = {
    ("linear1", "kernel"): P(None, "model"),
    ("linear1", "bias"): P("model"),
    ("linear2", "kernel"): P("model", None),
}


def tp_param_specs(params) -> Any:
    """Params-shaped pytree of PartitionSpecs implementing FFN tensor
    parallelism; everything not matched by a rule is replicated."""

    def decide(path, leaf):
        names = tuple(getattr(k, "key", str(k)) for k in path)
        return _FFN_RULES.get(names[-2:], P())

    return jax.tree_util.tree_map_with_path(decide, params)


def _assert_divisible(params, specs, n_model: int) -> None:
    def check(path, leaf, spec):
        for dim, axis in enumerate(spec):
            if axis == "model" and leaf.shape[dim] % n_model:
                names = "/".join(getattr(k, "key", str(k)) for k in path)
                raise ValueError(
                    f"TP degree {n_model} does not divide dim {dim} of "
                    f"{names} (shape {leaf.shape})"
                )

    jax.tree_util.tree_map_with_path(check, params, specs)


def state_shardings(state: TrainState, mesh: Mesh):
    """TrainState-shaped pytree of NamedShardings: params + Adam moments
    TP-sharded, everything else replicated."""
    n_model = mesh.shape.get("model", 1)
    specs = tp_param_specs(state.params)
    _assert_divisible(state.params, specs, n_model)
    repl = NamedSharding(mesh, P())
    p_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)

    def opt_sh(s):
        if isinstance(s, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(count=repl, mu=p_sh, nu=p_sh)
        return repl

    opt = jax.tree.map(
        opt_sh,
        state.opt_state,
        is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState),
    )
    return TrainState(
        params=p_sh,
        opt_state=opt,
        lt_state=jax.tree.map(lambda _: repl, state.lt_state),
        step=repl,
    )


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a host/replicated TrainState onto the mesh per
    `state_shardings` (params split on "model", batch-independent)."""
    sh = state_shardings(state, mesh)
    return jax.tree.map(jax.device_put, state, sh)


def make_train_step_tp(model, optimizer, mesh: Mesh, state: TrainState):
    """Jitted train step with 2-D (data x model) parallelism: batch sharded
    over "data", FFN weights + Adam moments sharded over "model".  The
    returned step preserves the TP shardings across updates (explicit
    out_shardings, donated input).  `state` is only read for its pytree
    structure."""
    sh = state_shardings(state, mesh)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        train_step_fn(model, optimizer),
        in_shardings=(sh, repl, data),
        out_shardings=(sh, repl),
        donate_argnums=(0,),
    )
