"""The compiled train step: pure function, data-parallel over the mesh.

Replaces the reference's epoch loop body (`main.py:221-243`) and its AdamW
decay/no-decay grouping (`base_model.py:54-106`).  The step is
``(state, rng, batch) -> (state, metrics)``, jitted once with GSPMD
shardings: batch split on the "data" axis, params/opt/Lt-state replicated;
XLA inserts the gradient all-reduce.  The importance-sampling buffers ride
in the state, fixing the mutation-under-replication bug class that broke the
reference's multi-GPU path (SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from layoutdm_tpu.models.diffusion.loss import LtState


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    lt_state: LtState
    step: jnp.ndarray


NO_DECAY_SUBSTRINGS = (
    "bias",
    "pos_emb",
    "elem_emb",
    "attr_emb",
    "bos_emb",
    "embedding",  # nn.Embed tables (token emb, AdaNorm timestep emb)
)
NO_DECAY_MODULES = ("norm1", "norm2", "head_norm", "LayerNorm")


def decay_mask(params) -> Any:
    """True where weight decay applies — Linear/attention kernels only,
    mirroring the whitelist/blacklist of `base_model.py:54-106`."""

    def decide(path: Tuple, _) -> bool:
        names = [getattr(k, "key", str(k)) for k in path]
        full = "/".join(names)
        if any(s in full for s in NO_DECAY_SUBSTRINGS):
            return False
        if any(m in names for m in NO_DECAY_MODULES):
            return False
        # LayerNorm scale
        if names[-1] == "scale":
            return False
        return names[-1] == "kernel"

    return jax.tree_util.tree_map_with_path(decide, params)


def make_optimizer(
    lr: float = 5e-4,
    weight_decay: float = 0.1,
    betas: Tuple[float, float] = (0.9, 0.999),
    grad_norm_clip: float = 1.0,
) -> optax.GradientTransformation:
    """AdamW with grouped decay + global-norm clipping, lr injected as a
    mutable hyperparam so host-side plateau schedules can drive it (the
    reference steps its scheduler per epoch, `main.py:112-118`)."""

    @optax.inject_hyperparams
    def _opt(learning_rate):
        return optax.chain(
            optax.clip_by_global_norm(grad_norm_clip),
            optax.adamw(
                learning_rate,
                b1=betas[0],
                b2=betas[1],
                weight_decay=weight_decay,
                mask=decay_mask,
            ),
        )

    return _opt(lr)


def init_train_state(model, optimizer, rng) -> TrainState:
    params = model.init(rng)
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        lt_state=model.init_state(),
        step=jnp.zeros((), jnp.int32),
    )


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Host-side LR override (plateau / cosine schedules)."""
    opt_state = state.opt_state
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    opt_state = opt_state._replace(hyperparams=hp)
    return state._replace(opt_state=opt_state)


def train_step_fn(model, optimizer):
    """The pure (state, rng, tokens) -> (state, metrics) step function,
    shared by the jit wrappers (`make_train_step`, `parallel.tp`)."""

    def step_fn(state: TrainState, rng: jax.Array, tokens):
        def loss_fn(params):
            losses, new_lt = model.loss(
                params, rng, tokens, state.lt_state, is_train=True
            )
            total = sum(losses.values())
            return total, (losses, new_lt)

        (total, (losses, new_lt)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": total, **losses}
        new_state = TrainState(
            params=new_params,
            opt_state=new_opt,
            lt_state=new_lt,
            step=state.step + 1,
        )
        return new_state, metrics

    return step_fn


def make_train_step(model, optimizer, mesh: Optional[Mesh] = None):
    """Build the jitted train step.  With a mesh, batch is data-sharded and
    everything else replicated; single-device otherwise."""
    step_fn = train_step_fn(model, optimizer)
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(repl, repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_train_step_shardmap(model, optimizer, mesh: Mesh):
    """Explicit-collective variant of the train step.

    Same contract as `make_train_step`, but instead of GSPMD propagation the
    parallelism is spelled out with `jax.shard_map`: each device computes
    loss/grads on its batch shard and the gradients, losses, and
    importance-state updates are combined with explicit `psum`/`pmean` over
    the "data" axis (the ICI all-reduce the reference never had).

    Equality with the GSPMD step: on a 1-device data axis the two steps are
    the same full-batch computation once the per-shard rng fold below is
    compensated, and tests assert identical updates
    (`test_shardmap_step_equals_gspmd_on_one_shard`).  On N>1 shards the
    LOSSES differ by construction — this path folds the device index into
    the rng so each shard draws independent (B/N,...)-shaped corruption and
    dropout noise, while the GSPMD step draws one (B,...)-shaped batch of
    noise from the unfolded key — so the multi-shard cross-check instead
    pins this step to a host-side simulation of the exact collective layout
    (`test_shardmap_step_equals_host_simulation`).
    """
    from jax.sharding import PartitionSpec as P

    def device_fn(state: TrainState, rng: jax.Array, tokens):
        # identical rng on every shard (replicated) would correlate the
        # corruption noise across shards; fold in the device index
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

        def loss_fn(params):
            losses, new_lt = model.loss(
                params, rng, tokens, state.lt_state, is_train=True
            )
            return sum(losses.values()), (losses, new_lt)

        (total, (losses, new_lt)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        # all-reduce over ICI: mean grads/metrics, sum importance counts
        grads = jax.lax.pmean(grads, "data")
        losses = jax.lax.pmean(losses, "data")
        total = jax.lax.pmean(total, "data")
        lt = LtState(
            history=jax.lax.pmean(new_lt.history, "data"),
            count=state.lt_state.count
            + jax.lax.psum(new_lt.count - state.lt_state.count, "data"),
        )
        updates, new_opt = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params, opt_state=new_opt, lt_state=lt,
            step=state.step + 1,
        )
        return new_state, {"loss": total, **losses}

    mapped = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P(), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


def make_eval_step(model, mesh: Optional[Mesh] = None):
    """Validation loss (no dropout rng, no aux loss) — `main.py:271-294`."""

    def eval_fn(params, lt_state, rng, tokens):
        losses, _ = model.loss(params, rng, tokens, lt_state, is_train=False)
        return sum(losses.values())

    if mesh is None:
        return jax.jit(eval_fn)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        eval_fn, in_shardings=(repl, repl, repl, data), out_shardings=repl
    )
