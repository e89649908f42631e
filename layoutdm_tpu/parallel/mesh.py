"""Device mesh + sharding helpers — the framework's data-parallel substrate.

The reference's only parallelism was a documented-broken ``nn.DataParallel``
(`README.md:49`, SURVEY.md §2.2).  Here data-parallelism is first-class and
correct by construction: a 1-D ``("data",)`` mesh over ICI, batches sharded
on the data axis, parameters/optimizer state replicated, and the gradient
all-reduce inserted by GSPMD from the sharding annotations — no hand-written
collectives, no mutable buffers to race on.

A second ("model") axis is declared for future tensor parallelism; at the
reference's ~12M-param scale it stays size 1 (SURVEY.md §2.2 TP row).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: int = 0, model_parallel: int = 1, devices=None
) -> Mesh:
    """1- or 2-D mesh: ("data",) or ("data", "model")."""
    devices = devices if devices is not None else jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    n = len(devices)
    assert n % model_parallel == 0
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def make_multislice_mesh(
    num_slices: int,
    devices=None,
    axis_names: tuple = ("dcn", "data"),
) -> Mesh:
    """Multi-slice mesh: outer "dcn" axis across slices, inner "data" axis
    over each slice's ICI.

    Device order matters: slow DCN collectives must ride the OUTER mesh
    axis, so devices are grouped by slice (via ``device.slice_index`` when
    the runtime exposes multi-slice topology, else by equal split order).
    Batch sharding over BOTH axes — ``P(("dcn", "data"))`` — keeps the
    per-step gradient all-reduce hierarchical: XLA reduces within each
    slice over ICI first, then once across slices over DCN.

    Hardware validation is deferred (single-chip environment, SURVEY §2.2);
    the layout is exercised on virtual devices in `tests/test_train.py`.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % num_slices == 0, f"{n} devices not divisible by {num_slices}"
    per_slice = n // num_slices
    if hasattr(devices[0], "slice_index") and getattr(
        devices[0], "slice_index", None
    ) is not None:
        devices = sorted(devices, key=lambda d: (d.slice_index, d.id))
    arr = np.asarray(devices).reshape(num_slices, per_slice)
    return Mesh(arr, axis_names)


def hierarchical_batch_spec(mesh: Mesh) -> P:
    """Batch PartitionSpec across every mesh axis (dcn outermost)."""
    return P(tuple(mesh.axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis split across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of host arrays with the batch axis on the data mesh."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
