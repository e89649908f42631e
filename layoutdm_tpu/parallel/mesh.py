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
