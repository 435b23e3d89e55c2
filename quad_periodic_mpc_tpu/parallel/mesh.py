"""Mesh construction and batch sharding.

The reference's "distribution" is a ROS pub/sub process graph on one
machine (SURVEY.md section 2.4); the TPU rebuild's scaling axis is the MPC
instance batch (gait x phase x disturbance hypothesis x terrain scenario),
sharded over a device mesh:

- ``data`` axis: instance blocks over chips (ICI within a slice, DCN
  across hosts via jax.distributed).
- reductions (scenario argmin, sweep metrics) ride XLA collectives
  inserted by sharding propagation — no hand-written NCCL/MPI analog.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data mesh over the first n devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for instance batches."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    """Place a pytree with leading batch axes onto the mesh (axis 0 sharded).

    Scalars / rank-0 leaves are replicated.
    """
    s_batch = batch_sharding(mesh)
    s_repl = replicated(mesh)

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim == 0 or x.shape[0] % mesh.size != 0:
            return jax.device_put(x, s_repl)
        return jax.device_put(x, s_batch)

    return jax.tree.map(place, tree)


def round_up_batch(n: int, mesh: Mesh) -> int:
    """Pad a batch size to a multiple of the mesh size."""
    m = mesh.size
    return ((n + m - 1) // m) * m
