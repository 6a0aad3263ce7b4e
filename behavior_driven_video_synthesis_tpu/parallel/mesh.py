"""Device mesh + sharding rules.

The reference's only parallelism is single-process ``nn.DataParallel``
(SURVEY.md §2.4/§5.8).  TPU-native replacement: SPMD data parallelism over a
1-D `Mesh(("data",))` spanning ICI — batches sharded on axis 0, parameters
replicated, gradients reduced by XLA-inserted collectives under `jit`.
Model sharding axes ("model") are provisioned for the larger configs
(e.g. VUNet at high nf) but data-parallel is the default, matching the
reference's scale.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    1-D ("data",) by default; pass ``axes=("data", "model")`` with ``shape``
    for hybrid layouts.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree with axis-0 sharded over the mesh."""
    sharding = data_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params, opt state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )
