"""Device-mesh helpers: the ('data', 'graph') logical mesh.

Scaling model (BASELINE.json north star): batches shard over 'data',
graph nodes shard over 'graph'; collectives ride ICI within a slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data", "graph"),
              devices=None) -> Mesh:
    """Build a logical mesh over the available devices.

    shape=None picks (n_devices, 1); pass e.g. (2, 4) to split 8 chips
    into 2-way data x 4-way graph parallelism.
    """
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == n, (shape, n)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def data_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0,
                  node_axis: Optional[int] = None) -> NamedSharding:
    """NamedSharding with the batch dim on 'data' (and optionally the node
    dim on 'graph')."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    if node_axis is not None and "graph" in mesh.axis_names:
        spec[node_axis] = "graph"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
