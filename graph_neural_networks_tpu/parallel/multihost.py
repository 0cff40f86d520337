"""Multi-host bring-up helpers.

The reference is single-process (SURVEY.md §2.9); this module is the
multi-host entry point: initialize the JAX distributed runtime, build a
mesh whose 'graph' axis stays within each host's ICI domain (halo
ppermutes ride ICI; only the 'data' axis crosses DCN), and per-host data
sharding helpers. Exercised on real pods; on single-host it degrades to
the local mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax

from graph_neural_networks_tpu.parallel.mesh import make_mesh


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> dict:
    """Initialize jax.distributed (no-op when single-process). Returns a
    summary dict {process_index, process_count, local_devices, devices}."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "devices": len(jax.devices()),
    }


def make_pod_mesh(graph_parallelism: Optional[int] = None):
    """Mesh over ALL devices with 'graph' confined to one host's devices
    (ICI) and 'data' spanning hosts (DCN): devices arranged
    (hosts * leftover, graph_parallelism)."""
    n_local = len(jax.local_devices())
    n_total = len(jax.devices())
    if graph_parallelism is None:
        graph_parallelism = n_local
    assert n_local % graph_parallelism == 0, \
        "graph axis must divide the per-host device count (ICI domain)"
    return make_mesh((n_total // graph_parallelism, graph_parallelism))


def per_host_batch_slice(global_batch: int,
                         process_count: Optional[int] = None,
                         process_index: Optional[int] = None) -> slice:
    """The slice of a globally-sharded batch this host should load
    (per-host data loading; SURVEY.md §2.9). The global batch must
    divide evenly — pad the final batch host-side first (the Trainer's
    uneven-last-batch handling happens before sharding)."""
    pc = jax.process_count() if process_count is None else process_count
    pi = jax.process_index() if process_index is None else process_index
    assert global_batch % pc == 0, \
        f"global batch {global_batch} must divide process count {pc}"
    per = global_batch // pc
    return slice(pi * per, (pi + 1) * per)


def shard_host_data(mesh, x, spec):
    """Build the global device array from THIS host's local shard of the
    data. `x` is the host-local slice (e.g. produced with
    ``per_host_batch_slice``); `spec` a PartitionSpec over `mesh`.
    Single-process this is a plain sharded device_put; multi-process it
    assembles the global array from per-process shards without any host
    gathering (jax.make_array_from_process_local_data)."""
    from jax.sharding import NamedSharding
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, x)
