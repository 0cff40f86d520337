"""ShardedGso: a drop-in GSO whose shifts run across the device mesh.

Wraps a GraphPartition + mesh and exposes the same ``gshift`` contract as
``ops.gso.Gso`` (duck-typed via a ``shift`` method), so every filter
functional (``ops.filters.lsigf`` etc.) transparently executes node-
sharded with halo exchange — the multi-chip path for graphs too large
for one chip's HBM.

Usage:
    part = partition_nodes(S, n_graph_shards)
    sgso = ShardedGso(mesh, part)
    y = filters.lsigf(h, sgso, x_padded)   # x padded via part.pad_signal
"""

from __future__ import annotations

import jax
import numpy as np

from graph_neural_networks_tpu.parallel.partition import GraphPartition
from graph_neural_networks_tpu.parallel.shift import (
    sharded_gshift_allgather, sharded_gshift_ring)


class ShardedGso:
    """Node-sharded GSO over a ('data', 'graph') mesh.

    The signal convention matches gshift: x (..., E, G, N_padded), node
    axis last, already ordered/padded by ``partition.pad_signal``.
    """

    def __init__(self, mesh, partition, axis: str = "graph",
                 prefer_ring: bool = True, data_axis: str | None = None):
        from graph_neural_networks_tpu.parallel.partition import (
            BcsrPartition)
        from graph_neural_networks_tpu.parallel.shift import (
            sharded_gshift_bcsr)
        self.mesh = mesh
        self.partition = partition
        self.axis = axis
        self.data_axis = data_axis
        if isinstance(partition, BcsrPartition):
            # scattered graph: per-shard BCSR column slices (the band
            # slab would degenerate dense at RCM bandwidth ~ N)
            self.uses_ring = False
            build = sharded_gshift_bcsr
        else:
            self.uses_ring = prefer_ring and partition.is_ring
            build = sharded_gshift_ring if self.uses_ring \
                else sharded_gshift_allgather
        self._shift = build(mesh, partition, axis)
        # hybrid data x graph variant, used when the (flattened) batch dim
        # divides the data axis (falls back to graph-only sharding e.g. for
        # the batch-1 init trace)
        self._shift_dp = (build(mesh, partition, axis, data_axis=data_axis)
                          if data_axis else None)
        self._n_data = mesh.shape[data_axis] if data_axis else 1

    # the Gso duck-type surface used by ops.gso.gshift
    @property
    def n(self) -> int:
        return self.partition.n_padded

    @property
    def n_edge_features(self) -> int:
        return self.partition.S_perm.shape[0]

    @property
    def S(self):
        """Dense (E, Np, Np) reconstruction — small-graph debug only
        (partition.S_perm refuses above its size guard)."""
        import jax.numpy as jnp
        return jnp.asarray(self.partition.S_perm, jnp.float32)

    def shift(self, x):
        """One sharded graph shift on (..., E, G, N_padded); any number
        of leading dims (5-D recurrent signals included)."""
        lead = int(np.prod(x.shape[:-3])) if x.ndim > 3 else 1
        if self._shift_dp is not None and lead % self._n_data == 0:
            return self._shift_dp(x)
        return self._shift(x)

    @property
    def band_attention(self):
        """Lazy sharded band-attention operator for the GAT family
        (parallel.attention.ShardedBandAttention); ops.filters routes
        graph_attention / gat_lsigf / gat_evgf here for ShardedGso GSOs.
        Requires the ring property."""
        if getattr(self, "_band_attention", None) is None:
            from graph_neural_networks_tpu.parallel.attention import (
                ShardedBandAttention)
            self._band_attention = ShardedBandAttention(
                self.mesh, self.partition, self.axis,
                data_axis=self.data_axis)
        return self._band_attention

    def pad_signal(self, x: np.ndarray) -> np.ndarray:
        return self.partition.pad_signal(x)

    def unpad_signal(self, x: np.ndarray) -> np.ndarray:
        return self.partition.unpad_signal(x)


# Register as a LEAFLESS pytree (the whole object is static aux data, keyed
# by identity) so a ShardedGso can ride inside jitted ctx pytrees — e.g.
# architectures' ctx["S"] — and a rebuilt one correctly retriggers a trace.
jax.tree_util.register_pytree_node(
    ShardedGso,
    lambda s: ((), s),
    lambda aux, children: aux,
)
