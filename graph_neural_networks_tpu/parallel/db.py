"""Node-sharded time-varying (DB) shifts: the scale-out path for the
decentralized-controller family.

The static-graph sharded path (parallel.shift) relies on a fixed band
structure for its halo rings. Time-varying communication graphs
(flocking) have no static locality — the neighbor set changes every
step — so the TPU-native decomposition is:

  * signals x (…, G, N) sharded over the node axis on the 'graph' mesh
    axis,
  * the ELL in-neighbor table (ops.ell) row-sharded: each chip holds the
    idx/val rows of its own output nodes (O(N·D / P) per chip — no
    dense N×N anywhere),
  * one ``all_gather`` of the O(N) signal per shift (ICI), then a
    shard-local ELL gather+contract of the owned rows.

Everything runs inside ``shard_map`` as plain differentiable JAX, so the
backward pass (scatter-add transposed through the all-gather as a
psum-scatter) comes from autodiff. Works under ``jit`` / ``lax.scan``
(a ``ShardedEllGso`` is a pytree whose mesh/axis ride as static aux
data), so the DB architectures run unchanged: pass a ShardedEllGso
instead of the dense (B,T,E,N,N) stack.

Replaces at scale: reference architecturesTime.py forward contracts /
graphML.py:977-1290 (single-GPU dense).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from graph_neural_networks_tpu.ops import ell as ell_lib

__all__ = ["ShardedEllGso", "shard_ell"]


class ShardedEllGso(ell_lib.EllGso):
    """Row-sharded ELL time-varying GSO on a device mesh.

    idx: (*L, Np·P, D) int32, val: (*L, E, Np·P, D) — node axis padded to
    a multiple of the mesh axis size and laid out with
    ``NamedSharding`` over `axis`. ``n_orig`` remembers the true N so
    signals can be padded/unpadded at the boundary. The shift
    all-gathers the signal over `axis` and contracts the locally-owned
    rows (module docstring).
    """

    def __init__(self, idx, val, mesh: Mesh, axis: str = "graph",
                 n_orig: int | None = None):
        super().__init__(idx, val)
        self.mesh = mesh
        self.axis = axis
        self.n_orig = self.n if n_orig is None else int(n_orig)

    def db_shift(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (*L, E, G, N_pad) node-sharded -> same, node-sharded."""
        mesh, axis = self.mesh, self.axis
        lead = x.ndim - 3

        def spec(*tail):
            return P(*((None,) * lead + tail))

        @partial(shard_map, mesh=mesh,
                 in_specs=(spec(None, None, axis), spec(axis, None),
                           spec(None, axis, None)),
                 out_specs=spec(None, None, axis))
        def _shift(x_blk, idx_blk, val_blk):
            x_full = jax.lax.all_gather(x_blk, axis, axis=-1, tiled=True)
            return ell_lib.ell_shift(x_full,
                                     ell_lib.EllGso(idx_blk, val_blk))

        return _shift(x, self.idx, self.val)

    def db_shift_rows(self, xr: jnp.ndarray) -> jnp.ndarray:
        """Node-major variant: xr (*L, N_pad, E, G) node-sharded at axis
        -3 -> same, node-sharded. This is the layout the DB filters hold
        their registers in (ops.ell.ell_shift_rows — the TPU-fast
        gather); the all-gather rides the sublane node axis."""
        mesh, axis = self.mesh, self.axis
        lead = xr.ndim - 3

        def spec(*tail):
            return P(*((None,) * lead + tail))

        @partial(shard_map, mesh=mesh,
                 in_specs=(spec(axis, None, None), spec(axis, None),
                           spec(None, axis, None)),
                 out_specs=spec(axis, None, None))
        def _shift(x_blk, idx_blk, val_blk):
            x_full = jax.lax.all_gather(x_blk, axis, axis=lead,
                                        tiled=True)
            return ell_lib.ell_shift_rows(
                x_full, ell_lib.EllGso(idx_blk, val_blk))

        return _shift(xr, self.idx, self.val)

    # -- signal padding at the user boundary --------------------------------
    def pad_signal(self, x):
        pad = self.n - self.n_orig
        if pad == 0:
            return jnp.asarray(x)
        widths = [(0, 0)] * (np.ndim(x) - 1) + [(0, pad)]
        return jnp.pad(jnp.asarray(x), widths)

    def unpad_signal(self, y):
        return y[..., : self.n_orig]

    def __repr__(self):
        return (f"ShardedEllGso(lead={self.idx.shape[:-2]}, "
                f"N={self.n_orig}(pad {self.n}), D={self.d}, "
                f"axis={self.axis!r})")


jax.tree_util.register_pytree_node(
    ShardedEllGso,
    lambda e: ((e.idx, e.val), (e.mesh, e.axis, e.n_orig)),
    lambda aux, leaves: ShardedEllGso(*leaves, mesh=aux[0], axis=aux[1],
                                      n_orig=aux[2]))


def shard_ell(ell: ell_lib.EllGso, mesh: Mesh,
              axis: str = "graph") -> ShardedEllGso:
    """Lay an EllGso out across the mesh: pad the node axis to a multiple
    of the mesh axis size (pad rows gather node 0 with weight 0) and
    device_put row blocks to their owners."""
    n_parts = mesh.shape[axis]
    idx, val = np.asarray(ell.idx), np.asarray(ell.val)
    N = idx.shape[-2]
    n_pad = (-N) % n_parts
    if n_pad:
        widths_i = [(0, 0)] * (idx.ndim - 2) + [(0, n_pad), (0, 0)]
        widths_v = [(0, 0)] * (val.ndim - 2) + [(0, n_pad), (0, 0)]
        idx = np.pad(idx, widths_i)
        val = np.pad(val, widths_v)
    lead_i = (None,) * (idx.ndim - 2)
    lead_v = (None,) * (val.ndim - 2)
    idx_s = jax.device_put(
        jnp.asarray(idx), NamedSharding(mesh, P(*lead_i, axis, None)))
    val_s = jax.device_put(
        jnp.asarray(val), NamedSharding(mesh, P(*lead_v, axis, None)))
    return ShardedEllGso(idx_s, val_s, mesh, axis, n_orig=N)
