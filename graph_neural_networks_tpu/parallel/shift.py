"""Sharded graph-shift (SpMM) paths and data-parallel training utilities.

Three TPU-native ways to run ``y = x @ S`` across a device mesh:

  1. GSPMD: annotate x/S with NamedShardings and let XLA insert the
     collectives (the zero-effort baseline — see make_dp_train_step).
  2. ``sharded_gshift_allgather``: explicit shard_map — each 'graph' shard
     all-gathers the node axis (one ICI all-gather) and contracts with its
     local column block of S. Exact for any sparsity pattern.
  3. ``sharded_gshift_ring``: halo exchange — valid when the partition is
     banded (GraphPartition.is_ring, i.e. after RCM ordering every block's
     in-edges come from itself and its two neighbors). Two ICI
     ``ppermute``s move just the boundary blocks; compute overlaps with
     whatever XLA schedules around it. This is the scaling path: volume
     moved is O(halo), not O(N).

Signals follow the gshift convention: x (..., E, G, N_padded) with the
node axis LAST and padded/ordered by the GraphPartition.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from graph_neural_networks_tpu.parallel.partition import GraphPartition


def _col_blocks(part: GraphPartition) -> jnp.ndarray:
    """S arranged for column sharding: (E, Np, Np), device d owns columns
    [d*bs, (d+1)*bs)."""
    return jnp.asarray(part.S_perm, jnp.float32)


def sharded_gshift_allgather(mesh: Mesh, part: GraphPartition,
                             axis: str = "graph") -> Callable:
    """Build y = x @ S with x node-sharded; one all-gather per shift."""
    S = _col_blocks(part)
    n_extra = None  # bound at call time

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, None, None, axis), P(None, None, axis)),
        out_specs=P(None, None, None, axis))
    def _shift(x_blk, S_blk):
        # x_blk: (B, E, G, bs), S_blk: (E, Np, bs)
        x_full = jax.lax.all_gather(x_blk, axis, axis=-1, tiled=True)
        return jnp.einsum("begn,enm->begm", x_full, S_blk)

    def shift(x):
        return _shift(x, S)
    return shift


def _ring_blocks(part: GraphPartition) -> np.ndarray:
    """(P, E, 3*bs, bs): for each block b, the rows of S from blocks
    b-1, b, b+1 into block b's columns (zeros at the boundary)."""
    bs = part.block_size
    Pn = part.n_parts
    E = part.S_perm.shape[0]
    out = np.zeros((Pn, E, 3 * bs, bs))
    for b in range(Pn):
        cols = slice(b * bs, (b + 1) * bs)
        for k, nb in enumerate((b - 1, b, b + 1)):
            if 0 <= nb < Pn:
                out[b, :, k * bs:(k + 1) * bs, :] = \
                    part.S_perm[:, nb * bs:(nb + 1) * bs, cols]
    return out


def sharded_gshift_ring(mesh: Mesh, part: GraphPartition,
                        axis: str = "graph") -> Callable:
    """Halo-exchange shift: two ppermutes (left/right boundary blocks) plus
    a local (3*bs x bs) contraction. Requires part.is_ring."""
    assert part.is_ring, (
        "partition has bandwidth > 1; use sharded_gshift_allgather or more "
        "aggressive reordering")
    n_dev = mesh.shape[axis]
    S3 = jnp.asarray(_ring_blocks(part), jnp.float32)  # (P, E, 3bs, bs)

    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, None, None, axis), P(axis, None, None, None)),
        out_specs=P(None, None, None, axis))
    def _shift(x_blk, S3_blk):
        # x_blk: (B, E, G, bs); S3_blk: (1, E, 3bs, bs)
        from_left = jax.lax.ppermute(x_blk, axis, fwd)   # block b-1's data
        from_right = jax.lax.ppermute(x_blk, axis, bwd)  # block b+1's data
        x_halo = jnp.concatenate([from_left, x_blk, from_right], axis=-1)
        return jnp.einsum("begn,enm->begm", x_halo, S3_blk[0])

    def shift(x):
        return _shift(x, S3)
    return shift


def make_dp_train_step(step_fn: Callable, mesh: Mesh,
                       batch_argnums=(2, 3)) -> Callable:
    """Data-parallel wrapper: jit `step_fn(params, opt_state, x, y, ...)`
    with params/opt_state replicated and batch args sharded on 'data'.
    XLA inserts the gradient psum (GSPMD)."""
    repl = NamedSharding(mesh, P())

    def wrapper(params, opt_state, *batch):
        def put(i, a):
            if i in [b - 2 for b in batch_argnums]:
                spec = [None] * a.ndim
                spec[0] = "data"
                return jax.device_put(a, NamedSharding(mesh, P(*spec)))
            return a
        batch = tuple(put(i, jnp.asarray(a)) for i, a in enumerate(batch))
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)
        return jax.jit(step_fn)(params, opt_state, *batch)
    return wrapper
