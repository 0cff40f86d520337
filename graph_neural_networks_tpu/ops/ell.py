"""ELL (padded in-neighbor) layout for time-varying batched GSOs.

The delayed (DB) model family takes a different GSO per (batch, time)
step — the reference stores it dense as ``(B,T,E,N,N)``
(architecturesTime.py forward contracts, graphML.py:977-1290) and every
shift is a dense ``N×N`` matmul. For the geometric communication graphs
these models exist for (flocking: bounded degree, dataTools.py:2816),
that is O(N²) memory for O(N·deg) information.

``EllGso`` is the TPU-native replacement: a fixed-width padded
in-neighbor table, the classic ELLPACK layout —

  * ``idx``: ``(*L, N, D)`` int32 — ``idx[..., m, d]`` is the d-th
    in-neighbor ``n`` of output node ``m`` (entries beyond the true
    in-degree point anywhere valid and carry weight 0),
  * ``val``: ``(*L, E, N, D)`` — ``val[..., e, m, d] = S[..., e, n, m]``
    with ``n = idx[..., m, d]``,

where ``*L`` are arbitrary leading (batch/time) axes shared by both.
The graph shift ``y = x·S`` (output node m sums its in-neighbors,
matching ``einsum("...gn,...nm->...gm", x, S)``) becomes one gather and
one small contraction — static shapes, O(N·D) memory, and the gather
vectorizes over the E/G axes. D is the max in-degree (or a top-|S| cap).

Because ``EllGso`` is a registered pytree, it passes through ``jit`` /
``lax.scan`` / ``flax`` apply like any array, and leading-axis
manipulations (time slicing, ``moveaxis`` for scan) are plain
``jax.tree.map`` over its leaves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["EllGso", "ell_from_dense", "ell_topk", "ell_shift"]


class EllGso:
    """Padded in-neighbor (ELLPACK) time-varying GSO; see module docstring.

    idx: (*L, N, D) integer, val: (*L, E, N, D). Leading axes *L are
    shared (e.g. (B, T) for the DB family, (B,) inside a scan step).
    """

    def __init__(self, idx, val):
        assert idx.shape[:-2] == val.shape[:-3] and \
            idx.shape[-2:] == (val.shape[-2], val.shape[-1]), \
            (idx.shape, val.shape)
        self.idx = idx
        self.val = val

    # -- shape sugar --------------------------------------------------------
    @property
    def n(self) -> int:
        return self.val.shape[-2]

    @property
    def d(self) -> int:
        return self.val.shape[-1]

    @property
    def n_edge_features(self) -> int:
        return self.val.shape[-3]

    @property
    def shape(self):  # the dense shape this stands in for
        return self.val.shape[:-2] + (self.n, self.n)

    @property
    def dtype(self):
        return self.val.dtype

    def db_shift(self, x: jnp.ndarray) -> jnp.ndarray:
        """One graph shift of x: (*L, E, G, N); overridden by
        parallel.db.ShardedEllGso with the mesh-sharded version."""
        return ell_shift(x, self)

    def __repr__(self):
        return (f"EllGso(lead={self.idx.shape[:-2]}, N={self.n}, "
                f"D={self.d}, E={self.n_edge_features})")


jax.tree_util.register_pytree_node(
    EllGso,
    lambda e: ((e.idx, e.val), None),
    lambda _, leaves: EllGso(*leaves))


def ell_from_dense(S, d_max=None) -> EllGso:
    """Host-side exact conversion of a dense GSO stack to ELL.

    S: (*L, E, N, N) numpy. d_max=None uses the max in-degree over the
    whole stack (exact); a smaller d_max keeps the top-d_max entries of
    each column by max-over-E magnitude (a capped approximation).
    """
    S = np.asarray(S)
    N = S.shape[-1]
    mag = np.abs(S).max(axis=-3)                      # (*L, n, m)
    magt = np.swapaxes(mag, -1, -2)                   # (*L, m, n)
    if d_max is None:
        deg = (magt > 0).sum(axis=-1)
        d_max = max(int(deg.max()), 1)
    # top-d_max in-neighbors per output node (zeros sort last → exact
    # whenever d_max >= true in-degree)
    idx = np.argsort(-magt, axis=-1, kind="stable")[..., :d_max]
    idx = np.ascontiguousarray(idx).astype(np.int32)  # (*L, N, D)
    St = np.swapaxes(S, -1, -2)                       # (*L, E, m, n)
    gather = np.broadcast_to(idx[..., None, :, :],
                             St.shape[:-1] + (d_max,))
    val = np.take_along_axis(St, gather, axis=-1)     # (*L, E, N, D)
    return EllGso(jnp.asarray(idx), jnp.asarray(val))


def ell_topk(S: jnp.ndarray, d_max: int) -> EllGso:
    """Jit-friendly dense→ELL conversion (lax.top_k per column by
    max-over-E magnitude) for building ELL GSOs inside a compiled
    rollout. Exact when d_max >= max in-degree. S: (*L, E, N, N)."""
    mag = jnp.abs(S).max(axis=-3)                     # (*L, n, m)
    magt = jnp.swapaxes(mag, -1, -2)                  # (*L, m, n)
    _, idx = jax.lax.top_k(magt, d_max)               # (*L, N, D)
    St = jnp.swapaxes(S, -1, -2)                      # (*L, E, m, n)
    gather = jnp.broadcast_to(idx[..., None, :, :],
                              St.shape[:-1] + (d_max,))
    val = jnp.take_along_axis(St, gather, axis=-1)
    return EllGso(idx.astype(jnp.int32), val)


def ell_to_dense(ell: EllGso) -> np.ndarray:
    """Host-side scatter of an EllGso back to the dense (*L, E, N, N)
    stack (small N only — diagnostic / DAGger-storage use)."""
    idx = np.asarray(ell.idx)
    val = np.asarray(ell.val)
    lead = idx.shape[:-2]
    E, N, D = val.shape[-3:]
    S = np.zeros(lead + (E, N, N), val.dtype)
    Sf = S.reshape((-1, E, N, N))
    idxf = idx.reshape((-1, N, D))
    valf = val.reshape((-1, E, N, D))
    m = np.broadcast_to(np.arange(N)[:, None], (N, D))
    for i in range(Sf.shape[0]):
        for e in range(E):
            np.add.at(Sf[i, e], (idxf[i], m), valf[i, e])
    return S


def ell_shift(x: jnp.ndarray, ell: EllGso) -> jnp.ndarray:
    """One graph shift y = x·S on the ELL layout.

    x: (*L, E, G, N) -> y: (*L, E, G, N), semantics matching
    ``einsum("...egn,...enm->...egm", x, S_dense)`` (the DB filters'
    contraction, reference graphML.py:1071): output node m aggregates
    its in-neighbors. One flat gather along the node axis (shared by
    E and G) + one D-length contraction.

    The table may be rectangular: idx/val rows are the output nodes
    (possibly a shard-local block of them) while x's node axis holds the
    gather source (possibly the all-gathered global signal).
    """
    idx, val = ell.idx, ell.val
    *L, E, G, _ = x.shape
    No, D = idx.shape[-2:]
    idxf = idx.reshape(tuple(L) + (1, 1, No * D))
    idxf = jnp.broadcast_to(idxf, tuple(L) + (E, G, No * D))
    xg = jnp.take_along_axis(x, idxf, axis=-1)
    xg = xg.reshape(tuple(L) + (E, G, No, D))
    return jnp.einsum("...egnd,...end->...egn", xg,
                      val.astype(x.dtype))
