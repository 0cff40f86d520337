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

__all__ = ["EllGso", "ell_from_dense", "ell_topk", "ell_shift",
           "ell_shift_rows"]


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

    def db_shift_rows(self, xr: jnp.ndarray) -> jnp.ndarray:
        """Node-major shift of xr: (*L, N, E, G) -> (*L, No, E, G) — the
        TPU-fast layout (see ell_shift_rows); overridden by
        parallel.db.ShardedEllGso with the mesh-sharded version."""
        return ell_shift_rows(xr, self)

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


def ell_shift_rows(xr: jnp.ndarray, ell: EllGso) -> jnp.ndarray:
    """One graph shift on the node-major layout: xr (*L, N, E, G) ->
    (*L, No, E, G); same semantics as ``ell_shift`` up to the transpose.

    This is the fast TPU formulation (v5e gather probes,
    experiments/probe_gather_tpu*.py + bench_ell_tpu.py, sync-mode
    protocol): flatten all leading axes into ONE batch dim and gather
    whole feature rows along the node axis, keeping the node axis on
    the sublane (second-to-minor) axis through the contraction —
    measured ~11x faster than gathering along the 128-lane minor axis
    ('flat'). The gather itself is row-LATENCY bound on TPU (~7-8 ns
    per gathered row on v5e, flat in N from 256 to 65k and roughly
    flat in row width), so: (a) wide feature rows (E*G or the GRNN's
    K*H register) amortize the latency, and (b) where a dense
    (B,T,E,N,N) GSO fits in HBM, the dense einsum rides the MXU and is
    10-40x faster — ELL's win is O(N*D) MEMORY, enabling N where dense
    is impossible (N=65536 dense would be 137 GB).

    The table may be rectangular: idx/val rows are the output nodes
    (possibly a shard-local block of them) while xr's node axis holds
    the gather source (possibly the all-gathered global signal).
    """
    idx, val = ell.idx, ell.val
    *L, Nn, E, G = xr.shape
    No, D = idx.shape[-2:]
    Bf = int(np.prod(L)) if L else 1
    xf = xr.reshape((Bf, Nn, E * G))
    ixf = idx.reshape((Bf, No * D, 1))
    xg = jnp.take_along_axis(xf, ixf, axis=-2)          # (Bf, No*D, E*G)
    vf = val.reshape((Bf, E, No, D)).astype(xr.dtype)
    if E == 1:
        y = jnp.einsum("bndc,bnd->bnc",
                       xg.reshape((Bf, No, D, E * G)), vf[:, 0])
    else:
        y = jnp.einsum("bndeg,bend->bneg",
                       xg.reshape((Bf, No, D, E, G)), vf)
    return y.reshape(tuple(L) + (No, E, G))


def ell_shift(x: jnp.ndarray, ell: EllGso,
              layout: str = "rows") -> jnp.ndarray:
    """One graph shift y = x·S on the ELL layout.

    x: (*L, E, G, N) -> y: (*L, E, G, No), semantics matching
    ``einsum("...egn,...enm->...egm", x, S_dense)`` (the DB filters'
    contraction, reference graphML.py:1071): output node m aggregates
    its in-neighbors: one gather + one D-length contraction.

    layout picks the gather formulation:
      * 'rows' (default): transpose features minor and run the
        node-major ``ell_shift_rows`` fast path, transposing back at
        the boundary (an optimization barrier keeps the boundary
        transpose from being fused back into the gather).
      * 'flat': gather along the node (minor) axis directly — fewer
        transposes, fine on CPU, measured ~11x slower on TPU v5e.

    Callers doing repeated shifts (the DB filters) should hold the
    signal node-major and call ``ell_shift_rows`` directly, paying the
    two transposes once per filter instead of once per shift.
    """
    idx, val = ell.idx, ell.val
    *L, E, G, _ = x.shape
    No, D = idx.shape[-2:]
    if layout == "rows":
        xr = jnp.moveaxis(x, -1, -3)                    # (*L, N, E, G)
        y = ell_shift_rows(xr, ell)                     # (*L, No, E, G)
        y = jax.lax.optimization_barrier(y)
        return jnp.moveaxis(y, -3, -1)
    idxf = idx.reshape(tuple(L) + (1, 1, No * D))
    idxf = jnp.broadcast_to(idxf, tuple(L) + (E, G, No * D))
    xg = jnp.take_along_axis(x, idxf, axis=-1)
    xg = xg.reshape(tuple(L) + (E, G, No, D))
    return jnp.einsum("...egnd,...end->...egn", xg,
                      val.astype(x.dtype))
