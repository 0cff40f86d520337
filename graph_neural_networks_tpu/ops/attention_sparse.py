"""Edge-list attention: SDDMM + segment softmax, O(E) memory.

The dense attention path (ops.filters.attention_gso) materializes the
B x P x E x N x N coefficient tensor — the reference's central memory
pathology for GAT at scale (SURVEY.md §2.9). This module computes the
same coefficients on the edge list.

Orientation note (matches the reference exactly, graphML.py:713, 807):
score on edge (i row, j col) is e_ij = LeakyReLU(a2.Wx_i + a1.Wx_j),
softmax normalizes over each ROW i's edges, and the layer output at
node m aggregates over rows: y_m = sum_i s_im alpha_im Wx_i (the
row-vector right-multiplication `Wx @ (S * alpha)`).

Pure-JAX segment ops (XLA scatter/gather) — numerically identical to the
dense path on the S+I support; a Pallas edge-tiled kernel is the round-2
optimization for very large E.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from graph_neural_networks_tpu.ops import gso as gso_lib


class EdgeList(NamedTuple):
    """COO support of S+I (self-loops added, reference graphML.py:692),
    sorted by row. row/col: (nnz,) int32; s_val: (E, nnz) = S[e, row, col]
    (0 on added self-loops unless S had them)."""
    row: jnp.ndarray
    col: jnp.ndarray
    s_val: jnp.ndarray
    n_nodes: int


def build_edge_list(S) -> EdgeList:
    """Host-side: extract the S+I support as a row-sorted COO edge list."""
    S = np.asarray(gso_lib.dense(S))
    E, N, _ = S.shape
    support = (np.abs(S).sum(0) + np.eye(N)) > 1e-9
    row, col = np.nonzero(support)         # sorted by row
    s_val = S[:, row, col]                 # (E, nnz)
    return EdgeList(jnp.asarray(row, jnp.int32), jnp.asarray(col, jnp.int32),
                    jnp.asarray(s_val, jnp.float32), N)


def attention_coefficients_edges(x, a, W, edges: EdgeList,
                                 negative_slope: float = 0.2):
    """Per-edge attention coefficients alpha (B, P, E, nnz) — the sparse
    equivalent of filters.attention_gso (same math on the S+I support);
    alpha on edge k equals the dense alpha[row[k], col[k]]."""
    P = a.shape[0]
    F = W.shape[2]
    Wx = jnp.einsum("pefg,bgn->bpefn", W, x)
    a1, a2 = a[..., :F], a[..., F:]
    a1Wx = jnp.einsum("pef,bpefn->bpen", a1, Wx)   # pairs with the column j
    a2Wx = jnp.einsum("pef,bpefn->bpen", a2, Wx)   # pairs with the row i
    # SDDMM: scores only on edges
    e = jax.nn.leaky_relu(a2Wx[..., edges.row] + a1Wx[..., edges.col],
                          negative_slope=negative_slope)  # B x P x E x nnz
    # segment softmax over each row's outgoing edges
    n = edges.n_nodes
    e_max = jax.ops.segment_max(jnp.moveaxis(e, -1, 0), edges.row,
                                num_segments=n)           # n x B x P x E
    e_exp = jnp.exp(e - jnp.moveaxis(e_max, 0, -1)[..., edges.row])
    denom = jax.ops.segment_sum(jnp.moveaxis(e_exp, -1, 0), edges.row,
                                num_segments=n)
    alpha = e_exp / jnp.moveaxis(denom, 0, -1)[..., edges.row]
    return alpha, Wx


def graph_attention_edges(x, a, W, edges: EdgeList,
                          negative_slope: float = 0.2):
    """GAT layer output via edge-list aggregation: the sparse equivalent of
    filters.graph_attention — y[..., m] = sum_i s_im alpha_im Wx_i
    (aggregation at the column per the reference's Wx @ (S * alpha)).
    Returns (B, P, F, N)."""
    alpha, Wx = attention_coefficients_edges(x, a, W, edges, negative_slope)
    # edge messages from the row node, accumulated at the column node
    msg = (edges.s_val[None, None] * alpha)[:, :, :, None, :] \
        * Wx[..., edges.row]                        # B x P x E x F x nnz
    agg = jax.ops.segment_sum(jnp.moveaxis(msg, -1, 0), edges.col,
                              num_segments=edges.n_nodes)
    y = jnp.moveaxis(agg, 0, -1)                    # B x P x E x F x N
    return jnp.sum(y, axis=2)
