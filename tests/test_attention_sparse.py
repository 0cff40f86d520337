"""Edge-list attention (SDDMM + segment softmax) vs the dense path."""

import numpy as np
import jax.numpy as jnp
import pytest

from graph_neural_networks_tpu.ops import attention_sparse as asp
from graph_neural_networks_tpu.ops import filters, gso as gso_lib
from graph_neural_networks_tpu.utils import graph as gt

RNG = np.random.default_rng(23)
B, G, F, E, N, P = 3, 2, 4, 2, 14, 3


@pytest.fixture(scope="module")
def S():
    W = gt.create_graph("SBM", N, {"nCommunities": 2, "probIntra": 0.7,
                                   "probInter": 0.2},
                        rng=np.random.default_rng(1))
    W = W / np.max(np.abs(np.linalg.eigvalsh(W)))
    return np.stack([W, 0.3 * W])


def test_edge_list_structure(S):
    edges = asp.build_edge_list(S)
    assert edges.n_nodes == N
    # row-sorted, includes self-loops
    assert np.all(np.diff(np.asarray(edges.row)) >= 0)
    pairs = set(zip(np.asarray(edges.row).tolist(),
                    np.asarray(edges.col).tolist()))
    for i in range(N):
        assert (i, i) in pairs


def test_sparse_attention_matches_dense(S):
    x = RNG.standard_normal((B, G, N)).astype(np.float32)
    a = RNG.standard_normal((P, E, 2 * F)).astype(np.float32) * 0.5
    W = RNG.standard_normal((P, E, F, G)).astype(np.float32) * 0.5
    edges = asp.build_edge_list(S)
    alpha, _ = asp.attention_coefficients_edges(jnp.asarray(x),
                                                jnp.asarray(a),
                                                jnp.asarray(W), edges)
    dense = np.asarray(filters.attention_gso(jnp.asarray(x), jnp.asarray(a),
                                             jnp.asarray(W),
                                             gso_lib.as_gso(S)))
    row = np.asarray(edges.row)
    col = np.asarray(edges.col)
    np.testing.assert_allclose(np.asarray(alpha), dense[..., row, col],
                               atol=1e-5, rtol=1e-4)


def test_sparse_gat_matches_dense(S):
    x = RNG.standard_normal((B, G, N)).astype(np.float32)
    a = RNG.standard_normal((P, E, 2 * F)).astype(np.float32) * 0.5
    W = RNG.standard_normal((P, E, F, G)).astype(np.float32) * 0.5
    edges = asp.build_edge_list(S)
    y_sparse = asp.graph_attention_edges(jnp.asarray(x), jnp.asarray(a),
                                         jnp.asarray(W), edges)
    y_dense = filters.graph_attention(jnp.asarray(x), jnp.asarray(a),
                                      jnp.asarray(W), gso_lib.as_gso(S))
    np.testing.assert_allclose(np.asarray(y_sparse), np.asarray(y_dense),
                               atol=1e-4, rtol=1e-3)
