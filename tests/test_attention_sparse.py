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


def test_sparse_gcat_matches_dense(S):
    """Edge-list GCAT (K-tap filter over attention coefficients) == dense."""
    K = 3
    x = RNG.standard_normal((B, G, N)).astype(np.float32)
    a = RNG.standard_normal((P, E, 2 * G)).astype(np.float32) * 0.5
    W = RNG.standard_normal((P, E, G, G)).astype(np.float32) * 0.5
    h = RNG.standard_normal((E, K)).astype(np.float32) * 0.5
    edges = asp.build_edge_list(S)
    y_sparse = asp.gat_lsigf_edges(jnp.asarray(h), jnp.asarray(x),
                                   jnp.asarray(a), jnp.asarray(W), edges)
    y_dense = filters.gat_lsigf(jnp.asarray(h), jnp.asarray(x),
                                jnp.asarray(a), jnp.asarray(W),
                                gso_lib.as_gso(S))
    np.testing.assert_allclose(np.asarray(y_sparse), np.asarray(y_dense),
                               atol=1e-4, rtol=1e-3)


def test_sparse_gat_evgf_matches_dense(S):
    """Edge-list per-hop edge-variant attention == dense."""
    K = 3
    x = RNG.standard_normal((B, G, N)).astype(np.float32)
    a = RNG.standard_normal((P, K, E, 2 * F)).astype(np.float32) * 0.5
    W = RNG.standard_normal((P, K, E, F, G)).astype(np.float32) * 0.5
    edges = asp.build_edge_list(S)
    y_sparse = asp.gat_evgf_edges(jnp.asarray(x), jnp.asarray(a),
                                  jnp.asarray(W), edges)
    y_dense = filters.gat_evgf(jnp.asarray(x), jnp.asarray(a),
                               jnp.asarray(W), gso_lib.as_gso(S))
    np.testing.assert_allclose(np.asarray(y_sparse), np.asarray(y_dense),
                               atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("cls_name", ["GraphAttentionNetwork",
                                      "GraphConvolutionAttentionNetwork",
                                      "EdgeVariantAttention"])
def test_architecture_attention_mode_edge_matches_dense(S, cls_name):
    """attentionMode='edge' on the GAT-family architectures == the dense
    forward AND backward, with identical params."""
    import jax
    from graph_neural_networks_tpu.models import architectures as archs
    cls = getattr(archs, cls_name)
    kw = dict(nSelectedNodes=[N, N], poolingFunction="NoPool",
              poolingSize=[1, 1], dimLayersMLP=[3], GSO=S)
    if cls_name == "GraphAttentionNetwork":
        def build(mode):
            return cls([G, 4, 4], [P, P], "relu", bias=True,
                       attentionMode=mode, **kw)
    else:
        def build(mode):
            return cls([G, 4, 4], [3, 3], [P, P], True, "relu",
                       attentionMode=mode, **kw)
    dense_arch = build("dense")
    edge_arch = build("edge")
    params = dense_arch.init(jax.random.PRNGKey(0))
    x = RNG.standard_normal((B, G, N)).astype(np.float32)

    def loss(arch):
        def f(p):
            return jnp.sum(arch.core.apply(p, jnp.asarray(x), arch.ctx)[0]
                           ** 2)
        return f

    l_d, g_d = jax.value_and_grad(loss(dense_arch))(params)
    l_e, g_e = jax.value_and_grad(loss(edge_arch))(params)
    np.testing.assert_allclose(float(l_e), float(l_d), rtol=1e-4)
    for pd, pe in zip(jax.tree_util.tree_leaves(g_d),
                      jax.tree_util.tree_leaves(g_e)):
        np.testing.assert_allclose(np.asarray(pe), np.asarray(pd),
                                   atol=2e-3, rtol=2e-3)
