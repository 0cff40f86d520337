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


# ---------------------------------------------------------------------------
# Banded block attention (ops.attention_band)
# ---------------------------------------------------------------------------

def _band5(S):
    from graph_neural_networks_tpu.ops import spmm
    E = S.shape[0]
    slabs, w_max = [], 0
    for e in range(E):
        _, w_e = spmm.dense_to_band(S[e], 8)
        w_max = max(w_max, w_e)
    for e in range(E):
        slabs.append(spmm.dense_to_band_at(S[e], 8, w_max))
    import numpy as _np
    slab = _np.stack(slabs)
    nb = slab.shape[1]
    return jnp.asarray(slab.reshape(E, nb, 2 * w_max + 1, 8, 8)), w_max


def test_band_attention_coefficients_match_dense(S):
    from graph_neural_networks_tpu.ops import attention_band as ab
    x = RNG.standard_normal((B, G, N)).astype(np.float32)
    a = RNG.standard_normal((P, E, 2 * F)).astype(np.float32) * 0.5
    W = RNG.standard_normal((P, E, F, G)).astype(np.float32) * 0.5
    slab5, w = _band5(S)
    alpha_col, _ = ab.band_attention_coefficients(
        jnp.asarray(x), jnp.asarray(a), jnp.asarray(W), slab5, w)
    dense = np.asarray(filters.attention_gso(jnp.asarray(x), jnp.asarray(a),
                                             jnp.asarray(W),
                                             gso_lib.as_gso(S)))
    # check alpha at every support entry: alpha_col[., j, k, p, q] ==
    # dense[., (j+k-w)*ibs+p, j*ibs+q]
    ac = np.asarray(alpha_col)
    ibs = 8
    nb = ac.shape[3]
    for j in range(nb):
        for k in range(2 * w + 1):
            r = j + k - w
            if not (0 <= r < nb):
                continue
            dj = dense[..., r * ibs:(r + 1) * ibs, j * ibs:(j + 1) * ibs]
            dj = dj[..., :max(0, min(N - r * ibs, ibs)),
                    :max(0, min(N - j * ibs, ibs))]
            got = ac[:, :, :, j, k][..., :dj.shape[-2], :dj.shape[-1]]
            np.testing.assert_allclose(got, dj, atol=1e-5, rtol=1e-4,
                                       err_msg=f"block j={j} k={k}")


def test_band_gat_matches_dense(S):
    from graph_neural_networks_tpu.ops import attention_band as ab
    x = RNG.standard_normal((B, G, N)).astype(np.float32)
    a = RNG.standard_normal((P, E, 2 * F)).astype(np.float32) * 0.5
    W = RNG.standard_normal((P, E, F, G)).astype(np.float32) * 0.5
    slab5, w = _band5(S)
    y_band = ab.graph_attention_band(jnp.asarray(x), jnp.asarray(a),
                                     jnp.asarray(W), slab5, w)
    y_dense = filters.graph_attention(jnp.asarray(x), jnp.asarray(a),
                                      jnp.asarray(W), gso_lib.as_gso(S))
    np.testing.assert_allclose(np.asarray(y_band), np.asarray(y_dense),
                               atol=1e-4, rtol=1e-3)


def test_band_gcat_and_evgf_match_dense(S):
    from graph_neural_networks_tpu.ops import attention_band as ab
    K = 3
    x = RNG.standard_normal((B, G, N)).astype(np.float32)
    slab5, w = _band5(S)
    a = RNG.standard_normal((P, E, 2 * G)).astype(np.float32) * 0.5
    W = RNG.standard_normal((P, E, G, G)).astype(np.float32) * 0.5
    h = RNG.standard_normal((E, K)).astype(np.float32) * 0.5
    y_b = ab.gat_lsigf_band(jnp.asarray(h), jnp.asarray(x), jnp.asarray(a),
                            jnp.asarray(W), slab5, w)
    y_d = filters.gat_lsigf(jnp.asarray(h), jnp.asarray(x), jnp.asarray(a),
                            jnp.asarray(W), gso_lib.as_gso(S))
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_d),
                               atol=1e-4, rtol=1e-3)
    a2 = RNG.standard_normal((P, K, E, 2 * F)).astype(np.float32) * 0.5
    W2 = RNG.standard_normal((P, K, E, F, G)).astype(np.float32) * 0.5
    y_b2 = ab.gat_evgf_band(jnp.asarray(x), jnp.asarray(a2),
                            jnp.asarray(W2), slab5, w)
    y_d2 = filters.gat_evgf(jnp.asarray(x), jnp.asarray(a2),
                            jnp.asarray(W2), gso_lib.as_gso(S))
    np.testing.assert_allclose(np.asarray(y_b2), np.asarray(y_d2),
                               atol=1e-4, rtol=1e-3)


def test_architecture_attention_mode_band(S):
    """attentionMode='band' on GAT architecture == dense forward+grad."""
    import jax
    from graph_neural_networks_tpu.models import architectures as archs
    kw = dict(nSelectedNodes=[N, N], poolingFunction="NoPool",
              poolingSize=[1, 1], dimLayersMLP=[3], GSO=S, bias=True)
    dense_arch = archs.GraphAttentionNetwork([G, 4, 4], [P, P], "relu",
                                             attentionMode="dense", **kw)
    band_arch = archs.GraphAttentionNetwork([G, 4, 4], [P, P], "relu",
                                            attentionMode="band", **kw)
    params = dense_arch.init(jax.random.PRNGKey(0))
    x = RNG.standard_normal((B, G, N)).astype(np.float32)

    def loss(arch):
        return lambda p: jnp.sum(
            arch.core.apply(p, jnp.asarray(x), arch.ctx)[0] ** 2)

    l_d, g_d = jax.value_and_grad(loss(dense_arch))(params)
    l_b, g_b = jax.value_and_grad(loss(band_arch))(params)
    np.testing.assert_allclose(float(l_b), float(l_d), rtol=1e-4)
    for pd, pb in zip(jax.tree_util.tree_leaves(g_d),
                      jax.tree_util.tree_leaves(g_b)):
        np.testing.assert_allclose(np.asarray(pb), np.asarray(pd),
                                   atol=2e-3, rtol=2e-3)
