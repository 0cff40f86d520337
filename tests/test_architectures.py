"""Architecture zoo smoke + contract tests: init, forward shapes,
split_forward, changeGSO, single_node_forward, parameter shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_neural_networks_tpu.models import architectures as archs
from graph_neural_networks_tpu.models import architectures_time as archt
from graph_neural_networks_tpu.utils import graph as gt

RNG = np.random.default_rng(11)
N, B = 24, 3


@pytest.fixture(scope="module")
def gso():
    W = gt.create_graph("SBM", N, {"nCommunities": 3, "probIntra": 0.8,
                                   "probInter": 0.2},
                        rng=np.random.default_rng(0))
    return W / np.max(np.abs(np.linalg.eigvalsh(W)))


@pytest.fixture(scope="module")
def x():
    return RNG.standard_normal((B, 1, N)).astype(np.float32)


def _check(arch, x, out_shape, key=0):
    params = arch.init(jax.random.PRNGKey(key))
    y = arch.apply(params, x)
    assert y.shape == out_shape, (y.shape, out_shape)
    assert np.all(np.isfinite(np.asarray(y)))
    return params, y


def test_selection_gnn(gso, x):
    arch = archs.SelectionGNN([1, 4, 8], [3, 3], True, "relu", [16, 8],
                              "MaxPoolLocal", [2, 2], [5], gso,
                              order="Degree")
    params, y = _check(arch, x, (B, 5))
    out, y_gfl = arch.split_forward(params, x)
    assert y_gfl.shape == (B, 8, 8)
    np.testing.assert_allclose(out, y, atol=1e-6)


def test_selection_gnn_no_pool(gso, x):
    arch = archs.SelectionGNN([1, 4], [3], True, "relu", [N], "NoPool", [1],
                              [5], gso)
    _check(arch, x, (B, 5))


def test_selection_gnn_change_gso(gso, x):
    arch = archs.SelectionGNN([1, 4], [3], True, "relu", [N], "NoPool", [1],
                              [5], gso, order="Degree")
    params, y1 = _check(arch, x, (B, 5))
    # new graph, same size
    W2 = gt.create_graph("SBM", N, {"nCommunities": 2, "probIntra": 0.8,
                                    "probInter": 0.2},
                         rng=np.random.default_rng(5))
    arch.changeGSO(W2 / np.max(np.abs(np.linalg.eigvalsh(W2))))
    y2 = arch.apply(params, x)
    assert y2.shape == (B, 5)
    assert not np.allclose(y1, y2)


def test_selection_gnn_band_mode(gso, x):
    """gsoMode='band' routes the shifts through the trainable Pallas path;
    forward matches dense (interpret mode on CPU)."""
    from jax.experimental.pallas import tpu as pltpu
    arch_d = archs.SelectionGNN([1, 4], [3], True, "relu", [N], "NoPool",
                                [1], [5], gso)
    params = arch_d.init(jax.random.PRNGKey(0))
    want = np.asarray(arch_d.apply(params, x))
    with pltpu.force_tpu_interpret_mode():
        arch_b = archs.SelectionGNN([1, 4], [3], True, "relu", [N], "NoPool",
                                    [1], [5], gso, gsoMode="band")
        got = np.asarray(arch_b.apply(params, x))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_selection_gnn_coarsening(gso, x):
    arch = archs.SelectionGNN([1, 4, 8], [3, 3], True, "relu", [0, 0],
                              "MaxPoolLocal", [2, 2], [5], gso,
                              coarsening=True, rng=np.random.default_rng(1))
    _check(arch, x, (B, 5))


def test_local_activation_gnn_max(gso, x):
    arch = archs.LocalActivationGNN([1, 4], [3], True, "max_local", [2],
                                    [N], "NoPool", [1], [5], gso,
                                    order="Degree")
    _check(arch, x, (B, 5))


def test_local_activation_gnn_median(gso, x):
    arch = archs.LocalActivationGNN([1, 4], [3], True, "median_local", [1],
                                    [N], "NoPool", [1], [5], gso)
    _check(arch, x, (B, 5))


def test_local_gnn_and_single_node(gso, x):
    arch = archs.LocalGNN([1, 4], [3], True, "relu", [N], "NoPool", [1],
                          [3], gso, order="Degree")
    params, y = _check(arch, x, (B, 3, N))
    ysn = arch.single_node_forward(params, x, 5)
    assert ysn.shape == (B, 3)
    # consistency: output at permuted position of node 5
    pos = arch.order.index(5)
    np.testing.assert_allclose(ysn, np.asarray(y)[:, :, pos], atol=1e-6)


def test_spectral_gnn(gso, x):
    arch = archs.SpectralGNN([1, 4], [N], True, "relu", [N], "NoPool", [1],
                             [5], gso)
    _check(arch, x, (B, 5))


def test_spectral_gnn_spline(gso, x):
    arch = archs.SpectralGNN([1, 4], [8], True, "relu", [N], "NoPool", [1],
                             [5], gso)
    _check(arch, x, (B, 5))


def test_node_variant_gnn(gso, x):
    arch = archs.NodeVariantGNN([1, 4], [3], [10], True, "relu", [N],
                                "NoPool", [1], [5], gso, order="Degree")
    params, _ = _check(arch, x, (B, 5))
    w = params["params"]["NodeVariantGF_0"]["weight"]
    assert w.shape == (4, 1, 3, 1, 10)


def test_edge_variant_gnn(gso, x):
    arch = archs.EdgeVariantGNN([1, 4], [3], [10], True, "relu", [N],
                                "NoPool", [1], [5], gso, order="Degree")
    params, _ = _check(arch, x, (B, 5))
    assert "weightLSI" in params["params"]["EdgeVariantGF_0"]


def test_local_edge_net(gso, x):
    arch = archs.LocalEdgeNet([1, 4], [3], [N], True, "relu", [N], "NoPool",
                              [1], [3], gso)
    _check(arch, x, (B, 3, N))


def test_arma_gnn(gso, x):
    arch = archs.ARMAfilterGNN([1, 4], [2], [3], True, "relu", [N], "NoPool",
                               [1], [5], gso, tMax=3)
    _check(arch, x, (B, 5))


def test_local_arma(gso, x):
    arch = archs.LocalARMA([1, 4], [2], [3], True, "relu", [N], "NoPool",
                           [1], [3], gso, tMax=3)
    _check(arch, x, (B, 3, N))


def test_aggregation_gnn(gso, x):
    arch = archs.AggregationGNN([1, 4, 8], [3, 3], True, "relu",
                                "MaxPoolLocal", [2, 2], [5], gso,
                                order="Degree", maxN=16)
    _check(arch, x, (B, 5))


def test_multinode_aggregation_gnn(gso, x):
    arch = archs.MultiNodeAggregationGNN(
        [4, 2], [8, 6], [[1, 4], [4, 8], [8]], [[3], [3]], True, "relu",
        "MaxPoolLocal", [[2], [2]], [5], gso, order="Degree")
    params = arch.init(jax.random.PRNGKey(0))
    y = arch.apply(params, x)
    assert y.shape == (B, 5)


def test_gat(gso, x):
    arch = archs.GraphAttentionNetwork([1, 4, 8], [3, 2], "relu", [N, N],
                                       "NoPool", [1, 1], [5], True, gso)
    _check(arch, x, (B, 5))


def test_gcat(gso, x):
    arch = archs.GraphConvolutionAttentionNetwork(
        [1, 4], [3], [2], True, "relu", [N], "NoPool", [1], [5], gso)
    _check(arch, x, (B, 5))


def test_edge_variant_attention(gso, x):
    arch = archs.EdgeVariantAttention([1, 4], [2], [2], True, "relu", [N],
                                      "NoPool", [1], [5], gso)
    _check(arch, x, (B, 5))


T = 4


def test_graph_recurrent_nn(gso):
    arch = archs.GraphRecurrentNN(1, 2, 6, [3, 3], True, "tanh", "relu",
                                  "relu", [2], gso)
    params = arch.init(jax.random.PRNGKey(0), T=T)
    xt = RNG.standard_normal((B, T, 1, N)).astype(np.float32)
    y = arch.apply(params, xt, rng=jax.random.PRNGKey(1))
    assert y.shape == (B, T, 2, N)
    ysn = arch.single_node_forward(params, xt, 3, rng=jax.random.PRNGKey(1))
    assert ysn.shape == (B, T, 2)


@pytest.mark.parametrize("gate", ["time", "node", "edge"])
def test_gated_graph_recurrent_nn(gso, gate):
    arch = archs.GatedGraphRecurrentNN(1, 2, 4, [2, 2], True, "tanh", "relu",
                                       "relu", [2], gso, gateType=gate)
    params = arch.init(jax.random.PRNGKey(0), T=T)
    xt = RNG.standard_normal((B, T, 1, N)).astype(np.float32)
    y = arch.apply(params, xt, rng=jax.random.PRNGKey(1))
    assert y.shape == (B, T, 2, N)


def _time_S(gso):
    S = np.broadcast_to(gso, (B, T, N, N)).copy()
    return S[:, :, None]  # B x T x 1 x N x N


def test_local_gnn_db(gso):
    arch = archt.LocalGNN_DB([1, 4], [3], True, "tanh", [2], 1)
    params = arch.init(jax.random.PRNGKey(0), N=N, T=T)
    xt = RNG.standard_normal((B, T, 1, N)).astype(np.float32)
    y = arch.apply(params, xt, _time_S(gso))
    assert y.shape == (B, T, 2, N)
    ysn = arch.single_node_forward(params, xt, _time_S(gso), 0)
    assert ysn.shape == (B, T, 2)


def test_graph_recurrent_nn_db(gso):
    arch = archt.GraphRecurrentNN_DB(1, 2, 4, [2, 2], True, "tanh", "relu",
                                     "relu", [2], 1)
    params = arch.init(jax.random.PRNGKey(0), N=N, T=T)
    xt = RNG.standard_normal((B, T, 1, N)).astype(np.float32)
    y = arch.apply(params, xt, _time_S(gso), rng=jax.random.PRNGKey(2))
    assert y.shape == (B, T, 2, N)


def test_aggregation_gnn_db(gso):
    arch = archt.AggregationGNN_DB([1, 4, 8], [3, 2], True, "relu",
                                   "MaxPoolLocal", [2, 2], [2], 1,
                                   nExchanges=12)
    params = arch.init(jax.random.PRNGKey(0), N=N, T=T)
    xt = RNG.standard_normal((B, T, 1, N)).astype(np.float32)
    y = arch.apply(params, xt, _time_S(gso))
    assert y.shape == (B, T, 2, N)


def test_selection_gnn_edge_mode(gso, x):
    """gsoMode='edge' (COO gather/segment-sum shifts) == dense forward."""
    arch_d = archs.SelectionGNN([1, 4], [3], True, "relu", [N], "NoPool",
                                [1], [5], gso)
    params = arch_d.init(jax.random.PRNGKey(0))
    want = np.asarray(arch_d.apply(params, x))
    arch_e = archs.SelectionGNN([1, 4], [3], True, "relu", [N], "NoPool",
                                [1], [5], gso, gsoMode="edge")
    got = np.asarray(arch_e.apply(params, x))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("mode", ["edge", "band"])
def test_grnn_sparse_modes_match_dense(gso, mode):
    """GraphRecurrentNN with sparse GSO modes == dense, forward + grads."""
    from jax.experimental.pallas import tpu as pltpu
    import contextlib
    xt = RNG.standard_normal((2, 4, 1, N)).astype(np.float32)

    def build(m):
        return archs.GraphRecurrentNN(1, 2, 6, [3, 3], True, "tanh", "relu",
                                      "relu", [2], gso, gsoMode=m)
    dense = build("dense")
    params = dense.init(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(7)

    def loss_of(arch):
        def f(p):
            return jnp.sum(arch.apply(p, xt, rng=rng) ** 2)
        return f

    l_d, g_d = jax.value_and_grad(loss_of(dense))(params)
    cm = (pltpu.force_tpu_interpret_mode() if mode == "band"
          else contextlib.nullcontext())
    with cm:
        sparse = build(mode)
        l_s, g_s = jax.value_and_grad(loss_of(sparse))(params)
    np.testing.assert_allclose(float(l_s), float(l_d), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_d),
                    jax.tree_util.tree_leaves(g_s)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("gate", ["time", "node", "edge"])
def test_gated_grnn_edge_mode_matches_dense(gso, gate):
    """GatedGraphRecurrentNN with gsoMode='edge' == dense for every gate
    type — including the per-edge gated SpMM path (no N x N gate)."""
    xt = RNG.standard_normal((2, 3, 1, N)).astype(np.float32)

    def build(m):
        return archs.GatedGraphRecurrentNN(1, 2, 5, [2, 2], True, "tanh",
                                           "relu", "relu", [2], gso,
                                           gateType=gate, gsoMode=m)
    dense = build("dense")
    params = dense.init(jax.random.PRNGKey(1))
    rng = jax.random.PRNGKey(3)

    def loss_of(arch):
        def f(p):
            return jnp.sum(arch.apply(p, xt, rng=rng) ** 2)
        return f

    l_d, g_d = jax.value_and_grad(loss_of(dense))(params)
    l_e, g_e = jax.value_and_grad(loss_of(build("edge")))(params)
    np.testing.assert_allclose(float(l_e), float(l_d), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_d),
                    jax.tree_util.tree_leaves(g_e)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-3, rtol=2e-3)


def test_edge_variant_edge_mode_matches_dense(gso, x):
    """EdgeVariantGF with edge-list weights (O(nnz) params) == the masked
    dense (F,E,K,G,N,N) layout, with the edge params scattered into the
    dense layout."""
    from graph_neural_networks_tpu.models import layers as gll
    from graph_neural_networks_tpu.ops import gso as gso_lib
    from graph_neural_networks_tpu.utils import graph as gtl
    F, G, K, M = 3, 1, 3, N  # full edge-variant (no hybrid part)
    S = gso[None] if gso.ndim == 2 else gso
    E = S.shape[0]
    ide, pat = gtl.ev_sparsity_pattern(S, M)
    support = pat.sum(0) > 0
    row, col = np.nonzero(support)
    valid = pat[:, row, col]
    diag = np.einsum("enn->en", ide)

    layer_e = gll.EdgeVariantGF(G, F, K, M, N, E, True)
    pe = layer_e.init(jax.random.PRNGKey(0), jnp.asarray(x),
                      gso_lib.as_gso(S), jnp.asarray(diag, jnp.float32),
                      (jnp.asarray(row, np.int32), jnp.asarray(col, np.int32),
                       jnp.asarray(valid, jnp.float32)))
    y_e = layer_e.apply(pe, jnp.asarray(x), gso_lib.as_gso(S),
                        jnp.asarray(diag, jnp.float32),
                        (jnp.asarray(row, np.int32),
                         jnp.asarray(col, np.int32),
                         jnp.asarray(valid, jnp.float32)))

    # scatter the edge params into the dense layout
    w0 = np.asarray(pe["params"]["weightEV0"])        # F,E,G,N
    wk = np.asarray(pe["params"]["weightEVk"])        # F,E,K-1,G,nnz
    bias = np.asarray(pe["params"]["bias"])
    wEV = np.zeros((F, E, K, G, N, N), np.float32)
    wEV[:, :, 0, :, np.arange(N), np.arange(N)] = \
        np.moveaxis(w0, -1, 0)                        # N,F,E,G at diag
    for k in range(K - 1):
        wEV[:, :, k + 1, :, row, col] = np.moveaxis(wk[:, :, k], -1, 0)
    layer_d = gll.EdgeVariantGF(G, F, K, M, N, E, True)
    pd = {"params": {"weightEV": jnp.asarray(wEV),
                     "bias": jnp.asarray(bias)}}
    y_d = layer_d.apply(pd, jnp.asarray(x), gso_lib.as_gso(S),
                        jnp.asarray(ide, jnp.float32),
                        jnp.asarray(pat, jnp.float32))
    np.testing.assert_allclose(np.asarray(y_e), np.asarray(y_d),
                               atol=1e-4, rtol=1e-4)


def test_edge_variant_gnn_edge_mode(gso, x):
    """EdgeVariantGNN(evMode='edge') end-to-end: O(nnz) parameter count,
    finite forward, gradients flow."""
    arch = archs.EdgeVariantGNN([1, 4], [3], [N], True, "relu", [N],
                                "NoPool", [1], [5], gso, evMode="edge")
    params = arch.init(jax.random.PRNGKey(0))
    n_par = arch.parameter_count(params)
    nnz = int((np.abs(gso) + np.eye(N) > 1e-9).sum())
    assert n_par < 4 * 1 * 3 * (nnz + N) + 1000  # O(nnz), not O(N^2)*K
    y = arch.apply(params, x)
    assert y.shape == (B, 5) and np.all(np.isfinite(np.asarray(y)))
    g = jax.grad(lambda p: jnp.sum(arch.core.apply(
        p, jnp.asarray(x), arch.ctx)[0] ** 2))(params)
    assert all(np.all(np.isfinite(np.asarray(le)))
               for le in jax.tree_util.tree_leaves(g))


def test_selection_gnn_coarsening_pooling_size(gso, x):
    """Coarsening honors per-layer poolingSize: alpha=4 consumes two
    binary levels at once, and pooling by 4 == pooling by 2 twice over the
    nested binary-tree order (divergence from the reference, which forces
    alpha=2; architectures.py:246-248)."""
    arch4 = archs.SelectionGNN([1, 4, 8], [3, 3], True, "relu", [0, 0],
                               "MaxPoolLocal", [4, 2], [5], gso,
                               coarsening=True, rng=np.random.default_rng(2))
    assert arch4.N[1] * 4 == arch4.N[0]
    assert arch4.N[2] * 2 == arch4.N[1]
    params, y = _check(arch4, x, (B, 5))

    # alpha=1: no pooling at that layer
    arch1 = archs.SelectionGNN([1, 4], [3], True, "relu", [0],
                               "MaxPoolLocal", [1], [5], gso,
                               coarsening=True, rng=np.random.default_rng(2))
    assert arch1.N[1] == arch1.N[0]
    _check(arch1, x, (B, 5))

    with pytest.raises(AssertionError):
        archs.SelectionGNN([1, 4], [3], True, "relu", [0], "MaxPoolLocal",
                           [3], [5], gso, coarsening=True,
                           rng=np.random.default_rng(2))
