"""Unit tests for the host-side graph core (utils.graph).

Each test checks the documented reference semantics (file:line cites in the
module docstrings) against small hand-checkable cases.
"""

import numpy as np
import pytest

from graph_neural_networks_tpu.utils import graph as gt


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="module")
def sbm(rng):
    return gt.create_graph(
        "SBM", 40, {"nCommunities": 4, "probIntra": 0.8, "probInter": 0.2},
        rng=rng)


def test_laplacian_and_normalizations(sbm):
    W = sbm
    L = gt.adjacency_to_laplacian(W)
    assert np.allclose(L.sum(axis=1), 0.0)
    A = gt.normalize_adjacency(W)
    d = W.sum(axis=1)
    assert np.allclose(A, W / np.sqrt(np.outer(d, d)))
    Ln = gt.normalize_laplacian(L)
    assert np.allclose(np.diag(Ln), 1.0)


def test_gft_orders(sbm):
    E, V = gt.compute_gft(sbm, order="totalVariation")
    e = np.diag(E).real
    lam_max = e.max()
    diffs = np.abs(e - lam_max)
    assert np.all(np.diff(diffs) >= -1e-9)  # sorted by |lambda - lambda_max|
    # reconstruction
    assert np.allclose(V @ E @ np.linalg.inv(V), sbm, atol=1e-8)
    E2, _ = gt.compute_gft(sbm, order="increasing")
    e2 = np.abs(np.diag(E2))
    assert np.all(np.diff(e2) >= -1e-9)


def test_matrix_powers(sbm):
    P = gt.matrix_powers(sbm, 4)
    assert P.shape == (4, 40, 40)
    assert np.allclose(P[0], np.eye(40))
    assert np.allclose(P[3], np.linalg.matrix_power(sbm, 3))
    Pb = gt.matrix_powers(sbm[None], 3)
    assert Pb.shape == (1, 3, 40, 40)


def test_neighborhood_matches_bfs(sbm):
    K = 2
    nb_list = gt.compute_neighborhood(sbm, K, output_type="list")
    # brute-force BFS oracle
    A = (sbm > 0).astype(float) + np.eye(40)
    R = np.linalg.matrix_power(A, K) > 0
    for i in range(40):
        assert set(nb_list[i]) == set(np.flatnonzero(R[i]))
    # matrix form pads with self
    nb_mat = gt.compute_neighborhood(sbm, K, n_rows=5, output_type="matrix")
    assert nb_mat.shape[0] == 5
    for i in range(5):
        row = nb_mat[i]
        true = set(np.flatnonzero(R[i]))
        assert set(row.tolist()) <= true | {i}
        assert true <= set(row.tolist())


def test_neighborhood_nb_trim(sbm):
    nb_mat = gt.compute_neighborhood(sbm, 1, n_rows=10, nb=10,
                                     output_type="matrix")
    assert nb_mat.max() < 10


def test_connectivity_and_sparsify(sbm):
    assert gt.is_connected(sbm)
    W2 = sbm.copy()
    W2[0, :] = 0
    W2[:, 0] = 0
    assert not gt.is_connected(W2)
    Ws = gt.sparsify_graph(sbm * np.random.default_rng(1).random((40, 40)),
                           "NN", 3)
    assert gt.is_connected(Ws)


def test_create_sbm_structure(sbm):
    assert sbm.shape == (40, 40)
    assert np.allclose(sbm, sbm.T)
    assert np.allclose(np.diag(sbm), 0)
    assert gt.is_connected(sbm)


def test_create_small_world(rng):
    W = gt.create_graph("SmallWorld", 30,
                        {"probEdge": 0.2, "probRewiring": 0.1}, rng=rng)
    assert W.shape == (30, 30)
    assert np.allclose(W, W.T)
    assert gt.is_connected(W)


def test_fuse_edges(rng):
    stack = rng.random((3, 20, 20))
    stack = (stack + stack.transpose(0, 2, 1)) / 2
    for s in stack:
        np.fill_diagonal(s, 0)
    node_list = []
    W = gt.create_graph("fuseEdges", 20, {
        "adjacencyMatrices": stack, "aggregationType": "sum",
        "normalizationType": "no", "isolatedNodes": True,
        "forceUndirected": True, "forceConnected": True,
        "nodeList": node_list})
    assert np.allclose(W, W.T)
    assert len(node_list) == W.shape[0]


def test_perm_degree(sbm):
    Sp, order = gt.perm_degree(sbm)
    deg = sbm.sum(axis=(0,)) if sbm.ndim == 2 else None
    deg = sbm.sum(axis=1)
    assert np.all(np.diff(deg[order]) <= 1e-12)
    # permutation consistency: Sp = S[order][:, order]
    assert np.allclose(Sp, sbm[np.ix_(order, order)])


def test_perm_identity_and_eds(sbm):
    Sp, order = gt.perm_identity(sbm)
    assert order == list(range(40))
    assert np.allclose(Sp, sbm)
    Sp, order = gt.perm_eds(sbm)
    assert sorted(order) == list(range(40))
    assert np.allclose(Sp, sbm[np.ix_(order, order)])


def test_perm_spectral_proxies(sbm):
    Sp, order = gt.perm_spectral_proxies(sbm)
    assert sorted(order) == list(range(40))
    assert np.allclose(Sp, sbm[np.ix_(order, order)])


def test_permutation_registry():
    assert gt.permutation_by_name("Degree") is gt.perm_degree
    assert gt.permutation_by_name(None) is gt.perm_identity
    with pytest.raises(ValueError):
        gt.permutation_by_name("Bogus")


def test_edge_fail_sampling(sbm, rng):
    W = gt.edge_fail_sampling(sbm, 0.5, rng=rng)
    assert np.allclose(W, W.T)
    assert (W > 0).sum() < (sbm > 0).sum()
    assert np.all((W > 0) <= (sbm > 0))


def test_graph_container(rng):
    G = gt.Graph("SBM", 30,
                 {"nCommunities": 3, "probIntra": 0.8, "probInter": 0.2},
                 rng=rng)
    assert G.N == 30 and G.undirected and not G.self_loops
    assert G.L is not None
    G.compute_gft()
    assert G.E is not None and G.V.shape == (30, 30)
    S = gt.normalize_adjacency(G.W)
    G.set_gso(S, gft="totalVariation")
    assert np.allclose(G.S, S)


def test_source_nodes(sbm):
    srcs = gt.compute_source_nodes(sbm, 4)
    assert len(srcs) == 4
    assert len(set(srcs)) == 4


def test_spline_basis():
    B = gt.spline_basis(5, 20)
    assert B.shape == (20, 5)
    # partition of unity in the interior for clamped cubic B-splines
    assert np.allclose(B.sum(axis=1), 1.0, atol=1e-8)


def test_coarsening(rng):
    W = gt.create_graph(
        "SBM", 24, {"nCommunities": 2, "probIntra": 0.8, "probInter": 0.2},
        rng=rng)
    graphs, order = gt.coarsen(W, levels=2, rng=rng)
    assert len(graphs) == 3
    N0 = graphs[0].shape[0]
    assert N0 >= 24 and N0 % 4 == 0
    assert graphs[1].shape[0] == N0 // 2
    assert graphs[2].shape[0] == N0 // 4
    x = rng.random((2, 3, 24))
    xp = gt.pad_coarsened_data(x, order)
    assert xp.shape == (2, 3, N0)
    # every original value appears exactly once
    assert np.allclose(np.sort(xp.ravel())[-x.size:], np.sort(x.ravel()))


def test_compute_nonzero_rows(sbm):
    rows = gt.compute_nonzero_rows(sbm, n_rows=5)
    assert len(rows) == 5
    for i, r in enumerate(rows):
        assert set(r) == set(np.flatnonzero(np.abs(sbm[i]) > 1e-9))
