"""Permutation-equivariance property tests: relabeling nodes commutes with
filtering — the mathematical foundation of the GSP framework (and of the
changeGSO transferability contract)."""

import numpy as np
import jax.numpy as jnp
import pytest

from graph_neural_networks_tpu.ops import filters, gso as gso_lib
from graph_neural_networks_tpu.utils import graph as gt

RNG = np.random.default_rng(31)
B, G, F, E, K, N = 2, 2, 3, 1, 3, 16


@pytest.fixture(scope="module")
def setup():
    W = gt.create_graph("SBM", N, {"nCommunities": 2, "probIntra": 0.7,
                                   "probInter": 0.2},
                        rng=np.random.default_rng(2))
    S = (W / np.max(np.abs(np.linalg.eigvalsh(W))))[None]
    x = RNG.standard_normal((B, G, N))
    perm = np.random.default_rng(3).permutation(N)
    S_p = S[:, perm][:, :, perm]
    x_p = x[:, :, perm]
    return S, x, S_p, x_p, perm


def test_lsigf_equivariant(setup):
    S, x, S_p, x_p, perm = setup
    h = RNG.standard_normal((F, E, K, G))
    y = np.asarray(filters.lsigf(jnp.asarray(h, jnp.float32),
                                 gso_lib.as_gso(S),
                                 jnp.asarray(x, jnp.float32)))
    y_p = np.asarray(filters.lsigf(jnp.asarray(h, jnp.float32),
                                   gso_lib.as_gso(S_p),
                                   jnp.asarray(x_p, jnp.float32)))
    np.testing.assert_allclose(y_p, y[:, :, perm], atol=1e-5, rtol=1e-4)


def test_graph_attention_equivariant(setup):
    S, x, S_p, x_p, perm = setup
    P = 2
    a = RNG.standard_normal((P, E, 2 * F)) * 0.5
    W = RNG.standard_normal((P, E, F, G)) * 0.5
    j = lambda v: jnp.asarray(v, jnp.float32)
    y = np.asarray(filters.graph_attention(j(x), j(a), j(W),
                                           gso_lib.as_gso(S)))
    y_p = np.asarray(filters.graph_attention(j(x_p), j(a), j(W),
                                             gso_lib.as_gso(S_p)))
    np.testing.assert_allclose(y_p, y[..., perm], atol=1e-4, rtol=1e-3)


def test_jarma_equivariant(setup):
    S, x, S_p, x_p, perm = setup
    P = 2
    psi = RNG.standard_normal((F, E, P, G)) * 0.3
    varphi = RNG.standard_normal((F, E, P, G))
    phi = RNG.standard_normal((F, E, K, G))
    j = lambda v: jnp.asarray(v, jnp.float32)
    y = np.asarray(filters.jarma(j(psi), j(varphi), j(phi),
                                 gso_lib.as_gso(S), j(x), t_max=3))
    y_p = np.asarray(filters.jarma(j(psi), j(varphi), j(phi),
                                   gso_lib.as_gso(S_p), j(x_p), t_max=3))
    np.testing.assert_allclose(y_p, y[..., perm], atol=1e-3, rtol=1e-2)


def test_gated_grnn_equivariant(setup):
    S, x, S_p, x_p, perm = setup
    H, T = 3, 4
    a = RNG.standard_normal((H, E, K, G)) * 0.3
    bt = RNG.standard_normal((H, E, K, H)) * 0.3
    xt = RNG.standard_normal((B, T, G, N))
    z0 = RNG.standard_normal((B, H, N))
    j = lambda v: jnp.asarray(v, jnp.float32)
    y = np.asarray(filters.gated_grnn(j(a), j(bt), gso_lib.as_gso(S), j(xt),
                                      j(z0), jnp.tanh))
    y_p = np.asarray(filters.gated_grnn(j(a), j(bt), gso_lib.as_gso(S_p),
                                        j(xt[..., perm]), j(z0[..., perm]),
                                        jnp.tanh))
    np.testing.assert_allclose(y_p, y[..., perm], atol=1e-4, rtol=1e-3)


def test_node_variant_not_equivariant_but_consistent(setup):
    """NVGF is deliberately NOT permutation-equivariant (per-node taps);
    permuting taps along with everything else IS consistent."""
    S, x, S_p, x_p, perm = setup
    h = RNG.standard_normal((F, E, K, G, N))
    j = lambda v: jnp.asarray(v, jnp.float32)
    y = np.asarray(filters.nvgf(j(h), gso_lib.as_gso(S), j(x)))
    y_p = np.asarray(filters.nvgf(j(h[..., perm]), gso_lib.as_gso(S_p),
                                  j(x_p)))
    np.testing.assert_allclose(y_p, y[..., perm], atol=1e-5, rtol=1e-4)


def test_lsigf_equivariant_sparse_modes(setup):
    """Equivariance holds through every sparse GSO container: the same
    filter on a relabeled graph gives relabeled outputs for the edge-list
    (COO) and bcsr paths too."""
    from jax.experimental.pallas import tpu as pltpu
    from graph_neural_networks_tpu.ops import attention_sparse as asp
    S, x, S_p, x_p, perm = setup
    h = jnp.asarray(RNG.standard_normal((F, E, K, G)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        for make in (asp.build_edge_list,
                     lambda s: gso_lib.as_gso(s, mode="bcsr", block_size=8)):
            y = np.asarray(filters.lsigf(h, make(S),
                                         jnp.asarray(x, jnp.float32)))
            y_p = np.asarray(filters.lsigf(h, make(S_p),
                                           jnp.asarray(x_p, jnp.float32)))
            np.testing.assert_allclose(y_p, y[:, :, perm], atol=1e-4,
                                       rtol=1e-4)


def test_edge_attention_equivariant(setup):
    """Edge-list attention path is permutation-equivariant."""
    from graph_neural_networks_tpu.ops import attention_sparse as asp
    S, x, S_p, x_p, perm = setup
    P = 2
    a = RNG.standard_normal((P, E, 2 * F)) * 0.5
    W = RNG.standard_normal((P, E, F, G)) * 0.5
    j = lambda v: jnp.asarray(v, jnp.float32)
    y = np.asarray(filters.graph_attention(j(x), j(a), j(W),
                                           asp.build_edge_list(S)))
    y_p = np.asarray(filters.graph_attention(j(x_p), j(a), j(W),
                                             asp.build_edge_list(S_p)))
    np.testing.assert_allclose(y_p, y[..., perm], atol=1e-4, rtol=1e-3)


def test_gcat_equivariant_all_modes(setup):
    """GCAT (gat_lsigf) is permutation-equivariant on the dense, band and
    edge-list attention paths (the band path's bandwidth adapts to the
    relabeled graph)."""
    from graph_neural_networks_tpu.ops import attention_sparse as asp
    S, x, S_p, x_p, perm = setup
    P = 2
    h = RNG.standard_normal((E, K)) * 0.5
    a = RNG.standard_normal((P, E, 2 * F)) * 0.5
    W = RNG.standard_normal((P, E, F, G)) * 0.5
    j = lambda v: jnp.asarray(v, jnp.float32)
    for make in (gso_lib.as_gso,
                 lambda s: gso_lib.as_gso(s, mode="band"),
                 asp.build_edge_list):
        y = np.asarray(filters.gat_lsigf(j(h), j(x), j(a), j(W), make(S)))
        y_p = np.asarray(filters.gat_lsigf(j(h), j(x_p), j(a), j(W),
                                           make(S_p)))
        np.testing.assert_allclose(y_p, y[..., perm], atol=1e-4, rtol=1e-3)


def test_gat_evgf_equivariant(setup):
    """Attention-parameterized EVGF is permutation-equivariant (dense and
    band modes)."""
    S, x, S_p, x_p, perm = setup
    P = 2
    a = RNG.standard_normal((P, K, E, 2 * F)) * 0.5
    W = RNG.standard_normal((P, K, E, F, G)) * 0.5
    j = lambda v: jnp.asarray(v, jnp.float32)
    for make in (gso_lib.as_gso, lambda s: gso_lib.as_gso(s, mode="band")):
        y = np.asarray(filters.gat_evgf(j(x), j(a), j(W), make(S)))
        y_p = np.asarray(filters.gat_evgf(j(x_p), j(a), j(W), make(S_p)))
        np.testing.assert_allclose(y_p, y[..., perm], atol=1e-4, rtol=1e-3)


def test_band_attention_equivariant(setup):
    """Band-mode GAT attention is permutation-equivariant."""
    S, x, S_p, x_p, perm = setup
    P = 2
    a = RNG.standard_normal((P, E, 2 * F)) * 0.5
    W = RNG.standard_normal((P, E, F, G)) * 0.5
    j = lambda v: jnp.asarray(v, jnp.float32)
    band = lambda s: gso_lib.as_gso(s, mode="band")
    y = np.asarray(filters.graph_attention(j(x), j(a), j(W), band(S)))
    y_p = np.asarray(filters.graph_attention(j(x_p), j(a), j(W), band(S_p)))
    np.testing.assert_allclose(y_p, y[..., perm], atol=1e-4, rtol=1e-3)


def test_evgf_edges_equivariant(setup):
    """Edge-list EVGF: permuting nodes + permuting the per-edge weights
    accordingly commutes with filtering."""
    S, x, S_p, x_p, perm = setup
    ide, pat = gt.ev_sparsity_pattern(S, None)
    row, col = np.nonzero(pat.sum(0) > 0)
    w0 = RNG.standard_normal((F, E, G, N)) * 0.3
    wk = RNG.standard_normal((F, E, K - 1, G, len(row))) * 0.3
    j = lambda v: jnp.asarray(v, jnp.float32)
    y = np.asarray(filters.evgf_edges(
        j(w0), j(wk), jnp.asarray(row, np.int32), jnp.asarray(col, np.int32),
        j(x)))
    # permuted graph: same edges under relabeling, weights carried over
    inv = np.empty(N, np.int64)
    inv[perm] = np.arange(N)
    row_p, col_p = inv[row], inv[col]
    w0_p = w0[..., perm]
    y_p = np.asarray(filters.evgf_edges(
        j(w0_p), j(wk), jnp.asarray(row_p, np.int32),
        jnp.asarray(col_p, np.int32), j(x_p)))
    np.testing.assert_allclose(y_p, y[..., perm], atol=1e-4, rtol=1e-4)
