"""Native graphcore library: parity vs the pure-python fallbacks."""

import os
import subprocess

import numpy as np
import pytest

from graph_neural_networks_tpu.utils import native
from graph_neural_networks_tpu.utils import graph as gt
from graph_neural_networks_tpu.ops import spmm

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libgraphcore.so not built")

RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def W():
    return gt.create_graph("SBM", 50, {"nCommunities": 4, "probIntra": 0.7,
                                       "probInter": 0.1},
                           rng=np.random.default_rng(1))


def _python_env():
    env = dict(os.environ)
    env["GNT_NO_NATIVE"] = "1"
    return env


def test_bfs_matches_python(W):
    for K in (1, 2, 3):
        for nb in (50, 20):
            os.environ["GNT_NO_NATIVE"] = "1"
            try:
                py = gt.compute_neighborhood(W, K, nb=nb, output_type="list")
            finally:
                del os.environ["GNT_NO_NATIVE"]
            nat = gt.compute_neighborhood(W, K, nb=nb, output_type="list")
            for a, b in zip(py, nat):
                assert np.array_equal(np.sort(a), np.sort(b)), (K, nb)


def test_bfs_matrix_self_padding(W):
    tbl = gt.compute_neighborhood(W, 2, n_rows=10, output_type="matrix")
    os.environ["GNT_NO_NATIVE"] = "1"
    try:
        tbl_py = gt.compute_neighborhood(W, 2, n_rows=10,
                                         output_type="matrix")
    finally:
        del os.environ["GNT_NO_NATIVE"]
    # same set per row (padding may differ in position but is the self idx)
    for i in range(10):
        assert set(tbl[i].tolist()) == set(tbl_py[i].tolist())


def test_bcsr_matches_python(W):
    S = (W * RNG.random((50, 50))).astype(np.float32)
    b_n, r_n, c_n = spmm.dense_to_bcsr(S, 16)
    os.environ["GNT_NO_NATIVE"] = "1"
    try:
        b_p, r_p, c_p = spmm.dense_to_bcsr(S, 16)
    finally:
        del os.environ["GNT_NO_NATIVE"]
    np.testing.assert_array_equal(r_n, r_p)
    np.testing.assert_array_equal(c_n, c_p)
    np.testing.assert_allclose(b_n, b_p, atol=1e-7)


def test_band_matches_python():
    N = 96
    S = np.zeros((N, N), np.float32)
    ii = RNG.integers(0, N, 300)
    jj = ii + RNG.integers(-20, 21, 300)
    ok = (jj >= 0) & (jj < N)
    S[ii[ok], jj[ok]] = RNG.random(ok.sum())
    sb_n, w_n = spmm.dense_to_band(S, 16)
    os.environ["GNT_NO_NATIVE"] = "1"
    try:
        sb_p, w_p = spmm.dense_to_band(S, 16)
    finally:
        del os.environ["GNT_NO_NATIVE"]
    assert w_n == w_p
    np.testing.assert_allclose(sb_n, sb_p, atol=1e-7)


def test_graclus_coarsen_native(W):
    graphs, order = gt.coarsen(W, levels=2, rng=np.random.default_rng(2))
    N0 = graphs[0].shape[0]
    assert graphs[1].shape[0] == N0 // 2
    assert graphs[2].shape[0] == N0 // 4
    x = RNG.random((2, 1, 50))
    xp = gt.pad_coarsened_data(x, order)
    assert np.allclose(np.sort(xp.ravel())[-x.size:], np.sort(x.ravel()))
