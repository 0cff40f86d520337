"""Data layer tests: dataset contracts, metrics, and the flocking physics."""

import numpy as np
import pytest

from graph_neural_networks_tpu import data as D
from graph_neural_networks_tpu.utils import graph as gt

REF_DATASETS = "/root/reference/datasets"


@pytest.fixture(scope="module")
def G():
    return gt.Graph("SBM", 30, {"nCommunities": 3, "probIntra": 0.8,
                                "probInter": 0.2},
                    rng=np.random.default_rng(0))


def test_base_helpers():
    x = np.random.default_rng(0).random((10, 4))
    xn = D.normalize_data(x, 0)
    assert np.allclose(xn.mean(0), 0, atol=1e-9)
    assert np.allclose(xn.std(0), 1, atol=1e-9)
    inv = D.invert_tensor_ew(np.array([2.0, 0.0, -4.0]))
    assert np.allclose(inv, [0.5, 0.0, -0.25])


def test_source_localization(G):
    srcs = gt.compute_source_nodes(G.A, 3)
    data = D.SourceLocalization(G, 40, 10, 10, srcs, tMax=8,
                                rng=np.random.default_rng(1))
    x, y = data.getSamples("train")
    assert x.shape == (40, 30) and y.shape == (40,)
    assert set(np.unique(y)) <= {0, 1, 2}
    data.expandDims()
    x, _ = data.getSamples("train", 5)
    assert x.shape == (5, 1, 30)
    # evaluate: error rate
    yHat = np.zeros((10, 3))
    _, yt = data.getSamples("test")
    yHat[np.arange(10), yt] = 1.0
    assert data.evaluate(yHat, yt) == 0.0
    yHat2 = np.roll(yHat, 1, axis=1)
    assert data.evaluate(yHat2, yt) == 1.0


def test_authorship_synthetic():
    data = D.Authorship("poe", 0.8, 0.1, rng=np.random.default_rng(2))
    x, y = data.getSamples("train")
    assert x.shape[1] == 64
    assert set(np.unique(y)) == {0, 1}
    W = data.createGraph()
    assert gt.is_connected(W)
    x2, _ = data.getSamples("train")
    assert x2.shape[1] == W.shape[0]


def test_movielens_synthetic():
    data = D.MovieLens("movie", 25, 0.8, 0.1, kNN=8,
                       rng=np.random.default_rng(3))
    W = data.getGraph()
    assert W.shape[0] == data.samples["train"]["signals"].shape[1]
    assert gt.is_connected(W)
    x, y = data.getSamples("train")
    lid = data.getLabelID("train")
    assert np.all(x[np.arange(len(x)), lid] == 0)  # target zeroed
    assert np.all(y > 0)
    rmse = data.evaluate(y + 1.0, y)
    assert np.isclose(rmse, 1.0)


def test_epidemics_reference_graph():
    data = D.Epidemics(4, 0.05, 0.3, 4, 20, 5, 5, data_dir=REF_DATASETS,
                       rng=np.random.default_rng(4))
    assert data.N > 100  # real SocioPatterns graph
    x, y = data.getSamples("train")
    assert x.shape == (20, 4, data.N)
    assert y.shape == (20, 4, data.N)
    assert set(np.unique(x)) <= {0.0, 1.0, 2.0}
    # perfect prediction -> 1 - F1 == 0
    yHat = np.zeros((5, 4, 2, data.N))
    _, yt = data.getSamples("test")
    yHat[..., 0, :] = (yt == 0)
    yHat[..., 1, :] = (yt == 1)
    assert data.evaluate(yHat, yt) < 1e-9


def test_facebook_ego_reference_pickle():
    fb = D.FacebookEgo(data_dir=REF_DATASETS)
    A = fb.getAdjacencyMatrix()
    assert A.shape[0] == A.shape[1]
    assert A.shape[0] >= 200


def test_twentynews_synthetic():
    data = D.TwentyNews(rng=np.random.default_rng(5))
    x, y = data.getSamples("train")
    assert x.shape[1] == data.getGraph().shape[0]
    assert len(np.unique(y)) == 5


def test_movielens_interpolate():
    data = D.MovieLens("movie", 25, 0.8, 0.1, kNN=8,
                       rng=np.random.default_rng(7))
    x0, _ = data.getSamples("train")
    n_zero_before = (x0 == 0).sum()
    data.interpolateRatings()
    x1, _ = data.getSamples("train")
    lid = data.labelID[0]
    assert np.all(x1[:, lid] == 0)         # held-out node stays zero
    assert (x1 == 0).sum() < n_zero_before  # some ratings filled in


def test_word_graph_helpers():
    from graph_neural_networks_tpu.data.datasets import (
        distance_sklearn_metrics, knn_adjacency, replace_random_edges)
    z = np.random.default_rng(8).random((30, 5))
    d, idx = distance_sklearn_metrics(z, k=4)
    assert d.shape == (30, 4) and idx.shape == (30, 4)
    W = knn_adjacency(d, idx)
    assert np.allclose(W, W.T) and np.allclose(np.diag(W), 0)
    W2 = replace_random_edges(W, 0.2, rng=np.random.default_rng(9))
    assert W2.shape == W.shape


def test_plot_helpers(tmp_path):
    W = gt.create_graph("SBM", 15, {"nCommunities": 3, "probIntra": 0.8,
                                    "probInter": 0.2},
                        rng=np.random.default_rng(10))
    p1 = str(tmp_path / "g.png")
    p2 = str(tmp_path / "spy.png")
    gt.plot_graph(W, save_to=p1)
    gt.print_graph(W, save_to=p2)
    import os
    assert os.path.exists(p1) and os.path.exists(p2)


# --- Flocking --------------------------------------------------------------

@pytest.fixture(scope="module")
def flock():
    return D.Flocking(nAgents=12, commRadius=6.0, repelDist=1.0, nTrain=8,
                      nValid=2, nTest=2, duration=1.0, samplingTime=0.1,
                      rng=np.random.default_rng(6))


def test_flocking_shapes(flock):
    x, y = flock.getSamples("train")
    T = 10
    assert x.shape == (8, T, 6, 12)
    assert y.shape == (8, T, 2, 12)
    S = flock.getData("commGraph", "train")
    assert S.shape == (8, T, 12, 12)
    # communication graph: symmetric, zero diagonal, lmax ~ 1
    s0 = S[0, 0]
    assert np.allclose(s0, s0.T)
    assert np.allclose(np.diag(s0), 0)
    lam = np.max(np.linalg.eigvalsh(s0))
    assert abs(lam - 1.0) < 1e-6 or lam == 0.0


def test_flocking_expert_reduces_cost(flock):
    vel = flock.getData("vel", "train")
    # velocity variance at the end should be lower than at the start
    def var_at(t):
        v = vel[:, t]
        return np.mean(np.sum((v - v.mean(-1, keepdims=True)) ** 2, axis=1))
    assert var_at(-1) < var_at(0)


def test_flocking_evaluate_matches_manual(flock):
    vel = flock.getData("vel", "test")
    cost = flock.evaluate(vel=vel)
    avg = vel.mean(axis=3, keepdims=True)
    manual = np.mean(np.sum(np.mean(np.sum((vel - avg) ** 2, 2), 2), 1))
    assert np.isclose(cost, manual)


def test_flocking_windowed_rollout_matches_full(flock):
    """Causal-window rollout (O(T*K)) must equal the full-history rollout
    for a finite-memory controller."""
    import jax
    import jax.numpy as jnp
    from graph_neural_networks_tpu.models import architectures_time as archt
    arch = archt.LocalGNN_DB([6, 4], [3], True, "tanh", [2], 1)
    params = arch.init(jax.random.PRNGKey(0), N=12, T=5)
    init_pos = flock.getData("initPos", "test")
    init_vel = flock.getData("initVel", "test")

    def policy(_p, x_hist, S_hist):
        return np.asarray(arch.apply(params, jnp.asarray(x_hist, jnp.float32),
                                     jnp.asarray(S_hist[:, :, None],
                                                 jnp.float32)))

    pos_full, vel_full, acc_full, _, _ = flock.compute_trajectory(
        init_pos, init_vel, flock.duration, archit=policy)
    pos_win, vel_win, acc_win, _, _ = flock.compute_trajectory(
        init_pos, init_vel, flock.duration, archit=policy,
        history_window=arch.causal_window)
    np.testing.assert_allclose(acc_win, acc_full, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(pos_win, pos_full, atol=1e-4, rtol=1e-4)


def test_flocking_closed_loop_with_dummy_controller(flock):
    init_pos = flock.getData("initPos", "test")
    init_vel = flock.getData("initVel", "test")

    def dummy_archit(params, state_hist, graph_hist):
        # proportional consensus on the velocity-difference state
        return -0.5 * state_hist[:, :, 0:2, :]

    pos, vel, accel, state, graph = flock.compute_trajectory(
        init_pos, init_vel, flock.duration, archit=dummy_archit)
    assert pos.shape == vel.shape == accel.shape
    assert np.all(np.isfinite(pos))
    cost = flock.evaluate(vel=vel)
    assert np.isfinite(cost)


def test_flocking_scan_rollout_matches_host_loop():
    """The jitted lax.scan closed-loop rollout == the host-loop rollout
    (same policy, same initial conditions)."""
    import jax
    import jax.numpy as jnp
    from graph_neural_networks_tpu.data.flocking import Flocking
    from graph_neural_networks_tpu.models import architectures_time as archt

    rng = np.random.default_rng(3)
    data = Flocking(nAgents=12, commRadius=2.0, repelDist=1.0, nTrain=4,
                    nValid=2, nTest=2, duration=0.5, samplingTime=0.01,
                    rng=rng)
    arch = archt.LocalGNN_DB([6, 8], [3], True, "tanh", [2], 1)
    params = arch.init(jax.random.PRNGKey(0), N=12, T=3)
    w = arch.causal_window

    def policy(p, x_hist, S_hist):
        return arch.apply(p, jnp.asarray(x_hist, jnp.float32),
                          jnp.asarray(S_hist, jnp.float32))

    ip = data.getData("initPos", "test")
    iv = data.getData("initVel", "test")
    out_scan = data.compute_trajectory(ip, iv, data.duration, archit=policy,
                                       params=params, history_window=w,
                                       jit=True)
    out_host = data.compute_trajectory(ip, iv, data.duration, archit=policy,
                                       params=params, history_window=w,
                                       jit=False)
    names = ("pos", "vel", "accel", "states", "graphs")
    for name, a, b in zip(names, out_scan, out_host):
        np.testing.assert_allclose(a, b, atol=5e-3, rtol=5e-3,
                                   err_msg=name)
