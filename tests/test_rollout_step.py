"""Step-mode (register-carrying) DB architectures: rollout_step outputs
are exactly the full-history forward at each t, for dense and ELL GSOs.

This is the closed-loop-rollout fast path: one graph shift per step
instead of a windowed re-forward (architectures_time.py step-mode
pieces). Reference semantics: architecturesTime.py forward on the full
(zero-padded) history.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graph_neural_networks_tpu.models import architectures_time as archt
from graph_neural_networks_tpu.ops import ell as ell_lib


def random_traj(rng, B, T, F0, N, deg):
    x = rng.standard_normal((B, T, F0, N)).astype(np.float32)
    idx = rng.integers(0, N, (B, T, N, deg)).astype(np.int32)
    val = (rng.random((B, T, 1, N, deg)) / deg).astype(np.float32)
    ell = ell_lib.EllGso(jnp.asarray(idx), jnp.asarray(val))
    Sd = jnp.asarray(ell_lib.ell_to_dense(ell))
    return jnp.asarray(x), ell, Sd


def run_steps(net, params, x, S_lead_b, T, rng=None):
    """Feed (x_t, S_t) one step at a time; stack outputs along T."""
    B, _, F0, N = x.shape
    state = net.rollout_init(params, B, N, rng=rng)
    ys = []
    for t in range(T):
        S_t = jax.tree_util.tree_map(lambda a: a[:, t], S_lead_b)
        state, y_t = net.rollout_step(params, state, x[:, t], S_t)
        ys.append(y_t)
    return jnp.stack(ys, axis=1)                    # (B, T, out, N)


@pytest.mark.parametrize("mode", ["dense", "ell"])
def test_localgnn_db_step_matches_forward(mode):
    rng = np.random.default_rng(0)
    B, T, N, deg = 2, 7, 24, 4
    x, ell, Sd = random_traj(rng, B, T, 3, N, deg)
    net = archt.LocalGNN_DB(dimNodeSignals=[3, 8, 5], nFilterTaps=[4, 3],
                            bias=True, nonlinearity="tanh",
                            dimReadout=[4, 2], dimEdgeFeatures=1)
    params = net.init(jax.random.PRNGKey(1), N=N, T=T)
    S = ell if mode == "ell" else Sd
    y_full = net.apply(params, x, S)
    y_step = run_steps(net, params, x, S, T)
    np.testing.assert_allclose(np.asarray(y_step), np.asarray(y_full),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["dense", "ell"])
def test_grnn_db_step_matches_forward(mode):
    rng = np.random.default_rng(1)
    B, T, N, deg = 2, 6, 20, 4
    x, ell, Sd = random_traj(rng, B, T, 3, N, deg)
    net = archt.GraphRecurrentNN_DB(
        dimInputSignals=3, dimOutputSignals=2, dimHiddenSignals=5,
        nFilterTaps=[3, 4], bias=True, nonlinearityHidden="tanh",
        nonlinearityOutput="tanh", nonlinearityReadout="tanh",
        dimReadout=[2], dimEdgeFeatures=1)
    params = net.init(jax.random.PRNGKey(2), N=N, T=T)
    S = ell if mode == "ell" else Sd
    # same z0 on both paths (split_forward default: PRNGKey(0))
    y_full = net.apply(params, x, S)
    y_step = run_steps(net, params, x, S, T)
    np.testing.assert_allclose(np.asarray(y_step), np.asarray(y_full),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["dense", "ell"])
def test_agg_db_step_matches_forward(mode):
    rng = np.random.default_rng(2)
    B, T, N, deg = 2, 6, 20, 4
    x, ell, Sd = random_traj(rng, B, T, 3, N, deg)
    net = archt.AggregationGNN_DB(
        dimFeatures=[3, 6, 4], nFilterTaps=[3, 2], bias=True,
        nonlinearity="relu", poolingFunction="max", poolingSize=[1, 2],
        dimReadout=[3, 2], dimEdgeFeatures=1, nExchanges=6)
    params = net.init(jax.random.PRNGKey(3), N=N, T=T)
    S = ell if mode == "ell" else Sd
    y_full = net.apply(params, x, S)
    y_step = run_steps(net, params, x, S, T)
    np.testing.assert_allclose(np.asarray(y_step), np.asarray(y_full),
                               rtol=1e-5, atol=1e-5)


def test_step_mode_under_scan():
    """rollout_step composes with lax.scan (the rollout's actual use)."""
    rng = np.random.default_rng(3)
    B, T, N, deg = 1, 8, 16, 3
    x, ell, _ = random_traj(rng, B, T, 2, N, deg)
    net = archt.LocalGNN_DB(dimNodeSignals=[2, 4], nFilterTaps=[3],
                            bias=True, nonlinearity="tanh",
                            dimReadout=[2], dimEdgeFeatures=1)
    params = net.init(jax.random.PRNGKey(4), N=N, T=T)

    def scan_all(params, x, ell):
        state = net.rollout_init(params, B, N)
        xs = (jnp.moveaxis(x, 1, 0),
              jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, 1, 0), ell))

        def step(st, inp):
            x_t, S_t = inp
            return net.rollout_step(params, st, x_t, S_t)
        _, ys = jax.lax.scan(step, state, xs)
        return jnp.moveaxis(ys, 0, 1)
    y_scan = jax.jit(scan_all)(params, x, ell)
    y_full = net.apply(params, x, ell)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_full),
                               rtol=1e-5, atol=1e-5)


def _small_env(N=24, B=2, rng=None):
    from graph_neural_networks_tpu.data import flocking as F
    rng = rng or np.random.default_rng(11)
    env = F.Flocking.for_rollout(N, commRadius=2.0, repelDist=1.0,
                                 samplingTime=0.05, rng=rng)
    ip, iv = env.compute_initial_positions(
        N, B, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
    return env, ip, iv


def test_rollout_step_mode_matches_windowed():
    """compute_trajectory with step_mode=True (register-carrying policy)
    reproduces the windowed scan rollout's trajectories, in dense, ELL,
    and chunked-env modes."""
    env, ip, iv = _small_env()
    net = archt.LocalGNN_DB(dimNodeSignals=[6, 8], nFilterTaps=[3],
                            bias=True, nonlinearity="tanh",
                            dimReadout=[2], dimEdgeFeatures=1)
    params = net.init(jax.random.PRNGKey(5), N=24, T=3)
    kw = dict(archit=net, params=params,
              history_window=net.causal_window)
    for mode_kw in (dict(),                      # dense env
                    dict(ell_degree=8),          # ELL histories
                    dict(ell_degree=8, env_chunk=12,
                         lam_method="power")):   # chunked env
        p_win = env.compute_trajectory(ip, iv, 0.6, step_mode=False,
                                       **kw, **mode_kw)[0]
        p_step = env.compute_trajectory(ip, iv, 0.6, step_mode=True,
                                        **kw, **mode_kw)[0]
        np.testing.assert_allclose(p_step, p_win, rtol=2e-4, atol=2e-4)


def test_rollout_step_mode_grnn_matches_host_loop():
    """GRNN_DB has no finite window; step mode must reproduce the host
    full-history loop (z0 = PRNGKey(0) normal on both paths)."""
    env, ip, iv = _small_env(N=16, B=1)
    net = archt.GraphRecurrentNN_DB(
        dimInputSignals=6, dimOutputSignals=2, dimHiddenSignals=4,
        nFilterTaps=[3, 3], bias=True, nonlinearityHidden="tanh",
        nonlinearityOutput="tanh", nonlinearityReadout="tanh",
        dimReadout=[2], dimEdgeFeatures=1)
    params = net.init(jax.random.PRNGKey(6), N=16, T=3)
    p_host = env.compute_trajectory(ip, iv, 0.5, archit=net,
                                    params=params, step_mode=False)[0]
    p_step = env.compute_trajectory(ip, iv, 0.5, archit=net,
                                    params=params, step_mode=True)[0]
    np.testing.assert_allclose(p_step, p_host, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mode", ["dense", "ell"])
def test_rollout_step_shifted_composes(mode):
    """rollout_step == one wide shift of rollout_payload(state) +
    rollout_step_shifted — the contract the fused grid env relies on
    (it supplies the shifted payload from its own window pass)."""
    rng = np.random.default_rng(7)
    B, T, N, deg = 2, 5, 20, 4
    x, ell, Sd = random_traj(rng, B, T, 3, N, deg)
    S_all = ell if mode == "ell" else Sd
    from graph_neural_networks_tpu.ops import filters
    nets = [
        archt.LocalGNN_DB([3, 8, 5], [4, 3], True, "tanh", [2], 1),
        archt.GraphRecurrentNN_DB(3, 2, 5, [3, 4], True, "tanh",
                                  "tanh", "tanh", [2], 1),
        archt.AggregationGNN_DB([3, 6], [3], True, "relu", "max", [1],
                                [2], 1, nExchanges=5),
    ]
    for i, net in enumerate(nets):
        params = net.init(jax.random.PRNGKey(10 + i), N=N, T=T)
        state_a = net.rollout_init(params, B, N)
        state_b = net.rollout_init(params, B, N)
        for t in range(T):
            S_t = jax.tree_util.tree_map(lambda a: a[:, t], S_all)
            pay = net.rollout_payload(state_b)
            assert pay.shape == (B, N, 1, net.payload_width)
            sh = filters.step_shift_rows(pay, S_t)
            state_a, y_a = net.rollout_step(params, state_a, x[:, t], S_t)
            state_b, y_b = net.rollout_step_shifted(params, state_b,
                                                    x[:, t], sh)
            np.testing.assert_array_equal(np.asarray(y_a),
                                          np.asarray(y_b))


def test_grid_payload_shift_matches_ell():
    """_jnp_env_step_grid(payload=...) returns the normalized graph
    shift of the payload: equal to the ELL shift with the step's own
    idx/val whenever d_max covers the true max in-degree; idx/val
    outputs bit-equal to the payload-free step; XLA window path vs
    interpret-mode kernel agree."""
    import os
    from graph_neural_networks_tpu.data import flocking as F
    from graph_neural_networks_tpu.ops import ell as ell_lib
    rng = np.random.default_rng(12)
    B, N, D, P = 2, 40, 40, 5
    pos = jnp.asarray(rng.random((B, 2, N)) * 6.0, jnp.float32)
    vel = jnp.asarray(rng.standard_normal((B, 2, N)), jnp.float32)
    v0 = jnp.ones((B, N), jnp.float32) / np.sqrt(N)
    pay = jnp.asarray(rng.standard_normal((B, N, P)), jnp.float32)
    outs = {}
    for kern in (False, True):
        if kern:
            os.environ["GNT_GRIDWIN"] = "1"
        try:
            i0, v0n, st0, _, ok0 = F._jnp_env_step_grid(
                pos, vel, 2.0, D, v0, lam_iters=2, cell_cap=N,
                cell_factor=2, use_kernel=kern)
            idx, val, st, _, wpay, ok = F._jnp_env_step_grid(
                pos, vel, 2.0, D, v0, lam_iters=2, cell_cap=N,
                cell_factor=2, use_kernel=kern, payload=pay)
        finally:
            os.environ.pop("GNT_GRIDWIN", None)
        assert bool(ok) and bool(ok0)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(i0))
        np.testing.assert_array_equal(np.asarray(val), np.asarray(v0n))
        np.testing.assert_array_equal(np.asarray(st), np.asarray(st0))
        # d_max == N: the ELL shift over (idx, val) is the full graph
        ell = ell_lib.EllGso(idx, val[:, None])
        ref = ell.db_shift_rows(pay[:, :, None, :])[:, :, 0]
        np.testing.assert_allclose(np.asarray(wpay), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
        outs[kern] = np.asarray(wpay)
    np.testing.assert_allclose(outs[True], outs[False],
                               rtol=1e-6, atol=1e-7)


def test_fused_policy_rollout_matches_unfused(monkeypatch):
    """Grid-env step-mode rollouts with the fused policy payload (the
    default) reproduce the unfused (ELL register gather) rollout for
    all three DB architectures, incl. under compute_trajectory."""
    env, ip, iv = _small_env()
    nets = [
        archt.LocalGNN_DB([6, 8], [3], True, "tanh", [2], 1),
        archt.GraphRecurrentNN_DB(6, 2, 4, [3, 3], True, "tanh",
                                  "tanh", "tanh", [2], 1),
        archt.AggregationGNN_DB([6, 4], [2], True, "relu", "max", [1],
                                [2], 1, nExchanges=3),
    ]
    for i, net in enumerate(nets):
        params = net.init(jax.random.PRNGKey(20 + i), N=24, T=3)
        kw = dict(archit=net, params=params, ell_degree=24,
                  env_grid=True, step_mode=True,
                  history_window=getattr(net, "causal_window", 4))
        monkeypatch.setenv("GNT_NO_FUSED_POLICY", "1")
        p_ref, v_ref = env.compute_trajectory(ip, iv, 0.6, **kw)[:2]
        monkeypatch.delenv("GNT_NO_FUSED_POLICY")
        # pin fusion ON so the comparison can't silently become
        # unfused-vs-unfused if the auto width heuristic changes
        monkeypatch.setenv("GNT_FUSED_POLICY", "1")
        p_fuse, v_fuse = env.compute_trajectory(ip, iv, 0.6, **kw)[:2]
        monkeypatch.delenv("GNT_FUSED_POLICY")
        np.testing.assert_allclose(p_fuse, p_ref, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(v_fuse, v_ref, rtol=2e-4, atol=2e-4)


def test_fused_rollout_return_graphs_false_exact(monkeypatch):
    """return_graphs=False (the eval/benchmark mode) leaves the fused
    grid rollout's positions/velocities/states EXACTLY unchanged and
    returns a zero-column ELL graph trajectory; it is rejected outside
    the fused-policy rollout (non-fused policies consume the graph)."""
    env, ip, iv = _small_env()
    net = archt.LocalGNN_DB([6, 8], [3], True, "tanh", [2], 1)
    params = net.init(jax.random.PRNGKey(31), N=24, T=3)
    kw = dict(archit=net, params=params, ell_degree=24, env_grid=True,
              step_mode=True, history_window=net.causal_window)
    monkeypatch.setenv("GNT_FUSED_POLICY", "1")
    p0, v0, a0, x0, g0 = env.compute_trajectory(ip, iv, 0.6, **kw)
    p1, v1, a1, x1, g1 = env.compute_trajectory(
        ip, iv, 0.6, return_graphs=False, **kw)
    np.testing.assert_array_equal(p1, p0)
    np.testing.assert_array_equal(v1, v0)
    np.testing.assert_array_equal(a1, a0)
    np.testing.assert_array_equal(x1, x0)
    assert g1.idx.shape[-1] == 0 and g0.idx.shape[-1] == 24
    # "auto" = False exactly when fused: zero-width here ...
    ga = env.compute_trajectory(ip, iv, 0.6, return_graphs="auto",
                                **kw)[4]
    assert ga.idx.shape[-1] == 0
    monkeypatch.delenv("GNT_FUSED_POLICY")
    # ... and full-width when fusion is off (graph-consuming rollout)
    monkeypatch.setenv("GNT_NO_FUSED_POLICY", "1")
    ga = env.compute_trajectory(ip, iv, 0.6, return_graphs="auto",
                                **kw)[4]
    assert ga.idx.shape[-1] == 24
    monkeypatch.delenv("GNT_NO_FUSED_POLICY")
    # non-fused step mode must reject the flag loudly
    import pytest as _pytest
    monkeypatch.setenv("GNT_NO_FUSED_POLICY", "1")
    with _pytest.raises(AssertionError):
        env.compute_trajectory(ip, iv, 0.6, return_graphs=False, **kw)
    monkeypatch.delenv("GNT_NO_FUSED_POLICY")


def test_rollout_segmented_step_mode_and_t1():
    """Segmented step-mode rollout == monolithic; T<=1 returns the
    init-only trajectory instead of crashing (ADVICE r2)."""
    env, ip, iv = _small_env()
    net = archt.LocalGNN_DB(dimNodeSignals=[6, 8], nFilterTaps=[3],
                            bias=True, nonlinearity="tanh",
                            dimReadout=[2], dimEdgeFeatures=1)
    params = net.init(jax.random.PRNGKey(7), N=24, T=3)
    kw = dict(archit=net, params=params, ell_degree=8, env_chunk=12,
              history_window=net.causal_window)
    p_mono = env.compute_trajectory(ip, iv, 0.6, **kw)[0]
    p_seg = env.compute_trajectory(ip, iv, 0.6, seg=3, **kw)[0]
    np.testing.assert_allclose(p_seg, p_mono, rtol=1e-5, atol=1e-5)
    assert p_seg.dtype == p_mono.dtype == np.float64
    out = env.compute_trajectory(ip, iv, 0.04, seg=3, **kw)  # T == 1
    assert out[0].shape[1] == 1
    # seg without env_chunk must raise, not silently fall through
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        env.compute_trajectory(ip, iv, 0.6, archit=net, params=params,
                               ell_degree=8, seg=3,
                               history_window=net.causal_window)
