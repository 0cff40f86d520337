"""ELL (padded in-neighbor) time-varying GSO: parity vs the dense DB path.

The dense references here are this package's own lsigf_db / grnn_db /
AggregationGNN_DB dense contractions, which are themselves parity-tested
against the torch reference (test_reference_parity.py) — so ELL parity
chains back to reference behavior (graphML.py:977-1290).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_neural_networks_tpu.ops import ell as ell_lib
from graph_neural_networks_tpu.ops import filters
from graph_neural_networks_tpu.models import architectures_time as archt


def _random_db_gso(rng, B, T, E, N, deg):
    """Sparse random per-(b,t) GSO with in-degree <= deg."""
    S = np.zeros((B, T, E, N, N))
    for b in range(B):
        for t in range(T):
            for m in range(N):
                nbrs = rng.choice(N, size=rng.integers(1, deg + 1),
                                  replace=False)
                S[b, t, :, nbrs, m] = rng.standard_normal((len(nbrs), E))
    return S


def test_ell_from_dense_roundtrip_shift():
    rng = np.random.default_rng(0)
    B, T, E, G, N, deg = 2, 3, 2, 4, 12, 3
    S = _random_db_gso(rng, B, T, E, N, deg)
    x = jnp.asarray(rng.standard_normal((B, T, E, G, N)), jnp.float32)
    ell = ell_lib.ell_from_dense(S)
    assert ell.d <= deg
    y_ell = ell_lib.ell_shift(x, ell)
    y_dense = jnp.einsum("btegn,btenm->btegm", x,
                         jnp.asarray(S, jnp.float32))
    np.testing.assert_allclose(y_ell, y_dense, rtol=1e-5, atol=1e-5)


def test_ell_topk_matches_from_dense():
    rng = np.random.default_rng(1)
    B, T, E, N, deg = 2, 2, 1, 10, 4
    S = _random_db_gso(rng, B, T, E, N, deg)
    ell_np = ell_lib.ell_from_dense(S, d_max=deg)
    ell_jx = jax.jit(lambda s: ell_lib.ell_topk(s, deg))(
        jnp.asarray(S, jnp.float32))
    x = jnp.asarray(rng.standard_normal((B, T, E, 3, N)), jnp.float32)
    np.testing.assert_allclose(ell_lib.ell_shift(x, ell_jx),
                               ell_lib.ell_shift(x, ell_np),
                               rtol=1e-5, atol=1e-5)


def test_lsigf_db_ell_parity_and_grads():
    rng = np.random.default_rng(2)
    B, T, E, G, F, K, N, deg = 2, 5, 2, 3, 4, 3, 14, 3
    S = _random_db_gso(rng, B, T, E, N, deg)
    h = jnp.asarray(rng.standard_normal((F, E, K, G)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, T, G, N)), jnp.float32)
    Sd = jnp.asarray(S, jnp.float32)
    ell = ell_lib.ell_from_dense(S)

    y_dense = filters.lsigf_db(h, Sd, x)
    y_ell = filters.lsigf_db(h, ell, x)
    np.testing.assert_allclose(y_ell, y_dense, rtol=1e-4, atol=1e-5)

    def loss_d(h, x):
        return jnp.sum(filters.lsigf_db(h, Sd, x) ** 2)

    def loss_e(h, x):
        return jnp.sum(filters.lsigf_db(h, ell, x) ** 2)

    gd = jax.grad(loss_d, argnums=(0, 1))(h, x)
    ge = jax.grad(loss_e, argnums=(0, 1))(h, x)
    for a, b in zip(ge, gd):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_grnn_db_ell_parity():
    rng = np.random.default_rng(3)
    B, T, E, F, H, K, N, deg = 2, 6, 1, 3, 4, 3, 12, 3
    S = _random_db_gso(rng, B, T, E, N, deg)
    a = jnp.asarray(rng.standard_normal((H, E, K, F)) * 0.3, jnp.float32)
    bt = jnp.asarray(rng.standard_normal((H, E, K, H)) * 0.3, jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, T, F, N)), jnp.float32)
    z0 = jnp.asarray(rng.standard_normal((B, H, N)), jnp.float32)
    Sd = jnp.asarray(S, jnp.float32)
    ell = ell_lib.ell_from_dense(S)

    zd = filters.grnn_db(a, bt, Sd, x, z0, jnp.tanh)
    ze = filters.grnn_db(a, bt, ell, x, z0, jnp.tanh)
    np.testing.assert_allclose(ze, zd, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("arch_name", ["local", "grnn", "agg"])
def test_db_architectures_ell_parity(arch_name):
    rng = np.random.default_rng(4)
    B, T, N, deg = 2, 6, 16, 4
    S = _random_db_gso(rng, B, T, 1, N, deg)
    x = rng.standard_normal((B, T, 6, N)).astype(np.float32)
    Sd = jnp.asarray(S, jnp.float32)
    ell = ell_lib.ell_from_dense(S)
    key = jax.random.PRNGKey(0)

    if arch_name == "local":
        arch = archt.LocalGNN_DB([6, 8, 8], [3, 3], True, "tanh", [2], 1)
        params = arch.init(key, N=N, T=T)
        yd = arch(params, x, Sd)
        ye = arch(params, x, ell)
    elif arch_name == "grnn":
        arch = archt.GraphRecurrentNN_DB(6, 4, 8, [3, 3], True, "tanh",
                                         "tanh", "tanh", [2], 1)
        params = arch.init(key, N=N, T=T)
        z0 = jnp.zeros((B, 8, N))
        yd = arch(params, x, Sd, z0=z0)
        ye = arch(params, x, ell, z0=z0)
    else:
        arch = archt.AggregationGNN_DB([6, 8], [2], True, "relu",
                                       "max", [1], [2], 1, 3)
        params = arch.init(key, N=N, T=T)
        yd = arch(params, x, Sd)
        ye = arch(params, x, ell)
    np.testing.assert_allclose(ye, yd, rtol=1e-4, atol=1e-4)


def test_db_training_step_ell_grads():
    """One gradient step through LocalGNN_DB on the ELL path == dense."""
    import optax
    rng = np.random.default_rng(5)
    B, T, N, deg = 2, 5, 12, 3
    S = _random_db_gso(rng, B, T, 1, N, deg)
    x = jnp.asarray(rng.standard_normal((B, T, 6, N)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, T, 2, N)), jnp.float32)
    Sd = jnp.asarray(S, jnp.float32)
    ell = ell_lib.ell_from_dense(S)
    arch = archt.LocalGNN_DB([6, 8, 8], [3, 3], True, "tanh", [2], 1)
    params = arch.init(jax.random.PRNGKey(0), N=N, T=T)

    def loss(p, Sarg):
        out = arch.core.apply(p, x, Sarg)[0]
        return jnp.mean((out - y) ** 2)

    gd = jax.grad(loss)(params, Sd)
    ge = jax.grad(loss)(params, ell)
    for a, b in zip(jax.tree_util.tree_leaves(ge),
                    jax.tree_util.tree_leaves(gd)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_ell_no_dense_at_scale():
    """ELL stores O(N·D): N=100k fits easily where dense (T,N,N) cannot."""
    N, B, T, D = 100_000, 1, 2, 8
    rng = np.random.default_rng(6)
    idx = rng.integers(0, N, (B, T, N, D)).astype(np.int32)
    val = rng.standard_normal((B, T, 1, N, D)).astype(np.float32)
    ell = ell_lib.EllGso(jnp.asarray(idx), jnp.asarray(val))
    x = jnp.asarray(rng.standard_normal((B, T, 1, 2, N)), jnp.float32)
    y = ell_lib.ell_shift(x, ell)
    assert y.shape == (B, T, 1, 2, N)
    assert bool(jnp.isfinite(y).all())


# ---------------------------------------------------------------------------
# Flocking integration
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def flock():
    from graph_neural_networks_tpu import data as D
    return D.Flocking(nAgents=10, commRadius=6.0, repelDist=1.0, nTrain=6,
                      nValid=2, nTest=2, duration=0.8, samplingTime=0.1,
                      rng=np.random.default_rng(7))


def test_lambda_max_power_matches_eig(flock):
    from graph_neural_networks_tpu.data.flocking import _lambda_max_power
    S = flock.getData("commGraph", "train")
    W = jnp.asarray((np.abs(S[:, 0]) > 0).astype(np.float32))
    lam_p = _lambda_max_power(W, iters=200)
    lam_e = jnp.max(jnp.linalg.eigvalsh(W), axis=-1)
    np.testing.assert_allclose(lam_p, lam_e, rtol=1e-4)


def test_flocking_comm_graph_ell(flock):
    ell = flock.comm_graph_ell("train")
    S = flock.getData("commGraph", "train")
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        S.shape[:2] + (1, 3, S.shape[-1])), jnp.float32)
    y_e = ell_lib.ell_shift(x, ell)
    y_d = jnp.einsum("btegn,btenm->btegm", x,
                     jnp.asarray(S[:, :, None], jnp.float32))
    np.testing.assert_allclose(y_e, y_d, rtol=1e-5, atol=1e-5)


def test_flocking_rollout_ell_parity(flock):
    """Closed-loop jitted rollout: ELL mode (exact D) reproduces the dense
    rollout trajectory."""
    from graph_neural_networks_tpu.ops import ell as E

    arch = archt.LocalGNN_DB([6, 8], [2], True, "tanh", [2], 1)
    params = arch.init(jax.random.PRNGKey(0), N=10, T=2)

    def policy(p, xw, Sw):
        if not isinstance(Sw, E.EllGso):
            Sw = jnp.asarray(Sw, jnp.float32)
        return arch.apply(p, jnp.asarray(xw, jnp.float32), Sw)

    ip = flock.getData("initPos", "test")
    iv = flock.getData("initVel", "test")
    w = arch.causal_window
    pos_d, vel_d, _, _, graphs_d = flock.compute_trajectory(
        ip, iv, 0.8, archit=policy, params=params, history_window=w)
    pos_e, vel_e, _, _, graphs_e = flock.compute_trajectory(
        ip, iv, 0.8, archit=policy, params=params, history_window=w,
        ell_degree=10)
    np.testing.assert_allclose(pos_e, pos_d, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(vel_e, vel_d, rtol=1e-4, atol=1e-4)
    # graphs come back as an EllGso matching the dense stack
    assert isinstance(graphs_e, E.EllGso)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (pos_d.shape[0], pos_d.shape[1], 1, 2, 10)), jnp.float32)
    ge = E.EllGso(jnp.asarray(graphs_e.idx), jnp.asarray(graphs_e.val))
    y_e = ell_lib.ell_shift(x, ge)
    y_d = jnp.einsum("btegn,btenm->btegm", x,
                     jnp.asarray(graphs_d[:, :, None], jnp.float32))
    np.testing.assert_allclose(y_e, y_d, rtol=1e-4, atol=1e-4)


def test_flocking_for_rollout_matches_full_env(flock):
    """Environment-only construction (no expert generation) produces the
    same jitted closed-loop trajectories as a fully-constructed dataset
    with identical physics parameters."""
    from graph_neural_networks_tpu.data.flocking import Flocking

    env = Flocking.for_rollout(10, commRadius=6.0, repelDist=1.0,
                               samplingTime=0.1,
                               rng=np.random.default_rng(0))
    assert env.nTrain == 0 and env.samples["train"]["signals"] is None
    arch = archt.LocalGNN_DB([6, 8], [2], True, "tanh", [2], 1)
    params = arch.init(jax.random.PRNGKey(0), N=10, T=2)
    policy = lambda p, xw, Sw: arch.apply(
        p, jnp.asarray(xw, jnp.float32), Sw)
    ip = flock.getData("initPos", "test")
    iv = flock.getData("initVel", "test")
    w = arch.causal_window
    pos_a, vel_a, *_ = env.compute_trajectory(
        ip, iv, 0.8, archit=policy, params=params, history_window=w,
        ell_degree=10, lam_method="power")
    pos_b, vel_b, *_ = flock.compute_trajectory(
        ip, iv, 0.8, archit=policy, params=params, history_window=w,
        ell_degree=10, lam_method="power")
    np.testing.assert_allclose(pos_a, pos_b, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(vel_a, vel_b, rtol=1e-6, atol=1e-6)
    # the evaluator works without stored samples
    assert np.isfinite(env.evaluate(vel=vel_a))


def test_lsigf_grnn_db_ell_k1_edge_case():
    """K=1 (no shifts, zero-width register) on the ELL rows path."""
    rng = np.random.default_rng(9)
    B, T, E, G, F, H, N, deg = 2, 4, 1, 3, 4, 4, 10, 3
    S = _random_db_gso(rng, B, T, E, N, deg)
    ell = ell_lib.ell_from_dense(S)
    Sd = jnp.asarray(S, jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, T, G, N)), jnp.float32)
    h1 = jnp.asarray(rng.standard_normal((F, E, 1, G)), jnp.float32)
    np.testing.assert_allclose(
        filters.lsigf_db(h1, ell, x), filters.lsigf_db(h1, Sd, x),
        rtol=1e-5, atol=1e-5)
    a1 = jnp.asarray(rng.standard_normal((H, E, 1, G)) * .3, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((H, E, 1, H)) * .3, jnp.float32)
    z0 = jnp.asarray(rng.standard_normal((B, H, N)), jnp.float32)
    np.testing.assert_allclose(
        filters.grnn_db(a1, b1, ell, x, z0, jnp.tanh),
        filters.grnn_db(a1, b1, Sd, x, z0, jnp.tanh),
        rtol=1e-4, atol=1e-4)


def test_trainer_flocking_env_chunk(flock, tmp_path):
    """TrainerFlocking/evaluator pick up the dataset's rollout_env_chunk
    default: DAGger + closed-loop validation run on the chunked env."""
    from graph_neural_networks_tpu import training as T
    flock.rollout_ell_degree = 10
    flock.rollout_lam_method = "power"
    flock.rollout_env_chunk = 5
    try:
        arch = archt.LocalGNN_DB([6, 8], [2], True, "tanh", [2], 1)
        model = T.Model(arch, T.losses.mse_loss,
                        {"name": "ADAM", "lr": 5e-4}, T.TrainerFlocking,
                        T.evaluate_flocking, name="flockChunk",
                        saveDir=str(tmp_path), N=10, T=5)
        out = model.train(flock, nEpochs=1, batchSize=6,
                          validationInterval=4, ellDegree=10)
        assert np.isfinite(out["lossTrain"]).all()
        res = model.evaluate(flock)
        assert np.isfinite(res["costBestFull"])
    finally:
        flock.rollout_ell_degree = None
        flock.rollout_lam_method = "eig"
        flock.rollout_env_chunk = None


def test_generate_trajectories_large_parity(flock):
    """The fully-jitted large-swarm expert generation (chunked expert +
    chunked env inside one scan) reproduces the constructor's host-side
    numpy generation: trajectories, states, and ELL graphs."""
    import jax.numpy as jnp
    from graph_neural_networks_tpu.data import flocking as F

    ip = flock.getData("initPos", "train")[:3]
    iv = flock.getData("initVel", "train")[:3]

    # single-step expert parity vs the numpy expert formula
    pos = jnp.asarray(ip, jnp.float32)
    vel = jnp.asarray(iv, jnp.float32)
    from graph_neural_networks_tpu.data.base import invert_tensor_ew
    dp, d2 = F.compute_differences(np.asarray(ip))
    dv, _ = F.compute_differences(np.asarray(iv))
    repel = (d2 < flock.repelDist ** 2).astype(np.float64)
    inv = invert_tensor_ew(d2)[:, None]
    a_ref = np.clip(-dv.sum(-1) + 2 * ((dp * repel[:, None])
                                       * (inv ** 2 + inv)).sum(-1),
                    -100.0, 100.0)
    a_jit = F._jnp_expert_accel_chunked(pos, vel, flock.repelDist,
                                        100.0, chunk=5)
    np.testing.assert_allclose(a_jit, a_ref, rtol=2e-4, atol=2e-4)

    # short-horizon full generation vs the host pipeline
    T_s = 0.3                                   # 3 steps: f32 vs f64 ok
    pos_h, vel_h, acc_h = flock.compute_optimal_trajectory(
        ip, iv, T_s, flock.samplingTime, flock.repelDist)
    g_h = flock.compute_communication_graph(pos_h, flock.commRadius, True)
    x_h = flock.compute_states(pos_h, vel_h, g_h)
    pos_j, vel_j, acc_j, x_j, graphs = flock.generate_trajectories_large(
        ip, iv, T_s, ell_degree=10, env_chunk=5, lam_iters=64)
    np.testing.assert_allclose(pos_j, pos_h, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(vel_j, vel_h, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(acc_j, acc_h, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(x_j, x_h, rtol=1e-3, atol=1e-3)
    S_j = ell_lib.ell_to_dense(graphs)[:, :, 0]
    np.testing.assert_allclose(S_j, g_h, rtol=1e-4, atol=1e-4)


def test_grid_expert_and_large_generation(flock):
    """The O(N) cell-list expert (_jnp_expert_accel_grid: collision
    sums from one window pass at the repel radius) matches the chunked
    all-pairs expert on both window paths, and
    generate_trajectories_large(env_grid=...) reproduces the chunked
    generation — the 262k+ TRAINING-data regime."""
    import os
    import jax.numpy as jnp
    from graph_neural_networks_tpu.data import flocking as F

    ip = flock.getData("initPos", "train")[:3]
    iv = flock.getData("initVel", "train")[:3]
    pos = jnp.asarray(ip, jnp.float32)
    vel = jnp.asarray(iv, jnp.float32)
    a_ref = F._jnp_expert_accel_chunked(pos, vel, flock.repelDist,
                                        flock.accelMax, chunk=5)
    for kern in (False, True):
        if kern:
            os.environ["GNT_GRIDWIN"] = "1"
        try:
            a_g, ok = F._jnp_expert_accel_grid(
                pos, vel, flock.commRadius, flock.repelDist,
                flock.accelMax, table_size=256,
                cell_cap=flock.nAgents, factor=2)
        finally:
            os.environ.pop("GNT_GRIDWIN", None)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(a_g), np.asarray(a_ref),
                                   rtol=1e-4, atol=1e-4)

    # generation parity: grid env+expert vs chunked env+expert
    T_s = 0.3
    N = flock.nAgents
    out_c = flock.generate_trajectories_large(
        ip, iv, T_s, ell_degree=N, env_chunk=5, lam_iters=64)
    out_g = flock.generate_trajectories_large(
        ip, iv, T_s, ell_degree=N, env_chunk=5, lam_iters=64,
        env_grid=(256, N))
    assert out_g[5] is True          # grid exactness flag
    for i, name in enumerate(["pos", "vel", "accel", "states"]):
        np.testing.assert_allclose(out_g[i], out_c[i], rtol=1e-4,
                                   atol=1e-4, err_msg=name)
    # graph SETS equal (ELL slot order differs: candidate vs ascending)
    S_g = ell_lib.ell_to_dense(out_g[4])
    S_c = ell_lib.ell_to_dense(out_c[4])
    np.testing.assert_allclose(S_g, S_c, rtol=1e-4, atol=1e-4)


def test_flocking_large_training_end_to_end(tmp_path):
    """Flocking.large: on-device expert generation, EllGso graph storage,
    and a full TrainerFlocking run (DAGger epoch + validation +
    closed-loop eval) with nothing dense-(N,N) in the training data."""
    from graph_neural_networks_tpu import training as T
    from graph_neural_networks_tpu.data.flocking import Flocking

    data = Flocking.large(10, commRadius=6.0, repelDist=1.0, nTrain=8,
                          nValid=2, nTest=2, duration=0.5,
                          samplingTime=0.125, ell_degree=10, env_chunk=5,
                          lam_iters=32, rng=np.random.default_rng(11))
    assert isinstance(data.getData("commGraph", "train"), ell_lib.EllGso)
    assert data.samples["train"]["signals"].shape[2] == 6

    arch = archt.LocalGNN_DB([6, 8], [2], True, "tanh", [2], 1)
    model = T.Model(arch, T.losses.mse_loss, {"name": "ADAM", "lr": 5e-4},
                    T.TrainerFlocking, T.evaluate_flocking,
                    name="flockLarge", saveDir=str(tmp_path), N=10, T=4)
    out = model.train(data, nEpochs=2, batchSize=4, validationInterval=2,
                      probExpert=0.9, ellDegree=10)
    assert np.isfinite(out["lossTrain"]).all()
    res = model.evaluate(data)
    assert np.isfinite(res["costBestFull"])


def test_topk_blocked_exact_on_binary_scores():
    """Two-stage blocked top-k selects exactly the true neighbor set
    (densified ELL equality; index order among binary ties may differ)."""
    from graph_neural_networks_tpu.data.flocking import _topk_blocked
    rng = np.random.default_rng(13)
    B, N, D, block = 3, 64, 6, 16
    mf = (rng.random((B, N)) < 0.05).astype(np.float32)
    # cap true degree at D
    for b in range(B):
        on = np.flatnonzero(mf[b])
        mf[b, on[D:]] = 0.0
    v1, i1 = jax.lax.top_k(jnp.asarray(mf), D)
    v2, i2 = _topk_blocked(jnp.asarray(mf), D, block)

    def densify(v, i):
        S = np.zeros((B, N))
        np.add.at(S, (np.arange(B)[:, None], np.asarray(i)), np.asarray(v))
        return S

    np.testing.assert_array_equal(densify(v2, i2), densify(v1, i1))


def test_env_topk_matches_lax_topk_on_binary_masks():
    """The rank-compare first-k extractor (_env_topk) is bit-identical
    to lax.top_k on binary masks wherever val > 0, across densities
    (incl. rows with 0 set bits and rows with > d_max set bits)."""
    from graph_neural_networks_tpu.data.flocking import _env_topk
    rng = np.random.default_rng(7)
    for dens in (0.0, 0.02, 0.1, 0.6, 1.0):
        B, N, D = 2, 97, 8
        mf = (rng.random((B, N)) < dens).astype(np.float32)
        v1, i1 = jax.lax.top_k(jnp.asarray(mf), D)
        v2, i2 = _env_topk(jnp.asarray(mf), D)
        np.testing.assert_array_equal(np.asarray(v2), np.asarray(v1))
        np.testing.assert_array_equal(
            np.where(np.asarray(v1) > 0, np.asarray(i1), -1),
            np.where(np.asarray(v2) > 0, np.asarray(i2), -1))


def test_flocking_env_chunked_parity(flock):
    """The O(N·deg)-memory chunked env step (env_chunk): one step matches
    the dense env exactly (graph + states + lambda), and the full
    closed-loop rollout reproduces the dense-env ELL rollout."""
    import jax.numpy as jnp
    from graph_neural_networks_tpu.data import flocking as F

    rng = np.random.default_rng(3)
    B, N = 2, 12
    pos = jnp.asarray(rng.standard_normal((B, 2, N)) * 2, jnp.float32)
    vel = jnp.asarray(rng.standard_normal((B, 2, N)), jnp.float32)

    # single-step parity: dense graph/states vs chunked ELL graph/states
    S = F._jnp_comm_graph(pos, 6.0, "power")
    x = F._jnp_states(pos, vel, S)
    v0 = jnp.ones((B, N)) / jnp.sqrt(N)
    idx, valn, xc, _ = F._jnp_env_step_chunked(pos, vel, 6.0, N, 4, v0,
                                               lam_iters=64)
    np.testing.assert_allclose(xc, x, rtol=1e-4, atol=1e-5)
    Sc = ell_lib.ell_to_dense(ell_lib.EllGso(idx, valn[:, None]))[:, 0]
    np.testing.assert_allclose(Sc, S, rtol=1e-4, atol=1e-5)

    # full-rollout parity vs the dense-env ELL rollout
    arch = archt.LocalGNN_DB([6, 8], [2], True, "tanh", [2], 1)
    params = arch.init(jax.random.PRNGKey(0), N=10, T=2)
    policy = lambda p, xw, Sw: arch.apply(
        p, jnp.asarray(xw, jnp.float32), Sw)
    ip = flock.getData("initPos", "test")
    iv = flock.getData("initVel", "test")
    w = arch.causal_window
    pos_d, vel_d, *_ = flock.compute_trajectory(
        ip, iv, 0.8, archit=policy, params=params, history_window=w,
        ell_degree=10, lam_method="power")
    pos_c, vel_c, _, _, graphs_c = flock.compute_trajectory(
        ip, iv, 0.8, archit=policy, params=params, history_window=w,
        ell_degree=10, env_chunk=5, lam_iters=64)
    np.testing.assert_allclose(pos_c, pos_d, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(vel_c, vel_d, rtol=1e-4, atol=1e-4)
    assert isinstance(graphs_c, ell_lib.EllGso)


def test_flocking_segmented_rollout_matches_monolithic(flock):
    """Host-segmented chunked rollout (seg=) is bit-identical math to the
    single-program chunked scan: same init/step closures, only the
    program boundaries differ. seg=3 over T-1=7 steps exercises the
    remainder segment."""
    arch = archt.LocalGNN_DB([6, 8], [2], True, "tanh", [2], 1)
    params = arch.init(jax.random.PRNGKey(0), N=10, T=2)
    policy = lambda p, xw, Sw: arch.apply(
        p, jnp.asarray(xw, jnp.float32), Sw)
    ip = flock.getData("initPos", "test")
    iv = flock.getData("initVel", "test")
    w = arch.causal_window
    kw = dict(archit=policy, params=params, history_window=w,
              ell_degree=10, env_chunk=5, lam_iters=64)
    out_m = flock.compute_trajectory(ip, iv, 0.8, **kw)
    out_s = flock.compute_trajectory(ip, iv, 0.8, seg=3, **kw)
    for a, b, name in zip(out_m[:4], out_s[:4],
                          ["pos", "vel", "accel", "states"]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6, err_msg=name)
    assert isinstance(out_s[4], ell_lib.EllGso)
    np.testing.assert_array_equal(np.asarray(out_s[4].idx),
                                  np.asarray(out_m[4].idx))
    np.testing.assert_allclose(np.asarray(out_s[4].val),
                               np.asarray(out_m[4].val),
                               rtol=1e-5, atol=1e-6)


def test_trainer_flocking_ell(flock, tmp_path):
    """TrainerFlocking with ellDegree: train step runs on the ELL layout."""
    from graph_neural_networks_tpu import training as T
    arch = archt.LocalGNN_DB([6, 8], [2], True, "tanh", [2], 1)
    model = T.Model(arch, T.losses.mse_loss, {"name": "ADAM", "lr": 5e-4},
                    T.TrainerFlocking, T.evaluate_flocking, name="flockEll",
                    saveDir=str(tmp_path), N=10, T=5)
    out = model.train(flock, nEpochs=1, batchSize=6, validationInterval=4,
                      ellDegree=9)
    assert np.isfinite(out["lossTrain"]).all()


def _rand_swarm(N=60, B=2, seed=5):
    from graph_neural_networks_tpu.data import flocking as F
    rng = np.random.default_rng(seed)
    env = F.Flocking.for_rollout(N, commRadius=2.0, repelDist=1.0,
                                 samplingTime=0.05, rng=rng)
    ip, iv = env.compute_initial_positions(
        N, B, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
    return env, jnp.asarray(ip, jnp.float32), jnp.asarray(iv, jnp.float32)


def _densify_ell(idx, val):
    B, N, D = idx.shape
    S = np.zeros((B, N, N))
    for b in range(B):
        np.add.at(S[b], (np.arange(N)[:, None].repeat(D, 1),
                         np.asarray(idx[b])), np.asarray(val[b]))
    # ELL rows are OUT nodes gathering in-neighbors: S[m, n] here; the
    # graph is symmetric so orientation does not matter for comparison
    return S


def test_grid_env_step_matches_chunked():
    """The O(N·k) cell-list env step produces the same neighbor sets,
    states, and lambda as the all-pairs chunked step (generous
    cell_cap: exact)."""
    from graph_neural_networks_tpu.data import flocking as F
    env, ip, iv = _rand_swarm()
    B, _, N = ip.shape
    D = 32
    v0 = jnp.ones((B, N), jnp.float32) / np.sqrt(N)
    ic, sc, xc, vc = F._jnp_env_step_chunked(ip, iv, 2.0, D, N, v0,
                                             lam_iters=64)
    ig, sg, xg, vg, ok = F._jnp_env_step_grid(ip, iv, 2.0, D, v0,
                                              lam_iters=64, cell_cap=64)
    assert bool(ok)
    np.testing.assert_array_equal(_densify_ell(ig, sg) > 0,
                                  _densify_ell(ic, sc) > 0)
    np.testing.assert_allclose(np.asarray(sg).sum(), np.asarray(sc).sum(),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(xg), np.asarray(xc),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(_densify_ell(ig, sg), _densify_ell(ic, sc),
                               rtol=1e-4, atol=1e-6)


def test_grid_env_overflow_flag():
    """A tiny cell_cap must trip the exactness flag."""
    from graph_neural_networks_tpu.data import flocking as F
    env, ip, iv = _rand_swarm()
    B, _, N = ip.shape
    v0 = jnp.ones((B, N), jnp.float32) / np.sqrt(N)
    *_, ok = F._jnp_env_step_grid(ip, iv, 2.0, 8, v0, lam_iters=2,
                                  cell_cap=1)
    assert not bool(ok)


def test_grid_rollout_matches_chunked_rollout():
    """Full closed-loop rollout with the grid env reproduces the
    chunked-env rollout's trajectories (monolithic and segmented)."""
    from graph_neural_networks_tpu.models import architectures_time as archt
    env, ip, iv = _rand_swarm()
    net = archt.LocalGNN_DB(dimNodeSignals=[6, 8], nFilterTaps=[3],
                            bias=True, nonlinearity="tanh",
                            dimReadout=[2], dimEdgeFeatures=1)
    params = net.init(jax.random.PRNGKey(8), N=60, T=3)
    kw = dict(archit=net, params=params, ell_degree=16,
              history_window=net.causal_window)
    p_chunk = env.compute_trajectory(ip, iv, 0.6, env_chunk=30, **kw)[0]
    p_grid = env.compute_trajectory(ip, iv, 0.6,
                                    env_grid=(1024, 64), **kw)[0]
    np.testing.assert_allclose(p_grid, p_chunk, rtol=2e-4, atol=2e-4)
    p_gseg = env.compute_trajectory(ip, iv, 0.6, env_grid=(1024, 64),
                                    seg=3, **kw)[0]
    np.testing.assert_allclose(p_gseg, p_grid, rtol=1e-6, atol=1e-6)


def test_gridwin_kernel_matches_xla_window_path():
    """ops.gridwin v2 (fused Pallas candidate-path kernel, interpret
    mode on CPU) produces the same neighbor ids / values / states and
    the same folded W@v matvec as the pure-XLA window path in
    _grid_rows — idx/val bit-exact, floats allclose."""
    from graph_neural_networks_tpu.data import flocking as F
    rng = np.random.default_rng(6)
    N, C, D = 72, 16, 48
    r = 2.0
    pos = rng.uniform(-5, 5, (2, N)).astype(np.float32)
    vel = rng.normal(size=(2, N)).astype(np.float32)
    v0 = rng.normal(size=(N,)).astype(np.float32)
    H, Gx, Gy, Cc = F._grid_geometry(N, 256, C)
    cell_rows, cx, cy, ok, _ = jax.jit(
        lambda *a: F._grid_build_table(*a, 1.0 / r, H, Gx, Gy, Cc,
                                       v=jnp.asarray(v0)))(
        jnp.asarray(pos[0]), jnp.asarray(pos[1]),
        jnp.asarray(vel[0]), jnp.asarray(vel[1]))
    assert bool(ok)
    args = (jnp.asarray(pos[0]), jnp.asarray(pos[1]),
            jnp.asarray(vel[0]), jnp.asarray(vel[1]), cx, cy,
            jnp.arange(N, dtype=jnp.int32), cell_rows,
            Gx, Gy, Cc, r * r, D, N)
    i_x, v_x, st_x, wv_x = F._grid_rows(*args, use_kernel=False)
    i_k, v_k, st_k, wv_k = F._grid_rows(*args, use_kernel=True)
    np.testing.assert_array_equal(np.asarray(i_k), np.asarray(i_x))
    np.testing.assert_array_equal(np.asarray(v_k), np.asarray(v_x))
    np.testing.assert_allclose(np.asarray(st_k), np.asarray(st_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wv_k), np.asarray(wv_x),
                               rtol=1e-5, atol=1e-5)
    # wv_only mode agrees with the full pass
    wv_o = F._grid_rows(*args, use_kernel=True, wv_only=True)
    np.testing.assert_allclose(np.asarray(wv_o), np.asarray(wv_k),
                               rtol=1e-6, atol=1e-6)
    # wv really is W @ v0 on the densified mask graph
    Sref = np.zeros((N, N))
    np.add.at(Sref, (np.arange(N)[:, None].repeat(D, 1),
                     np.asarray(i_x)), np.asarray(v_x))
    np.testing.assert_allclose(np.asarray(wv_x), Sref @ v0,
                               rtol=1e-4, atol=1e-4)


def test_rollout_cost_matches_host_evaluate():
    """Flocking.rollout_cost (cost accumulated in the scan carry, no
    trajectory materialized or pulled) matches compute_trajectory +
    host evaluate on both the full-trajectory and final-step costs,
    for the chunked and grid envs."""
    from graph_neural_networks_tpu.data.flocking import Flocking
    from graph_neural_networks_tpu.models import (
        architectures_time as archt)
    rng = np.random.default_rng(5)
    env = Flocking.for_rollout(48, commRadius=2.0, repelDist=1.0,
                               samplingTime=0.01, rng=rng)
    ip, iv = env.compute_initial_positions(
        48, 2, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
    net = archt.LocalGNN_DB([6, 8], [3], True, "tanh", [2], 1)
    params = net.init(jax.random.PRNGKey(2), N=48, T=3)
    for env_kw in (dict(env_chunk=24), dict(env_grid=(256, 16))):
        kw = dict(archit=net, params=params, ell_degree=16,
                  history_window=net.causal_window, **env_kw)
        _, vel, *_ = env.compute_trajectory(ip, iv, 0.5, **kw)
        ref_full = float(env.evaluate(vel=vel))
        ref_end = float(env.evaluate(vel=vel[:, -1:]))
        cf, ce = env.rollout_cost(ip, iv, 0.5, net, params,
                                  ell_degree=16,
                                  history_window=net.causal_window,
                                  **env_kw)
        np.testing.assert_allclose(cf, ref_full, rtol=1e-4)
        np.testing.assert_allclose(ce, ref_end, rtol=1e-3, atol=1e-7)


def test_grid_gather_build_matches_scatter_build():
    """The scatter-free table build (builder='gather': searchsorted
    run starts + H*C-row gather + Pallas table_transpose relayout,
    interpret mode on CPU) is bit-identical to the element-scatter
    build across payload widths, including the ok flag, cell coords
    and the (order, vpos) v-refresh contract — and a grid env step on
    a gather-built table reproduces the scatter-built step exactly."""
    from graph_neural_networks_tpu.data import flocking as F
    rng = np.random.default_rng(11)
    N = 1024
    r = 2.0
    H, Gx, Gy, C = F._grid_geometry(N, None, 32, 2)
    px = jnp.asarray(rng.uniform(0, 50, N), jnp.float32)
    py = jnp.asarray(rng.uniform(0, 50, N), jnp.float32)
    vx = jnp.asarray(rng.normal(size=N), jnp.float32)
    vy = jnp.asarray(rng.normal(size=N), jnp.float32)
    v0 = jnp.asarray(rng.normal(size=N), jnp.float32)
    pay = jnp.asarray(rng.normal(size=(N, 5)), jnp.float32)
    # quad scheme (C=32) and the 3x3 side-r scheme (C=16, F*C=112
    # exercises the transpose's odd-width lane pad)
    geoms = [(H, Gx, Gy, C, 1.0 / (2 * r)),
             F._grid_geometry(N, 4096, 16, 1)[:4] + (1.0 / r,)]
    for Hg, Gxg, Gyg, Cg, inv_s in geoms:
        for kw in (dict(), dict(v=v0), dict(v=v0, pay=pay)):
            a = F._grid_build_table(px, py, vx, vy, inv_s, Hg, Gxg,
                                    Gyg, Cg, builder="scatter", **kw)
            for alt in ("gather", "fused"):
                b = F._grid_build_table(px, py, vx, vy, inv_s, Hg, Gxg,
                                        Gyg, Cg, builder=alt, **kw)
                assert bool(a[3]) and bool(b[3])
                np.testing.assert_array_equal(np.asarray(a[0]),
                                              np.asarray(b[0]))
                np.testing.assert_array_equal(np.asarray(a[1]),
                                              np.asarray(b[1]))
                np.testing.assert_array_equal(np.asarray(a[2]),
                                              np.asarray(b[2]))
                np.testing.assert_array_equal(np.asarray(a[4][0]),
                                              np.asarray(b[4][0]))
                np.testing.assert_array_equal(np.asarray(a[4][1]),
                                              np.asarray(b[4][1]))
    # end-to-end: a full grid env step under each builder
    import os
    pos = jnp.stack([px, py])[None]
    vel = jnp.stack([vx, vy])[None]
    step = lambda: F._jnp_env_step_grid(
        pos, vel, 2.0, 16, v0[None], lam_iters=0, cell_cap=32,
        cell_factor=2)
    os.environ["GNT_BUILD"] = "scatter"
    try:
        ref = step()
        os.environ["GNT_BUILD"] = "gather"
        got = step()
        os.environ["GNT_BUILD"] = "fused"
        got_f = step()
    finally:
        os.environ.pop("GNT_BUILD", None)
    assert bool(ref[-1]) and bool(got[-1]) and bool(got_f[-1])
    for alt in (got, got_f):
        for x, y in zip(ref[:-1], alt[:-1]):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_grid_quad_scheme_matches_3x3():
    """The 2x2 side-2r window scheme (cell_factor=2, the env_grid=True
    default) produces the same neighbor SETS, states and lambda as the
    3x3 side-r scheme (neighbor order within ELL rows differs — set
    semantics is the contract); its kernel and XLA paths bit-match."""
    from graph_neural_networks_tpu.data import flocking as F
    rng = np.random.default_rng(3)
    B, N, D = 2, 96, 64
    pos = jnp.asarray(rng.uniform(-6, 6, (B, 2, N)), jnp.float32)
    vel = jnp.asarray(rng.normal(size=(B, 2, N)), jnp.float32)
    v0 = jnp.ones((B, N), jnp.float32) / np.sqrt(N)

    def dense(i, s):
        S = np.zeros((B, N, N))
        for b in range(B):
            np.add.at(S[b], (np.arange(N)[:, None].repeat(D, 1),
                             np.asarray(i[b])), np.asarray(s[b]))
        return S

    def step(factor, kernel):
        return jax.jit(lambda p, v, vv: F._jnp_env_step_grid(
            p, v, 2.0, D, vv, lam_iters=2, cell_factor=factor,
            use_kernel=kernel, lam_path="window"))(pos, vel, v0)

    i1, s1, x1, v1, ok1 = step(1, False)
    i2, s2, x2, v2, ok2 = step(2, False)
    assert bool(ok1) and bool(ok2)
    np.testing.assert_allclose(dense(i2, s2), dense(i1, s1),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1),
                               rtol=1e-4, atol=1e-6)
    # quad kernel path == quad XLA path, bit-exact on idx/val
    i2k, s2k, x2k, v2k, ok2k = step(2, True)
    assert bool(ok2k)
    np.testing.assert_array_equal(np.asarray(i2k), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s2k), np.asarray(s2),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(x2k), np.asarray(x2),
                               rtol=1e-4, atol=1e-4)


def test_grid_window_lambda_matches_ell_lambda():
    """_jnp_env_step_grid with the candidate-window power iteration
    (lam_path='window', kernel in interpret mode) matches the ELL-
    matvec power iteration when d_max covers the true max degree."""
    from graph_neural_networks_tpu.data import flocking as F
    rng = np.random.default_rng(11)
    B, N = 2, 96
    pos = jnp.asarray(rng.uniform(-6, 6, (B, 2, N)), jnp.float32)
    vel = jnp.asarray(rng.normal(size=(B, 2, N)), jnp.float32)
    v0 = jnp.ones((B, N), jnp.float32) / np.sqrt(N)
    for iters in (0, 1, 3):
        i_e, s_e, x_e, v_e, ok_e = jax.jit(
            lambda p, v, v0: F._jnp_env_step_grid(
                p, v, 2.0, 64, v0, lam_iters=iters,
                use_kernel=False, lam_path="ell"))(pos, vel, v0)
        i_w, s_w, x_w, v_w, ok_w = jax.jit(
            lambda p, v, v0: F._jnp_env_step_grid(
                p, v, 2.0, 64, v0, lam_iters=iters,
                use_kernel=True, lam_path="window"))(pos, vel, v0)
        assert bool(ok_e) and bool(ok_w)
        np.testing.assert_array_equal(np.asarray(i_w), np.asarray(i_e))
        np.testing.assert_allclose(np.asarray(s_w), np.asarray(s_e),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(x_w), np.asarray(x_e),
                                   rtol=1e-4, atol=1e-4)
        if iters > 0:
            np.testing.assert_allclose(np.asarray(v_w), np.asarray(v_e),
                                       rtol=1e-4, atol=1e-6)
        else:
            # fold mode: same Rayleigh lambda (tested through s_w
            # above) but v advances one power iteration, unlike the
            # ELL path's frozen v
            assert not np.allclose(np.asarray(v_w), np.asarray(v_e))
