"""Node-sharded time-varying (DB) shifts on the 8-device virtual mesh:
forward/gradient parity vs the single-device dense path, through the
filters and through full DB architectures (parallel/db.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_neural_networks_tpu import parallel as par
from graph_neural_networks_tpu.models import architectures_time as archt
from graph_neural_networks_tpu.ops import ell as ell_lib
from graph_neural_networks_tpu.ops import filters

from tests.test_ell import _random_db_gso


@pytest.fixture(scope="module")
def gmesh():
    return par.make_mesh((2, 4))          # 2-way data x 4-way graph


def test_sharded_ell_shift_parity(gmesh):
    rng = np.random.default_rng(0)
    B, T, E, G, N, deg = 2, 3, 2, 3, 24, 4
    S = _random_db_gso(rng, B, T, E, N, deg)
    ell = ell_lib.ell_from_dense(S)
    sgso = par.shard_ell(ell, gmesh)
    assert sgso.n % 4 == 0
    x = jnp.asarray(rng.standard_normal((B, T, E, G, N)), jnp.float32)
    xp = sgso.pad_signal(x)
    y_sh = sgso.unpad_signal(sgso.db_shift(xp))
    y_ref = jnp.einsum("btegn,btenm->btegm", x,
                       jnp.asarray(S, jnp.float32))
    np.testing.assert_allclose(y_sh, y_ref, rtol=1e-5, atol=1e-5)


def test_sharded_ell_shift_pads_non_divisible(gmesh):
    rng = np.random.default_rng(1)
    B, T, E, G, N, deg = 1, 2, 1, 2, 10, 3   # 10 % 4 != 0 -> padded to 12
    S = _random_db_gso(rng, B, T, E, N, deg)
    sgso = par.shard_ell(ell_lib.ell_from_dense(S), gmesh)
    assert sgso.n == 12 and sgso.n_orig == 10
    x = jnp.asarray(rng.standard_normal((B, T, E, G, N)), jnp.float32)
    y_sh = sgso.unpad_signal(sgso.db_shift(sgso.pad_signal(x)))
    y_ref = jnp.einsum("btegn,btenm->btegm", x,
                       jnp.asarray(S, jnp.float32))
    np.testing.assert_allclose(y_sh, y_ref, rtol=1e-5, atol=1e-5)


def test_sharded_lsigf_db_forward_and_grads(gmesh):
    rng = np.random.default_rng(2)
    B, T, E, G, F, K, N, deg = 2, 4, 1, 3, 4, 3, 16, 3
    S = _random_db_gso(rng, B, T, E, N, deg)
    h = jnp.asarray(rng.standard_normal((F, E, K, G)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, T, G, N)), jnp.float32)
    sgso = par.shard_ell(ell_lib.ell_from_dense(S), gmesh)

    y_ref = filters.lsigf_db(h, jnp.asarray(S, jnp.float32), x)

    @jax.jit
    def fwd(h, x):
        return filters.lsigf_db(h, sgso, x)

    np.testing.assert_allclose(fwd(h, x), y_ref, rtol=1e-4, atol=1e-5)

    def loss_sh(h, x):
        return jnp.sum(filters.lsigf_db(h, sgso, x) ** 2)

    def loss_ref(h, x):
        return jnp.sum(
            filters.lsigf_db(h, jnp.asarray(S, jnp.float32), x) ** 2)

    gs = jax.jit(jax.grad(loss_sh, argnums=(0, 1)))(h, x)
    gr = jax.grad(loss_ref, argnums=(0, 1))(h, x)
    for a, b in zip(gs, gr):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_sharded_grnn_db_parity(gmesh):
    rng = np.random.default_rng(3)
    B, T, E, F, H, K, N, deg = 2, 5, 1, 3, 4, 2, 16, 3
    S = _random_db_gso(rng, B, T, E, N, deg)
    a = jnp.asarray(rng.standard_normal((H, E, K, F)) * 0.3, jnp.float32)
    bt = jnp.asarray(rng.standard_normal((H, E, K, H)) * 0.3, jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, T, F, N)), jnp.float32)
    z0 = jnp.asarray(rng.standard_normal((B, H, N)), jnp.float32)
    sgso = par.shard_ell(ell_lib.ell_from_dense(S), gmesh)

    z_ref = filters.grnn_db(a, bt, jnp.asarray(S, jnp.float32), x, z0,
                            jnp.tanh)
    z_sh = jax.jit(lambda a, x, z0: filters.grnn_db(a, bt, sgso, x, z0,
                                                    jnp.tanh))(a, x, z0)
    np.testing.assert_allclose(z_sh, z_ref, rtol=1e-4, atol=1e-4)


def test_sharded_db_architecture_train_step(gmesh):
    """Full sharded LocalGNN_DB train step: data-parallel batch x
    node-sharded graph, loss/grads match the single-device dense path."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(4)
    B, T, N, deg = 4, 5, 16, 4
    S = _random_db_gso(rng, B, T, 1, N, deg)
    x = jnp.asarray(rng.standard_normal((B, T, 6, N)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, T, 2, N)), jnp.float32)
    sgso = par.shard_ell(ell_lib.ell_from_dense(S), gmesh)

    arch = archt.LocalGNN_DB([6, 8, 8], [3, 3], True, "tanh", [2], 1)
    params = arch.init(jax.random.PRNGKey(0), N=N, T=T)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    def make_step(Sarg):
        def step(params, opt_state, x, y):
            def loss(p):
                out = arch.core.apply(p, x, Sarg)[0]
                return jnp.mean((out - y) ** 2)
            l, g = jax.value_and_grad(loss)(params)
            updates, opt_state2 = opt.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state2, l
        return step

    # reference: single-device dense
    p_ref, _, l_ref = make_step(jnp.asarray(S, jnp.float32))(
        params, opt_state, x, y)

    # sharded: batch over 'data', nodes over 'graph'
    with gmesh:
        xd = jax.device_put(x, NamedSharding(
            gmesh, P("data", None, None, "graph")))
        yd = jax.device_put(y, NamedSharding(
            gmesh, P("data", None, None, "graph")))
        p_sh, _, l_sh = jax.jit(make_step(sgso))(params, opt_state, xd, yd)

    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_sh),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n_agents", [12, 10])   # 10 -> 2 pad agents
def test_sharded_swarm_rollout_parity(gmesh, n_agents):
    """Node-sharded closed-loop flocking (env + model over the mesh)
    reproduces the single-device chunked-env rollout exactly, including
    when the swarm is padded to the mesh size."""
    from graph_neural_networks_tpu.data.flocking import Flocking

    N = n_agents
    # binary-exact dt so duration = T*dt gives exactly T arange steps
    env = Flocking.for_rollout(N, commRadius=6.0, repelDist=1.0,
                               samplingTime=0.125,
                               rng=np.random.default_rng(0))
    ip, iv = env.compute_initial_positions(
        N, 2, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)

    arch = archt.LocalGNN_DB([6, 8], [2], True, "tanh", [2], 1)
    params = arch.init(jax.random.PRNGKey(0), N=N, T=2)
    policy = lambda p, xw, Sw: arch.apply(
        p, jnp.asarray(xw, jnp.float32), Sw)
    w = arch.causal_window
    T = 6

    pos_ref, vel_ref, *_ = env.compute_trajectory(
        ip, iv, T * env.samplingTime, archit=policy, params=params,
        history_window=w, ell_degree=N,
        env_chunk=N // 2, lam_iters=64)

    pos_p, vel_p, n_orig = par.pad_swarm(ip, iv, gmesh)
    # sub-chunk the per-shard rows on one parametrization (exercises the
    # million-agent O(B*chunk*N)-per-chip workspace path)
    roll = par.sharded_swarm_rollout(
        T, w, policy, env.commRadius, env.samplingTime, env.accelMax,
        d_max=N, mesh=gmesh, n_orig=n_orig, lam_iters=64,
        env_chunk=1 if n_agents == 12 else None)
    pos_s, vel_s, accel_s, states_s, graphs_s = roll(params, pos_p, vel_p)
    assert isinstance(graphs_s, par.ShardedEllGso)
    np.testing.assert_allclose(np.asarray(pos_s)[..., :N], pos_ref,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(vel_s)[..., :N], vel_ref,
                               rtol=1e-4, atol=1e-4)
    # pad agents never move
    if n_orig < pos_s.shape[-1]:
        pp = np.asarray(pos_s)[..., n_orig:]
        np.testing.assert_allclose(pp, np.broadcast_to(pp[:, :1], pp.shape))


def test_sharded_swarm_rollout_return_cost(gmesh):
    """return_cost=True (the mesh form of Flocking.rollout_cost)
    matches the cost computed from the same sharded rollout's pulled
    trajectories — pad agents masked out — on both the windowed and
    fused step-mode paths."""
    from graph_neural_networks_tpu.data.flocking import Flocking

    N = 12
    env = Flocking.for_rollout(N, commRadius=6.0, repelDist=1.0,
                               samplingTime=0.125,
                               rng=np.random.default_rng(0))
    ip, iv = env.compute_initial_positions(
        N, 2, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
    arch = archt.LocalGNN_DB([6, 8], [2], True, "tanh", [2], 1)
    params = arch.init(jax.random.PRNGKey(0), N=N, T=2)
    policy = lambda p, xw, Sw: arch.apply(
        p, jnp.asarray(xw, jnp.float32), Sw)
    w = arch.causal_window
    T = 6
    pos_p, vel_p, n_orig = par.pad_swarm(ip, iv, gmesh)
    for kw in (dict(),
               dict(env_grid=(256, 16), step_mode=True)):
        pol = arch if kw.get("step_mode") else policy
        base = dict(mesh=gmesh, n_orig=n_orig, lam_iters=64, **kw)
        roll = par.sharded_swarm_rollout(
            T, w, pol, env.commRadius, env.samplingTime, env.accelMax,
            d_max=N, **base)
        out = roll(params, pos_p, vel_p)
        vel_t = np.asarray(out[1])[..., :n_orig]
        ref_full = float(env.evaluate(vel=vel_t))
        ref_end = float(env.evaluate(vel=vel_t[:, -1:]))
        roll_c = par.sharded_swarm_rollout(
            T, w, pol, env.commRadius, env.samplingTime, env.accelMax,
            d_max=N, return_cost=True, **base)
        out_c = roll_c(params, pos_p, vel_p)
        cf, ce = float(out_c[0]), float(out_c[1])
        if "env_grid" in kw:
            assert bool(out_c[2]) and bool(out[-1])
        np.testing.assert_allclose(cf, ref_full, rtol=1e-4)
        np.testing.assert_allclose(ce, ref_end, rtol=1e-3, atol=1e-7)


def test_sharded_swarm_rollout_grnn_policy(gmesh):
    """The recurrent controller (GraphRecurrentNN_DB) as the sharded
    swarm policy: mesh rollout == single-device chunked rollout."""
    from graph_neural_networks_tpu.data.flocking import Flocking

    N = 12
    env = Flocking.for_rollout(N, commRadius=6.0, repelDist=1.0,
                               samplingTime=0.125,
                               rng=np.random.default_rng(1))
    ip, iv = env.compute_initial_positions(
        N, 1, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
    arch = archt.GraphRecurrentNN_DB(6, 4, 8, [2, 2], True, "tanh",
                                     "tanh", "tanh", [2], 1)
    params = arch.init(jax.random.PRNGKey(0), N=N, T=2)

    def policy(p, xw, Sw):
        B = xw.shape[0]
        z0 = jnp.zeros((B, 8, xw.shape[-1]), jnp.float32)
        return arch.apply(p, jnp.asarray(xw, jnp.float32), Sw, z0=z0)

    w = 3                                        # finite history window
    T = 5
    pos_ref, vel_ref, *_ = env.compute_trajectory(
        ip, iv, T * env.samplingTime, archit=policy, params=params,
        history_window=w, ell_degree=N, env_chunk=6, lam_iters=64)
    pos_p, vel_p, n_orig = par.pad_swarm(ip, iv, gmesh)
    roll = par.sharded_swarm_rollout(
        T, w, policy, env.commRadius, env.samplingTime, env.accelMax,
        d_max=N, mesh=gmesh, n_orig=n_orig, lam_iters=64)
    pos_s, vel_s, *_ = roll(params, pos_p, vel_p)
    np.testing.assert_allclose(np.asarray(pos_s)[..., :N], pos_ref,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(vel_s)[..., :N], vel_ref,
                               rtol=1e-4, atol=1e-4)


def test_sharded_swarm_rollout_step_mode_fused(gmesh):
    """Step-mode sharded rollout (the mesh form of the fused-policy
    path: registers all-gathered as env payload, policy math
    shard-local) == the single-chip fused grid rollout; the all-pairs
    payload path (masked matmul) agrees too; pads never move."""
    from graph_neural_networks_tpu.data.flocking import Flocking

    N = 10                                       # -> 2 pad agents
    env = Flocking.for_rollout(N, commRadius=6.0, repelDist=1.0,
                               samplingTime=0.125,
                               rng=np.random.default_rng(1))
    ip, iv = env.compute_initial_positions(
        N, 2, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
    arch = archt.LocalGNN_DB([6, 8], [2], True, "tanh", [2], 1)
    params = arch.init(jax.random.PRNGKey(0), N=N, T=2)
    T = 6
    grid = (256, 16)

    pos_ref, vel_ref, *_ = env.compute_trajectory(
        ip, iv, T * env.samplingTime, archit=arch, params=params,
        history_window=arch.causal_window, ell_degree=N,
        env_grid=grid, lam_iters=64, step_mode=True)

    pos_p, vel_p, n_orig = par.pad_swarm(ip, iv, gmesh)
    for env_grid in (grid, None):
        roll = par.sharded_swarm_rollout(
            T, arch.causal_window, arch, env.commRadius,
            env.samplingTime, env.accelMax, d_max=N, mesh=gmesh,
            n_orig=n_orig, lam_iters=64, env_grid=env_grid,
            step_mode=True)
        out = roll(params, pos_p, vel_p)
        if env_grid is not None:
            assert bool(out[-1]), "grid exactness flag tripped"
        pos_s, vel_s = np.asarray(out[0]), np.asarray(out[1])
        np.testing.assert_allclose(pos_s[..., :N], pos_ref,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(vel_s[..., :N], vel_ref,
                                   rtol=1e-4, atol=1e-4)
        pp = pos_s[..., n_orig:]
        np.testing.assert_allclose(
            pp, np.broadcast_to(pp[:, :1], pp.shape))


def test_sharded_ell_no_dense_at_scale(gmesh):
    """N=64k node-sharded DB shift: O(N·D/P) per chip, no N² anywhere."""
    N, B, T, D = 65536, 1, 2, 8
    rng = np.random.default_rng(5)
    idx = rng.integers(0, N, (B, T, N, D)).astype(np.int32)
    val = rng.standard_normal((B, T, 1, N, D)).astype(np.float32)
    ell = ell_lib.EllGso(jnp.asarray(idx), jnp.asarray(val))
    sgso = par.shard_ell(ell, gmesh)
    x = jnp.asarray(rng.standard_normal((B, T, 1, 2, N)), jnp.float32)
    y = sgso.db_shift(x)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())


def test_sharded_swarm_rollout_grid_env(gmesh):
    """The mesh-sharded GRID env (cell-list, O(Np*k) per chip)
    reproduces the single-device grid rollout; pads (parked far away,
    possibly aliasing into swarm cells on the modular grid) are
    distance-filtered and never move."""
    from graph_neural_networks_tpu.data.flocking import Flocking

    N = 10                                       # -> 2 pad agents
    env = Flocking.for_rollout(N, commRadius=6.0, repelDist=1.0,
                               samplingTime=0.125,
                               rng=np.random.default_rng(1))
    ip, iv = env.compute_initial_positions(
        N, 2, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)

    arch = archt.LocalGNN_DB([6, 8], [2], True, "tanh", [2], 1)
    params = arch.init(jax.random.PRNGKey(0), N=N, T=2)
    policy = lambda p, xw, Sw: arch.apply(
        p, jnp.asarray(xw, jnp.float32), Sw)
    w = arch.causal_window
    T = 6
    grid = (256, 16)

    pos_ref, vel_ref, *_ = env.compute_trajectory(
        ip, iv, T * env.samplingTime, archit=arch, params=params,
        history_window=w, ell_degree=N, env_grid=grid, lam_iters=64,
        step_mode=False)

    pos_p, vel_p, n_orig = par.pad_swarm(ip, iv, gmesh)
    roll = par.sharded_swarm_rollout(
        T, w, policy, env.commRadius, env.samplingTime, env.accelMax,
        d_max=N, mesh=gmesh, n_orig=n_orig, lam_iters=64,
        env_grid=grid)
    out = roll(params, pos_p, vel_p)
    pos_s, vel_s = out[0], out[1]
    assert bool(out[-1]), "grid-env exactness flag tripped"
    np.testing.assert_allclose(np.asarray(pos_s)[..., :N], pos_ref,
                               rtol=1e-4, atol=1e-4)
    pp = np.asarray(pos_s)[..., n_orig:]
    np.testing.assert_allclose(pp, np.broadcast_to(pp[:, :1], pp.shape))
