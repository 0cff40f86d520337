"""Training harness tests: Model/Trainer end-to-end on miniaturized versions
of the example tasks (SURVEY.md §4: integration tests asserting cost
decrease and metric contracts)."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from graph_neural_networks_tpu import data as D
from graph_neural_networks_tpu import training as T
from graph_neural_networks_tpu.models import architectures as archs
from graph_neural_networks_tpu.models import architectures_time as archt
from graph_neural_networks_tpu.utils import graph as gt

REF_DATASETS = "/root/reference/datasets"


@pytest.fixture(scope="module")
def G():
    return gt.Graph("SBM", 24, {"nCommunities": 3, "probIntra": 0.8,
                                "probInter": 0.2},
                    rng=np.random.default_rng(0))


def test_model_save_load_roundtrip(G, tmp_path):
    S = G.W / np.max(np.abs(np.linalg.eigvalsh(G.W)))
    arch = archs.SelectionGNN([1, 4], [3], True, "relu", [24], "NoPool", [1],
                              [3], S)
    model = T.Model(arch, T.losses.cross_entropy_loss,
                    {"name": "ADAM", "lr": 1e-3}, T.Trainer, T.evaluate,
                    name="roundtrip", saveDir=str(tmp_path))
    p0 = model.params
    model.save("Best")
    # mutate then restore
    import jax
    model.params = jax.tree_util.tree_map(lambda a: a + 1.0, model.params)
    model.load("Best")
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(model.params)):
        np.testing.assert_allclose(a, b)
    assert model.nParameters > 0


def test_trainer_source_localization(G, tmp_path):
    S = G.W / np.max(np.abs(np.linalg.eigvalsh(G.W)))
    srcs = gt.compute_source_nodes(G.A, 3)
    data = D.SourceLocalization(G, 120, 24, 24, srcs, tMax=3,
                                rng=np.random.default_rng(1))
    data.astype(np.float64)
    data.expandDims()
    arch = archs.SelectionGNN([1, 8, 8], [3, 3], True, "relu", [12, 6],
                              "MaxPoolLocal", [2, 2], [3], S, order="Degree")
    model = T.Model(arch, T.losses.cross_entropy_loss,
                    {"name": "ADAM", "lr": 5e-3}, T.Trainer, T.evaluate,
                    name="selGNN", saveDir=str(tmp_path))
    out = model.train(data, nEpochs=12, batchSize=20, validationInterval=6)
    assert out["lossTrain"][-3:].mean() < out["lossTrain"][:3].mean()
    assert os.path.exists(os.path.join(str(tmp_path), "savedModels",
                                       "selGNNBest.ckpt"))
    res = model.evaluate(data)
    assert res["costBest"] is not None and res["costBest"] <= 1.0
    # better than chance on this easy short-diffusion task
    assert res["costBest"] < 0.67
    # evalVars saved by default with the reference's filename layout
    assert os.path.exists(os.path.join(str(tmp_path), "evalVars",
                                       "selGNNevalVars.pkl"))


def test_trainer_resume(G, tmp_path):
    """Interrupt-and-resume: 4+4 resumed epochs reproduce the exact loss
    trajectory of an uninterrupted 8-epoch run (params, opt state, RNG
    streams all restored)."""
    import jax
    S = G.W / np.max(np.abs(np.linalg.eigvalsh(G.W)))
    srcs = gt.compute_source_nodes(G.A, 3)
    data = D.SourceLocalization(G, 60, 12, 12, srcs, tMax=3,
                                rng=np.random.default_rng(7))
    data.expandDims()

    def make_model(d):
        arch = archs.SelectionGNN([1, 4], [3], True, "relu", [24], "NoPool",
                                  [1], [3], S)
        return T.Model(arch, T.losses.cross_entropy_loss,
                       {"name": "ADAM", "lr": 5e-3}, T.Trainer, T.evaluate,
                       name="resume", saveDir=str(d), seed=0)

    m_full = make_model(tmp_path / "full")
    full = m_full.train(data, nEpochs=8, batchSize=20, validationInterval=3)

    m_part = make_model(tmp_path / "part")
    m_part.train(data, nEpochs=4, batchSize=20, validationInterval=3)
    out = m_part.train(data, nEpochs=8, batchSize=20, validationInterval=3,
                       resume=True)
    np.testing.assert_allclose(out["lossTrain"], full["lossTrain"],
                               rtol=1e-5)


def test_trainer_lr_decay_and_early_stopping(G, tmp_path):
    S = G.W / np.max(np.abs(np.linalg.eigvalsh(G.W)))
    srcs = gt.compute_source_nodes(G.A, 3)
    data = D.SourceLocalization(G, 60, 12, 12, srcs, tMax=3,
                                rng=np.random.default_rng(2))
    data.expandDims()
    arch = archs.SelectionGNN([1, 4], [3], True, "relu", [24], "NoPool", [1],
                              [3], S)
    model = T.Model(arch, T.losses.cross_entropy_loss,
                    {"name": "ADAM", "lr": 5e-3}, T.Trainer, T.evaluate,
                    name="decay", saveDir=str(tmp_path))
    out = model.train(data, nEpochs=6, batchSize=20, validationInterval=2,
                      learningRateDecayRate=0.5, learningRateDecayPeriod=2,
                      earlyStoppingLag=50)
    assert len(out["lossTrain"]) > 0


def test_trainer_single_node_movielens(tmp_path):
    data = D.MovieLens("movie", 25, 0.8, 0.1, kNN=8,
                       rng=np.random.default_rng(3))
    data.expandDims()
    W = data.getGraph()
    S = W / np.max(np.abs(np.linalg.eigvalsh(W)))
    # single-node training needs a per-node readout (LocalGNN)
    arch = archs.LocalGNN([1, 8], [4], True, "relu", [S.shape[0]], "NoPool",
                          [1], [1], S, order="Degree")
    model = T.Model(arch, T.losses.adapt_extra_dimension_loss(
                        T.losses.smooth_l1_loss),
                    {"name": "ADAM", "lr": 5e-3}, T.TrainerSingleNode,
                    T.evaluate_single_node, name="movie",
                    saveDir=str(tmp_path))
    out = model.train(data, nEpochs=10, batchSize=8, validationInterval=5)
    res = model.evaluate(data)
    assert res["costBest"] is not None
    assert res["costBest"] < 2.0  # RMSE on 1-5 scale after training


def test_trainer_epidemic_grnn(tmp_path):
    data = D.Epidemics(3, 0.05, 0.3, 4, 24, 8, 8, data_dir=REF_DATASETS,
                       rng=np.random.default_rng(4))
    data.expandDims()
    W = data.Adj.astype(np.float64)
    S = W / np.max(np.abs(np.linalg.eigvalsh(W)))
    arch = archs.GraphRecurrentNN(1, 2, 4, [2, 2], True, "tanh", "relu",
                                  "relu", [2], S)
    model = T.Model(arch, T.losses.f1_score_loss,
                    {"name": "ADAM", "lr": 5e-4}, T.Trainer, T.evaluate,
                    name="grnn", saveDir=str(tmp_path))
    out = model.train(data, nEpochs=3, batchSize=12, validationInterval=2)
    res = model.evaluate(data)
    assert res["costBest"] is not None
    assert 0.0 <= res["costBest"] <= 1.0


def _train_twice(make_model, data, tmp_path, **kw):
    """Train two identically-seeded models with scanDispatch on/off."""
    out = {}
    for mode, flag in (("scan", True), ("loop", False)):
        m = make_model(tmp_path / mode)
        out[mode] = m.train(data, scanDispatch=flag, **kw)
    return out["scan"], out["loop"]


def test_scan_dispatch_matches_loop(G, tmp_path):
    """Scanned multi-step dispatch reproduces the step-by-step loss AND
    validation trajectories exactly (same batches, same RNG key sequence,
    same validation cadence) — incl. the uneven last batch (50 = 3x16+2)
    and an LR schedule stepping inside the scanned runs."""
    S = G.W / np.max(np.abs(np.linalg.eigvalsh(G.W)))
    srcs = gt.compute_source_nodes(G.A, 3)
    data = D.SourceLocalization(G, 50, 12, 12, srcs, tMax=3,
                                rng=np.random.default_rng(11))
    data.expandDims()

    def make_model(d):
        arch = archs.SelectionGNN([1, 4], [3], True, "relu", [24], "NoPool",
                                  [1], [3], S)
        return T.Model(arch, T.losses.cross_entropy_loss,
                       {"name": "ADAM", "lr": 5e-3}, T.Trainer, T.evaluate,
                       name="scan", saveDir=str(d), seed=3)

    scan, loop = _train_twice(make_model, data, tmp_path, nEpochs=5,
                              batchSize=16, validationInterval=3,
                              learningRateDecayRate=0.9,
                              learningRateDecayPeriod=2)
    assert len(scan["lossTrain"]) == len(loop["lossTrain"]) == 5 * 4
    np.testing.assert_allclose(scan["lossTrain"], loop["lossTrain"],
                               rtol=1e-5)
    np.testing.assert_allclose(scan["costValid"], loop["costValid"],
                               rtol=1e-5)
    assert scan["bestEpoch"] == loop["bestEpoch"]
    assert scan["bestBatch"] == loop["bestBatch"]


def test_scan_dispatch_caps(G, tmp_path):
    """Int scanDispatch caps the run length; a tiny scanMemoryBudget forces
    run truncation — both still reproduce the step-by-step trajectory."""
    S = G.W / np.max(np.abs(np.linalg.eigvalsh(G.W)))
    srcs = gt.compute_source_nodes(G.A, 3)
    data = D.SourceLocalization(G, 48, 12, 12, srcs, tMax=3,
                                rng=np.random.default_rng(12))
    data.expandDims()

    def make_model(d):
        arch = archs.SelectionGNN([1, 4], [3], True, "relu", [24], "NoPool",
                                  [1], [3], S)
        return T.Model(arch, T.losses.cross_entropy_loss,
                       {"name": "ADAM", "lr": 5e-3}, T.Trainer, T.evaluate,
                       name="cap", saveDir=str(d), seed=4)

    ref = make_model(tmp_path / "ref").train(
        data, nEpochs=3, batchSize=12, validationInterval=8,
        scanDispatch=False)
    capped = make_model(tmp_path / "cap").train(
        data, nEpochs=3, batchSize=12, validationInterval=8, scanDispatch=2)
    tiny = make_model(tmp_path / "tiny").train(
        data, nEpochs=3, batchSize=12, validationInterval=8,
        scanMemoryBudget=1)  # every run truncates to a single step
    np.testing.assert_allclose(capped["lossTrain"], ref["lossTrain"],
                               rtol=1e-5)
    np.testing.assert_allclose(tiny["lossTrain"], ref["lossTrain"],
                               rtol=1e-5)


def test_scan_dispatch_single_node(tmp_path):
    """TrainerSingleNode scans its (x, y, node_pos) steps identically."""
    data = D.MovieLens("movie", 25, 0.8, 0.1, kNN=8,
                       rng=np.random.default_rng(13))
    data.expandDims()
    W = data.getGraph()
    S = W / np.max(np.abs(np.linalg.eigvalsh(W)))

    def make_model(d):
        arch = archs.LocalGNN([1, 8], [4], True, "relu", [S.shape[0]],
                              "NoPool", [1], [1], S, order="Degree")
        return T.Model(arch, T.losses.adapt_extra_dimension_loss(
                           T.losses.smooth_l1_loss),
                       {"name": "ADAM", "lr": 5e-3}, T.TrainerSingleNode,
                       T.evaluate_single_node, name="movie", saveDir=str(d),
                       seed=5)

    scan, loop = _train_twice(make_model, data, tmp_path, nEpochs=4,
                              batchSize=8, validationInterval=4)
    np.testing.assert_allclose(scan["lossTrain"], loop["lossTrain"],
                               rtol=1e-5)


def test_scan_dispatch_flocking_random_epoch(tmp_path):
    """randomEpoch DAGger only mutates data at epoch start, so its steps
    scan; trajectories must match the step-by-step run (the policy rollouts
    see identical params at each epoch boundary)."""
    data = D.Flocking(nAgents=8, commRadius=6.0, repelDist=1.0, nTrain=12,
                      nValid=4, nTest=4, duration=0.5, samplingTime=0.1,
                      rng=np.random.default_rng(14))

    def make_model(d):
        arch = archt.LocalGNN_DB([6, 8], [2], True, "tanh", [2], 1)
        return T.Model(arch, T.losses.mse_loss, {"name": "ADAM", "lr": 5e-4},
                       T.TrainerFlocking, T.evaluate_flocking, name="flock",
                       saveDir=str(d), N=8, T=5, seed=6)

    scan, loop = _train_twice(make_model, data, tmp_path, nEpochs=3,
                              batchSize=6, validationInterval=2,
                              probExpert=0.993, DAGgerType="randomEpoch")
    np.testing.assert_allclose(scan["lossTrain"], loop["lossTrain"],
                               rtol=1e-4)


def test_mesh_data_parallel_trainer(G, tmp_path):
    """Trainer(mesh=...) data-parallel training on the 8-device virtual
    mesh reproduces single-device trajectories (replicated params,
    batch sharded on 'data', GSPMD gradient all-reduce), composed with
    scan dispatch; the uneven last batch (52 = 3x16+4, 4 % 8 != 0)
    falls back to replicated."""
    import jax
    from jax.sharding import Mesh
    S = G.W / np.max(np.abs(np.linalg.eigvalsh(G.W)))
    srcs = gt.compute_source_nodes(G.A, 3)
    data = D.SourceLocalization(G, 52, 12, 12, srcs, tMax=3,
                                rng=np.random.default_rng(15))
    data.expandDims()

    def make_model(d):
        arch = archs.SelectionGNN([1, 4], [3], True, "relu", [24], "NoPool",
                                  [1], [3], S)
        return T.Model(arch, T.losses.cross_entropy_loss,
                       {"name": "ADAM", "lr": 5e-3}, T.Trainer, T.evaluate,
                       name="dp", saveDir=str(d), seed=7)

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = Mesh(np.array(devs[:8]), ("data",))
    ref = make_model(tmp_path / "single").train(
        data, nEpochs=4, batchSize=16, validationInterval=3)
    dp = make_model(tmp_path / "mesh").train(
        data, nEpochs=4, batchSize=16, validationInterval=3, mesh=mesh)
    np.testing.assert_allclose(dp["lossTrain"], ref["lossTrain"],
                               rtol=1e-4)
    np.testing.assert_allclose(dp["costValid"], ref["costValid"],
                               rtol=1e-4)


def test_mesh_hybrid_graph_sharded_trainer(tmp_path):
    """Hybrid dp x graph parallelism through the HARNESS: a node-sharded
    SelectionGNN (arch.shard over the 'graph' axis, ring halo SpMM)
    trained by Trainer(mesh=...) with the batch on 'data' — trajectory
    matches the dense single-device run."""
    import jax
    from graph_neural_networks_tpu import parallel as par
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    # banded graph so the ring path engages under the partition
    N = 32
    rng = np.random.default_rng(16)
    W = np.zeros((N, N))
    for i in range(N - 1):
        W[i, i + 1] = W[i + 1, i] = 1.0
    for i in range(N - 2):
        W[i, i + 2] = W[i + 2, i] = 0.5
    S = W / np.max(np.abs(np.linalg.eigvalsh(W)))
    G2 = gt.Graph("adjacency", N, {"adjacencyMatrix": W})
    srcs = [0, N // 2]
    data = D.SourceLocalization(G2, 48, 16, 16, srcs, tMax=4,
                                rng=np.random.default_rng(17))
    data.expandDims()

    def make_model(d, sharded):
        arch = archs.SelectionGNN([1, 4], [3], True, "relu", [N], "NoPool",
                                  [1], [2], S)
        mesh = None
        if sharded:
            mesh = par.make_mesh((2, 4))
            arch.shard(mesh, 4, data_axis="data")
            assert arch.ctx["S"].uses_ring
        m = T.Model(arch, T.losses.cross_entropy_loss,
                    {"name": "ADAM", "lr": 5e-3}, T.Trainer, T.evaluate,
                    name="hybrid", saveDir=str(d), seed=8)
        return m, mesh

    m_ref, _ = make_model(tmp_path / "dense", sharded=False)
    ref = m_ref.train(data, nEpochs=3, batchSize=16, validationInterval=2)
    m_sh, mesh = make_model(tmp_path / "sharded", sharded=True)
    sh = m_sh.train(data, nEpochs=3, batchSize=16, validationInterval=2,
                    mesh=mesh, meshAxis="data")
    np.testing.assert_allclose(sh["lossTrain"], ref["lossTrain"],
                               rtol=2e-4)
    np.testing.assert_allclose(sh["costValid"], ref["costValid"],
                               atol=1e-6)


def test_trainer_flocking_dagger(tmp_path):
    data = D.Flocking(nAgents=8, commRadius=6.0, repelDist=1.0, nTrain=12,
                      nValid=4, nTest=4, duration=0.5, samplingTime=0.1,
                      rng=np.random.default_rng(5))
    arch = archt.LocalGNN_DB([6, 8], [2], True, "tanh", [2], 1)
    model = T.Model(arch, T.losses.mse_loss, {"name": "ADAM", "lr": 5e-4},
                    T.TrainerFlocking, T.evaluate_flocking, name="flock",
                    saveDir=str(tmp_path), N=8, T=5)
    out = model.train(data, nEpochs=2, batchSize=6, validationInterval=2,
                      probExpert=0.993, DAGgerType="randomEpoch")
    assert len(out["lossTrain"]) == 4
    res = model.evaluate(data)
    assert "costBestFull" in res and np.isfinite(res["costBestFull"])
    assert "costBestEnd" in res


def test_bf16_mixed_precision_training(tmp_path):
    """precision='bf16': f32 master params, bf16 forward/backward; loss
    trajectory tracks f32 closely and the evaluated error matches."""
    import jax
    rng = np.random.default_rng(0)
    G = gt.Graph("SBM", 40, {"nCommunities": 4, "probIntra": 0.8,
                             "probInter": 0.2}, rng=rng)
    S = G.W / np.max(np.abs(np.linalg.eigvalsh(G.W)))
    srcs = gt.compute_source_nodes(G.A, 4)
    data = D.SourceLocalization(G, 200, 40, 40, srcs, tMax=15, rng=rng)
    data.expandDims()

    def run(prec):
        arch = archs.SelectionGNN([1, 8], [3], True, "relu", [40],
                                  "NoPool", [1], [4], S, order="Degree")
        m = T.Model(arch, T.losses.cross_entropy_loss,
                    {"name": "ADAM", "lr": 5e-3}, T.Trainer, T.evaluate,
                    name=f"p_{prec}", saveDir=str(tmp_path), seed=0)
        out = m.train(data, nEpochs=6, batchSize=50, validationInterval=4,
                      precision=prec, seed=0)
        pdt = {str(l.dtype) for l in jax.tree_util.tree_leaves(m.params)}
        return np.asarray(out["lossTrain"]), pdt

    l32, _ = run(None)
    lbf, pdt = run("bf16")
    assert pdt == {"float32"}
    assert np.isfinite(lbf).all()
    np.testing.assert_allclose(lbf, l32, rtol=0.05, atol=0.02)


def test_bf16_ctx_cast_invalidated_by_changeGSO(G):
    """changeGSO must drop the per-dtype GSO cast memo: a bf16 forward
    after changeGSO has to see the NEW graph (regression: the stale
    bf16 ctx made post-changeGSO bf16 forwards compute on the old S)."""
    import jax
    rng = np.random.default_rng(0)
    S1 = G.W / np.max(np.abs(np.linalg.eigvalsh(G.W)))
    G2 = gt.Graph("SBM", S1.shape[0], {"nCommunities": 2,
                                       "probIntra": 0.9,
                                       "probInter": 0.1},
                  rng=np.random.default_rng(9))
    S2 = G2.W / np.max(np.abs(np.linalg.eigvalsh(G2.W)))
    N = S1.shape[0]
    arch = archs.SelectionGNN([1, 8], [3], True, "relu", [N], "NoPool",
                              [1], [3], S1)
    params = arch.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((4, 1, N)), jnp.bfloat16)
    y1 = np.asarray(arch(params, x), np.float32)
    arch.changeGSO(S2)
    y2 = np.asarray(arch(params, x), np.float32)
    y2_f32 = np.asarray(arch(params, x.astype(jnp.float32)))
    assert np.abs(y2 - y1).max() > 1e-4, "bf16 forward ignored changeGSO"
    np.testing.assert_allclose(y2, y2_f32, rtol=0.1, atol=0.05)


# -- device-resident DAGger store (round 5) -----------------------------

def _flock_data(seed=21, nTrain=12):
    return D.Flocking(nAgents=8, commRadius=6.0, repelDist=1.0,
                      nTrain=nTrain, nValid=4, nTest=4, duration=0.5,
                      samplingTime=0.1, rng=np.random.default_rng(seed))


def test_device_recompute_matches_stored(tmp_path):
    """_jnp_recompute_supervision(pos, vel) reproduces the constructor's
    states / expert accel / normalized comm graphs (the device-store
    train step recomputes these per batch instead of storing them)."""
    from graph_neural_networks_tpu.data import flocking as F
    data = _flock_data()
    pos = jnp.asarray(data.getData("pos", "train"), jnp.float32)
    vel = jnp.asarray(data.getData("vel", "train"), jnp.float32)
    x, y, S = F._jnp_recompute_supervision(
        pos, vel, data.commRadius, data.repelDist, data.accelMax)
    np.testing.assert_allclose(np.asarray(x),
                               data.getData("state", "train"),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(y),
                               data.getData("accel", "train"),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(S),
                               data.getData("commGraph", "train"),
                               rtol=2e-4, atol=2e-4)


def test_rollout_traj_device_matches_compute_trajectory(tmp_path):
    """rollout_traj_device's (pos, vel) equal compute_trajectory's for
    the same policy/params (same compiled step closures, posvel-only
    outputs)."""
    import jax
    data = _flock_data(seed=22)
    arch = archt.LocalGNN_DB([6, 8], [2], True, "tanh", [2], 1)
    params = arch.init(jax.random.PRNGKey(3), N=8, T=5)
    ip = data.getData("initPos", "valid")
    iv = data.getData("initVel", "valid")
    want_p, want_v, *_ = data.compute_trajectory(
        ip, iv, data.duration, archit=arch, params=params,
        history_window=arch.causal_window)
    pos, vel = data.rollout_traj_device(
        ip, iv, data.duration, arch, params,
        history_window=arch.causal_window)
    np.testing.assert_allclose(np.asarray(pos), want_p, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(vel), want_v, rtol=1e-5,
                               atol=1e-5)


def test_device_store_trainer_parity(tmp_path):
    """deviceStore=True reproduces the host-store training trajectory
    (no DAGger: identical batches; the only differences are f32 vs f64
    recompute rounding)."""
    def run(d, device):
        data = _flock_data(seed=23)
        arch = archt.LocalGNN_DB([6, 8], [2], True, "tanh", [2], 1)
        model = T.Model(arch, T.losses.mse_loss,
                        {"name": "ADAM", "lr": 5e-4}, T.TrainerFlocking,
                        T.evaluate_flocking, name="flock",
                        saveDir=str(d), N=8, T=5, seed=6)
        return model.train(data, nEpochs=2, batchSize=6,
                           validationInterval=2, deviceStore=device)

    host = run(tmp_path / "host", False)
    dev = run(tmp_path / "dev", True)
    np.testing.assert_allclose(dev["lossTrain"], host["lossTrain"],
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(dev["costValid"], host["costValid"],
                               rtol=2e-3, atol=2e-4)


def test_device_store_dagger_random_epoch(tmp_path):
    """randomEpoch DAGger over the device store: learner trajectories
    re-rolled on device (chunked, sentinel-padded scatter), training
    runs end-to-end, and the store actually mutates."""
    import jax
    data = _flock_data(seed=24)
    arch = archt.LocalGNN_DB([6, 8], [2], True, "tanh", [2], 1)
    model = T.Model(arch, T.losses.mse_loss, {"name": "ADAM", "lr": 5e-4},
                    T.TrainerFlocking, T.evaluate_flocking, name="flock",
                    saveDir=str(tmp_path), N=8, T=5, seed=6)
    trainer = T.TrainerFlocking(model, data, nEpochs=3, batchSize=6,
                                validationInterval=2, probExpert=0.5,
                                DAGgerType="randomEpoch",
                                deviceStore=True, seed=6,
                                rolloutChunk=4)
    out = trainer.train()
    assert np.isfinite(out["lossTrain"]).all()
    assert np.isfinite(out["costValid"]).all()
    # after the last randomEpoch, some learner trajectories re-rolled
    assert float(jnp.abs(trainer.posAll - trainer.posOrig).max()) > 0


def test_device_store_replace_time_batch(tmp_path):
    data = _flock_data(seed=25)
    arch = archt.LocalGNN_DB([6, 8], [2], True, "tanh", [2], 1)
    model = T.Model(arch, T.losses.mse_loss, {"name": "ADAM", "lr": 5e-4},
                    T.TrainerFlocking, T.evaluate_flocking, name="flock",
                    saveDir=str(tmp_path), N=8, T=5, seed=6)
    trainer = T.TrainerFlocking(model, data, nEpochs=2, batchSize=6,
                                validationInterval=2, probExpert=0.9,
                                DAGgerType="replaceTimeBatch",
                                deviceStore=True, seed=6,
                                rolloutChunk=4)
    out = trainer.train()
    assert np.isfinite(out["lossTrain"]).all()
    assert float(jnp.abs(trainer.posAll - trainer.posOrig).max()) > 0


def test_grid_device_store_recompute_matches_large(tmp_path):
    """_jnp_recompute_supervision_grid reproduces Flocking.large's
    stored supervision (states / expert labels / ELL graphs) from pos/
    vel alone — the 262k+ training-batch recompute, checked at small N
    against the host-stored generation."""
    from graph_neural_networks_tpu.data.flocking import (
        Flocking, _jnp_recompute_supervision_grid)
    D_ell = 16
    data = Flocking.large(16, commRadius=6.0, repelDist=1.0, nTrain=4,
                          nValid=2, nTest=2, duration=0.5,
                          samplingTime=0.1, ell_degree=D_ell,
                          rng=np.random.default_rng(31), env_grid=True)
    pos = jnp.asarray(data.getData("pos", "train"), jnp.float32)
    vel = jnp.asarray(data.getData("vel", "train"), jnp.float32)
    x, y, (gi, gv), ok = _jnp_recompute_supervision_grid(
        pos, vel, data.commRadius, data.repelDist, 100.0, D_ell,
        True, lam_iters=8)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(x),
                               data.getData("state", "train"),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(y),
                               data.getData("accel", "train"),
                               rtol=2e-3, atol=2e-3)
    S = data.getData("commGraph", "train")
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(S.idx))
    np.testing.assert_allclose(np.asarray(gv)[:, :, 0],
                               np.asarray(S.val)[:, :, 0],
                               rtol=2e-3, atol=2e-3)


def test_grid_device_store_trainer(tmp_path):
    """Flocking.large_device + TrainerFlocking(deviceStore=True,
    ellDegree=D): end-to-end grid-recompute training with randomEpoch
    DAGger — nothing O(T*N*D) stored, losses finite, store mutates."""
    from graph_neural_networks_tpu.data.flocking import Flocking
    data = Flocking.large_device(16, commRadius=6.0, repelDist=1.0,
                                 nTrain=6, nValid=2, nTest=2,
                                 duration=0.5, samplingTime=0.1,
                                 ell_degree=12,
                                 rng=np.random.default_rng(32))
    arch = archt.LocalGNN_DB([6, 8], [2], True, "tanh", [2], 1)
    model = T.Model(arch, T.losses.mse_loss, {"name": "ADAM", "lr": 5e-4},
                    T.TrainerFlocking, T.evaluate_flocking, name="flock",
                    saveDir=str(tmp_path), N=16, T=5, seed=6)
    trainer = T.TrainerFlocking(model, data, nEpochs=3, batchSize=3,
                                validationInterval=2, probExpert=0.5,
                                DAGgerType="randomEpoch",
                                deviceStore=True, ellDegree=12, seed=6,
                                rolloutChunk=3)
    out = trainer.train()
    assert np.isfinite(out["lossTrain"]).all()
    assert np.isfinite(out["costValid"]).all()
    assert float(jnp.abs(trainer.posAll - trainer.posOrig).max()) > 0


def test_evaluate_cost_device_matches_evaluate():
    """flocking.evaluate_cost_device (the single device-side cost
    behind deviceStore validation and the largeswarm driver) equals
    Flocking.evaluate on the same velocity trajectory."""
    from graph_neural_networks_tpu.data.flocking import (
        evaluate_cost_device)
    data = _flock_data(seed=26)
    vel = data.getData("vel", "test")
    want = float(data.evaluate(vel=vel))
    got = float(evaluate_cost_device(jnp.asarray(vel, jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
