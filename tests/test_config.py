"""Typed config system + registry (SURVEY §5: no eval())."""

import numpy as np
import pytest

from graph_neural_networks_tpu.utils import config as C


def test_registry_resolves_all_architectures():
    names = C.list_architectures()
    assert "SelectionGNN" in names and "GraphRecurrentNN" in names \
        and "LocalGNN_DB" in names
    cls = C.get_architecture("SelectionGNN")
    from graph_neural_networks_tpu.models.architectures import SelectionGNN
    assert cls is SelectionGNN
    with pytest.raises(KeyError):
        C.get_architecture("NopeGNN")


def test_config_roundtrip(tmp_path):
    cfg = C.ExperimentConfig(
        name="sourceloc", seed=3,
        graph=C.GraphConfig(graphType="SBM", nNodes=40,
                            options={"nCommunities": 4}),
        model=C.ModelConfig(architecture="SelectionGNN",
                            kwargs={"dimNodeSignals": [1, 8],
                                    "nFilterTaps": [3]}),
        training=C.TrainingConfig(nEpochs=5, lr=2e-3))
    p = tmp_path / "cfg.json"
    cfg.save(str(p))
    cfg2 = C.ExperimentConfig.load(str(p))
    assert cfg2.to_dict() == cfg.to_dict()
    assert cfg2.training.lr == 2e-3 and cfg2.graph.nNodes == 40


def test_config_rejects_unknown_and_mistyped():
    with pytest.raises(ValueError):
        C.TrainingConfig.from_dict({"nEpochs": 5, "nEpoch": 7})
    with pytest.raises(TypeError):
        C.TrainingConfig.from_dict({"nEpochs": "forty"})
    # int where float declared is coerced, not rejected
    t = C.TrainingConfig.from_dict({"lr": 1})
    assert t.lr == 1.0 and isinstance(t.lr, float)


def test_model_config_builds_architecture():
    from graph_neural_networks_tpu.utils import graph as gt
    rng = np.random.default_rng(0)
    W = gt.create_graph("SBM", 20, {"nCommunities": 2, "probIntra": 0.8,
                                    "probInter": 0.2}, rng=rng)
    S = W / np.max(np.abs(np.linalg.eigvalsh(W)))
    mc = C.ModelConfig(architecture="SelectionGNN",
                       kwargs=dict(dimNodeSignals=[1, 4], nFilterTaps=[3],
                                   bias=True, nonlinearity="relu",
                                   nSelectedNodes=[20],
                                   poolingFunction="NoPool",
                                   poolingSize=[1], dimLayersMLP=[2]))
    arch = mc.build(S)
    import jax
    params = arch.init(jax.random.PRNGKey(0))
    y = arch.apply(params, np.zeros((2, 1, 20), np.float32))
    assert y.shape == (2, 2)
