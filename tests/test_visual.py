"""Observability: Visualizer scalar/figure/export contracts."""

import json
import os

import numpy as np

from graph_neural_networks_tpu.utils.visual import (
    Visualizer, timed, edges_per_second)


def test_visualizer_scalars_and_export(tmp_path):
    v = Visualizer(str(tmp_path), name="run1")
    v.scalar_summary("Training", 0, lossTrain=1.5)
    v.scalar_summary("Training", 1, lossTrain=1.2)
    v.scalar_summary("Validation", 1, costValid=0.4)
    v.histogram_summary("grads", np.arange(10.0))
    v.text_summary("config", "lr=1e-3")
    lines = [json.loads(l) for l in open(v.path)]
    assert len(lines) == 5
    assert lines[0] == {"mode": "Training", "epoch": 0, "lossTrain": 1.5}
    out = v.export_json()
    data = json.load(open(out))
    assert len(data["Training"]) == 2
    assert data["Validation"][0]["costValid"] == 0.4


def test_visualizer_figure(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    matplotlib.rcParams["text.usetex"] = False
    import matplotlib.pyplot as plt
    v = Visualizer(str(tmp_path))
    fig, ax = plt.subplots()
    ax.plot([1, 2, 3])
    p = v.figure_summary("loss", fig)
    assert os.path.exists(p)


def test_timing_helpers():
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: x * 2)
    t = timed(f, jnp.ones(8), iters=3, warmup=1)
    assert t > 0
    assert edges_per_second(100, 10, 4, 2.0) == 2000.0
