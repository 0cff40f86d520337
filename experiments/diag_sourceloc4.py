"""Source-localization quality sweep (CPU): reference config (SBM
N=100, C=5, tMax=25, SelectionGNN-Degree F=[1,32,32] K=[5,5] pooling
[10,10]), averaged over data/graph realizations — can per-node
normalization and/or lr beat the round-1 full-config 0.27 error?

Writes JSON lines to experiments/diag_sourceloc4.json.
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from graph_neural_networks_tpu import data as D  # noqa: E402
from graph_neural_networks_tpu import training as T  # noqa: E402
from graph_neural_networks_tpu.models import architectures as archs  # noqa: E402
from graph_neural_networks_tpu.utils import graph as gt  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "diag_sourceloc4.json")
out_f = open(OUT, "w", buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def run_one(seed, lr, normalize, nEpochs=40):
    rng = np.random.default_rng(seed)
    N, C = 100, 5
    G = gt.Graph("SBM", N, {"nCommunities": C, "probIntra": 0.8,
                            "probInter": 0.2}, rng=rng)
    G.compute_gft()
    S = G.W / np.max(np.diag(G.E).real)
    sources = gt.compute_source_nodes(G.A, C)
    data = D.SourceLocalization(G, 1000, 120, 200, sources, tMax=25,
                                rng=rng, normalize=normalize)
    data.expandDims()
    arch = archs.SelectionGNN([1, 32, 32], [5, 5], True, "relu",
                              [10, 10], "MaxPoolLocal", [6, 8], [C], S,
                              order="Degree")
    with tempfile.TemporaryDirectory() as td:
        model = T.Model(arch, T.losses.cross_entropy_loss,
                        {"name": "ADAM", "lr": lr}, T.Trainer, T.evaluate,
                        name="sl", saveDir=td, seed=seed)
        model.train(data, nEpochs, 100, validationInterval=5)
        res = model.evaluate(data)
    return float(res["costBest"]), float(res["costLast"])


def main():
    for (lr, normalize) in [(1e-3, False), (1e-3, True), (5e-4, True),
                            (2e-3, True)]:
        bests, lasts = [], []
        for seed in (0, 1, 2):
            b, l = run_one(seed, lr, normalize)
            bests.append(b)
            lasts.append(l)
        emit(lr=lr, normalize=normalize,
             best_mean=float(np.mean(bests)),
             best_std=float(np.std(bests)),
             last_mean=float(np.mean(lasts)), bests=bests)

    emit(done=True)


if __name__ == "__main__":
    main()
