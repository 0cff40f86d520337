"""Part 3: apply normalization to the EXACT round-1 seed pipeline that
produced the 0.42 plateau (same rng sequence as diag_sourceloc.py)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from graph_neural_networks_tpu.utils import graph as gt
from graph_neural_networks_tpu import data as D
from graph_neural_networks_tpu import training as T
from graph_neural_networks_tpu.models import architectures as archs

rng = np.random.default_rng(0)
N, C, tMax = 100, 5, 100
G = gt.Graph("SBM", N, {"nCommunities": C, "probIntra": 0.8,
                        "probInter": 0.2}, rng=rng)
G.compute_gft()
S = G.W / np.max(np.diag(G.E).real)
sources = gt.compute_source_nodes(G.A, C)
data = D.SourceLocalization(G, 8000, 200, 200, sources, tMax=tMax, rng=rng)
xtr = data.samples["train"]["signals"]
mu = xtr.mean(0, keepdims=True)
sd = xtr.std(0, keepdims=True); sd[sd < 1e-12] = 1.0
for t in ("train", "valid", "test"):
    data.samples[t]["signals"] = (data.samples[t]["signals"] - mu) / sd
data.expandDims()
for order in ("Degree", "EDS"):
    arch = archs.SelectionGNN([1, 32, 32], [5, 5], True, "relu", [10, 10],
                              "MaxPoolLocal", [6, 8], [C], S, order=order)
    model = T.Model(arch, T.losses.cross_entropy_loss,
                    {"name": "ADAM", "lr": 1e-3}, T.Trainer, T.evaluate,
                    name=f"norm{order}", saveDir="/tmp/diag_sl3")
    model.train(data, nEpochs=40, batchSize=100, validationInterval=40)
    res = model.evaluate(data)
    print(f"norm=True order={order}: best {res['costBest']:.3f} "
          f"last {res['costLast']:.3f}", flush=True)
