"""Source-loc normalized sweep at the FULL reference-driver protocol
(nTrain=8000 — diag_sourceloc4 used 1000, which depresses the
unnormalized baseline). Writes experiments/diag_sourceloc5.json."""
import json, os, sys, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from graph_neural_networks_tpu import data as D
from graph_neural_networks_tpu import training as T
from graph_neural_networks_tpu.models import architectures as archs
from graph_neural_networks_tpu.utils import graph as gt

HERE = os.path.dirname(os.path.abspath(__file__))
out_f = open(os.path.join(HERE, "diag_sourceloc5.json"), "w", buffering=1)

def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")

def run_one(seed, lr, normalize):
    rng = np.random.default_rng(seed)
    N, C = 100, 5
    G = gt.Graph("SBM", N, {"nCommunities": C, "probIntra": 0.8,
                            "probInter": 0.2}, rng=rng)
    G.compute_gft()
    S = G.W / np.max(np.diag(G.E).real)
    sources = gt.compute_source_nodes(G.A, C)
    data = D.SourceLocalization(G, 8000, 200, 200, sources, tMax=25,
                                rng=rng, normalize=normalize)
    data.expandDims()
    arch = archs.SelectionGNN([1, 32, 32], [5, 5], True, "relu",
                              [10, 10], "MaxPoolLocal", [6, 8], [C], S,
                              order="Degree")
    with tempfile.TemporaryDirectory() as td:
        model = T.Model(arch, T.losses.cross_entropy_loss,
                        {"name": "ADAM", "lr": lr}, T.Trainer, T.evaluate,
                        name="sl", saveDir=td, seed=seed)
        model.train(data, 40, 100, validationInterval=20)
        res = model.evaluate(data)
    return float(res["costBest"]), float(res["costLast"])

for (lr, normalize) in [(1e-3, True), (1e-3, False)]:
    bests = []
    for seed in (0, 1, 2):
        b, l = run_one(seed, lr, normalize)
        bests.append(b)
    emit(lr=lr, normalize=normalize, nTrain=8000,
         best_mean=float(np.mean(bests)), bests=bests)
emit(done=True)
