"""Source-loc tMax=100 plateau, part 2: improvement attempts.
(1) per-node standardization of the diffused signals (the fine structure
    that distinguishes sources at large t is ~1e-6 against O(0.1)
    magnitudes — rescaling makes it visible to f32 training),
(2) LR decay (Best=0.42 early then Last=0.63 shows late-training
    collapse).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from graph_neural_networks_tpu.utils import graph as gt
from graph_neural_networks_tpu.data.base import normalize_data
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

for norm, lr, decay in ((False, 1e-3, None), (True, 1e-3, None),
                        (True, 1e-3, (0.5, 10)), (False, 1e-3, (0.5, 10))):
    data = D.SourceLocalization(G, 8000, 200, 200, sources, tMax=tMax,
                                rng=np.random.default_rng(1))
    if norm:
        # standardize each node's signal using training statistics
        xtr = data.samples["train"]["signals"]
        mu = xtr.mean(0, keepdims=True)
        sd = xtr.std(0, keepdims=True); sd[sd < 1e-12] = 1.0
        for t in ("train", "valid", "test"):
            data.samples[t]["signals"] = \
                (data.samples[t]["signals"] - mu) / sd
    data.expandDims()
    arch = archs.SelectionGNN([1, 32, 32], [5, 5], True, "relu", [10, 10],
                              "MaxPoolLocal", [6, 8], [C], S, order="Degree")
    kw = {}
    if decay:
        kw = dict(learningRateDecayRate=decay[0],
                  learningRateDecayPeriod=decay[1])
    model = T.Model(arch, T.losses.cross_entropy_loss,
                    {"name": "ADAM", "lr": lr}, T.Trainer, T.evaluate,
                    name=f"n{norm}d{bool(decay)}", saveDir="/tmp/diag_sl2")
    model.train(data, nEpochs=40, batchSize=100, validationInterval=40, **kw)
    res = model.evaluate(data)
    print(f"norm={norm} lr={lr} decay={decay}: best {res['costBest']:.3f} "
          f"last {res['costLast']:.3f}", flush=True)
