"""Diagnose the round-1 epidemic gate inversion (VERDICT item 9):
GatedGRNN-time (0.742) underperformed plain GRNN (0.609) at the
reference's 10-epoch config. Sweep epochs x lr for plain vs time-gate
and record the trajectory — is the time gate slower to optimize (our
gates are trainable, unlike the reference's never-trained gate modules,
graphML.py:3838) or genuinely worse?
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from graph_neural_networks_tpu import data as D
from graph_neural_networks_tpu import training as T
from graph_neural_networks_tpu.models import architectures as archs

rng = np.random.default_rng(0)
seqLen, nTrain, nValid, nTest = 8, 1000, 120, 200
H, K = 12, [5, 5]
data = D.Epidemics(seqLen, 0.05, 0.3, 4, nTrain, nValid, nTest,
                   data_dir="/root/reference/datasets", rng=rng)
data.expandDims()
W = data.Adj.astype(np.float64)
S = W / np.max(np.abs(np.linalg.eigvalsh(W)))

for gate in (None, "time"):
    for lr, epochs in ((5e-4, 10), (5e-4, 40), (1e-3, 40)):
        name = f"{'plain' if gate is None else gate}-lr{lr}-e{epochs}"
        if gate is None:
            arch = archs.GraphRecurrentNN(1, 2, H, K, True, "tanh", "relu",
                                          "relu", [2], S)
        else:
            arch = archs.GatedGraphRecurrentNN(1, 2, H, K, True, "tanh",
                                               "relu", "relu", [2], S,
                                               gateType=gate)
        model = T.Model(arch, T.losses.f1_score_loss,
                        {"name": "ADAM", "lr": lr}, T.Trainer, T.evaluate,
                        name=name, saveDir="/tmp/diag_epi", seed=0, T=seqLen)
        model.train(data, epochs, 100, validationInterval=5)
        res = model.evaluate(data)
        print(f"{name}: best {res['costBest']:.4f} last {res['costLast']:.4f}",
              flush=True)
