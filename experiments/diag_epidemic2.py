"""Epidemic quality sweep round-2b (CPU): can longer training / higher
lr / wider hidden state push 1-F1 below the round-2 best (0.534,
GatedGRNN-node at 40 epochs lr 1e-3)? Sweeps {lr} x {epochs} x {H} for
the plain GRNN and the node gate on the full reference-config task
(SocioPatterns N=134, seqLen 8, fixed SIR).

Writes JSON lines to experiments/diag_epidemic2.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from graph_neural_networks_tpu import data as D  # noqa: E402
from graph_neural_networks_tpu import training as T  # noqa: E402
from graph_neural_networks_tpu.models import architectures as archs  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "diag_epidemic2.json")
out_f = open(OUT, "w", buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def main():
    seqLen, nTrain, nValid, nTest, batch = 8, 1000, 120, 200, 100
    rng = np.random.default_rng(0)
    data = D.Epidemics(seqLen, 0.05, 0.3, 4, nTrain, nValid, nTest,
                       data_dir="/root/reference/datasets", rng=rng)
    data.expandDims()
    W = data.Adj.astype(np.float64)
    S = W / np.max(np.abs(np.linalg.eigvalsh(W)))
    emit(N=int(data.N), seqLen=seqLen)

    import tempfile
    for (kind, H, K, lr, epochs) in [
            ("grnn", 12, [5, 5], 1e-3, 80),
            ("grnn", 24, [5, 5], 1e-3, 80),
            ("node", 12, [5, 5], 1e-3, 80),
            ("grnn", 12, [5, 5], 2e-3, 80),
            ("node", 24, [5, 5], 1e-3, 80),
            ("grnn", 24, [3, 3], 1e-3, 120),
    ]:
        if kind == "grnn":
            arch = archs.GraphRecurrentNN(1, 2, H, K, True, "tanh",
                                          "relu", "relu", [2], S)
        else:
            arch = archs.GatedGraphRecurrentNN(1, 2, H, K, True, "tanh",
                                               "relu", "relu", [2], S,
                                               gateType="node")
        with tempfile.TemporaryDirectory() as td:
            model = T.Model(arch, T.losses.f1_score_loss,
                            {"name": "ADAM", "lr": lr}, T.Trainer,
                            T.evaluate, name=f"{kind}H{H}",
                            saveDir=td, seed=0, T=seqLen)
            model.train(data, epochs, batch, validationInterval=5)
            res = model.evaluate(data)
        emit(kind=kind, H=H, K=K, lr=lr, epochs=epochs,
             best=float(res["costBest"]), last=float(res["costLast"]))

    emit(done=True)


if __name__ == "__main__":
    main()
