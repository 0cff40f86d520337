"""MovieLens quality sweep (CPU): can lr / epochs / width /
interpolation push single-node RMSE below the round-1 best (0.425,
LocalGNN 2-layer)? Synthetic low-rank ratings (real u.data absent),
same pipeline as examples/movielens.py.

Writes JSON lines to experiments/diag_movielens2.json.
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

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "diag_movielens2.json")
out_f = open(OUT, "w", buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def main():
    rng = np.random.default_rng(0)
    data = D.MovieLens("movie", 50, 0.9, 0.1, kNN=10, rng=rng)
    data.expandDims()
    W = data.getGraph().astype(np.float64)
    S = W / np.max(np.abs(np.linalg.eigvalsh(W)))
    N = S.shape[0]
    loss = T.losses.smooth_l1_loss
    emit(N=N)

    for (layers, F, K, lr, epochs, interp) in [
            (2, [1, 64, 32], [5, 5], 5e-3, 80, False),
            (2, [1, 64, 32], [5, 5], 1e-3, 80, False),
            (2, [1, 128, 64], [5, 5], 5e-3, 80, False),
            (2, [1, 64, 32], [5, 5], 5e-3, 40, True),
            (1, [1, 64], [5], 5e-3, 80, False),
    ]:
        d = data
        if interp:
            d = D.MovieLens("movie", 50, 0.9, 0.1, kNN=10,
                            rng=np.random.default_rng(0))
            d.interpolateRatings()
            d.expandDims()
        arch = archs.LocalGNN(F, K, True, "relu", [N] * layers, "NoPool",
                              [1] * layers, [1], S, order="Degree")
        with tempfile.TemporaryDirectory() as td:
            model = T.Model(arch, loss, {"name": "ADAM", "lr": lr},
                            T.TrainerSingleNode, T.evaluate_single_node,
                            name="ml", saveDir=td, seed=0)
            model.train(d, epochs, 5, validationInterval=40)
            res = model.evaluate(d)
        emit(layers=layers, F=F, K=K, lr=lr, epochs=epochs,
             interpolate=interp, best=float(res["costBest"]),
             last=float(res["costLast"]))

    emit(done=True)


if __name__ == "__main__":
    main()
