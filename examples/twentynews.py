"""20NEWS word-graph document classification (reference
dataTools.py:4006-4533; dropped from the reference README after v0.2 but
the code path is kept for capability parity).

Classifies documents from word-frequency signals on a word co-occurrence
graph with a Selection GNN. Loads a preprocessed `twentynews.npz`
(x_train, y_train, x_test, y_test, adjacency) from --dataDir when
present; otherwise a synthetic word-graph corpus keeps the pipeline
exercised offline.

Run:  python examples/twentynews.py [--quick] [--cpu]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dataDir", default=None)
    ap.add_argument("--saveDir", default="experiments/twentynews")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from graph_neural_networks_tpu import data as D
    from graph_neural_networks_tpu import training as T
    from graph_neural_networks_tpu.models import architectures as archs
    from graph_neural_networks_tpu.utils import graph as gt

    rng = np.random.default_rng(args.seed)
    data = D.TwentyNews(ratioValid=0.1, data_dir=args.dataDir, rng=rng)
    data.expandDims()
    W = np.asarray(data.adjacencyMatrix, np.float64)
    # kNN-sparsify + normalize like the reference's word graph
    if (np.abs(W) > 0).mean() > 0.2:
        W = gt.sparsify_graph(W, "NN", 10)
    S = W / np.max(np.abs(np.linalg.eigvalsh(W)))
    N = S.shape[0]
    C = int(np.max(data.samples["train"]["targets"])) + 1
    print(f"== TwentyNews: N={N} words, {C} classes, "
          f"{data.nTrain}/{data.nValid}/{data.nTest} docs ==")

    nEpochs, batch = (10, 20) if args.quick else (30, 50)
    arch = archs.SelectionGNN([1, 32], [5], True, "relu", [N], "NoPool",
                              [1], [C], S, order="Degree")
    model = T.Model(arch, T.losses.cross_entropy_loss,
                    {"name": "ADAM", "lr": 1e-3}, T.Trainer, T.evaluate,
                    name="SelGNN20news", saveDir=args.saveDir,
                    seed=args.seed)
    print(f"SelectionGNN: {model.nParameters} params; training...")
    model.train(data, nEpochs, batch, validationInterval=10)
    res = model.evaluate(data)
    print(f"test error rate: best {res['costBest']:.4f} "
          f"last {res['costLast']:.4f}")
    return res


if __name__ == "__main__":
    main()
