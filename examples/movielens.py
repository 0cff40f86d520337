"""MovieLens-100k rating prediction at a target movie node
(reference examples/movieGNN.py).

Builds a movie-similarity graph from training ratings (Pearson-style
correlation, kNN-sparsified), then regresses the rating at movie node 50
with Selection GNNs (global readout trained on the target node via
singleNodeForward) and Local GNNs (per-node readout).
Config mirrors movieGNN.py:70-80, 139-172: F=[1,64,32], K=[5,5], kNN=10,
SmoothL1 loss, ADAM 5e-3, 40 epochs, batch 5.

Run:  python examples/movielens.py [--quick] [--cpu] [--dataDir PATH]
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
    ap.add_argument("--node", type=int, default=50,
                    help="target movie node (reference uses 50)")
    ap.add_argument("--dataDir", default=None,
                    help="directory containing ml-100k/u.data")
    ap.add_argument("--interpolate", action="store_true",
                    help="NN-interpolate missing ratings before training")
    ap.add_argument("--saveDir", default="experiments/movielens")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from graph_neural_networks_tpu import data as D
    from graph_neural_networks_tpu import training as T
    from graph_neural_networks_tpu.models import architectures as archs

    rng = np.random.default_rng(args.seed)
    node = args.node if not args.quick else 25
    data = D.MovieLens("movie", node, 0.9, 0.1, data_dir=args.dataDir,
                       kNN=10, rng=rng)
    if args.interpolate:
        data.interpolateRatings()
    W = data.getGraph()
    N = W.shape[0]
    S = W / np.max(np.abs(np.linalg.eigvalsh(W)))
    data.expandDims()
    print(f"== MovieLens: movie graph N={N}, target node {node}, "
          f"{data.nTrain}/{data.nValid}/{data.nTest} samples ==")

    F, K = ([1, 16], [4]) if args.quick else ([1, 64, 32], [5, 5])
    nEpochs, batch = (15, 5) if args.quick else (40, 5)
    loss = T.losses.adapt_extra_dimension_loss(T.losses.smooth_l1_loss)

    results = {}

    # --- Selection GNN: global MLP -> scalar rating, plain Trainer -------
    if not args.quick:
        arch = archs.SelectionGNN(F, K, True, "relu", [N] * (len(F) - 1),
                                  "NoPool", [1] * (len(F) - 1), [1], S,
                                  order="Degree")
        model = T.Model(arch, loss, {"name": "ADAM", "lr": 5e-3},
                        T.Trainer, T.evaluate, name="SelGNN",
                        saveDir=args.saveDir, seed=args.seed)
        print(f"SelGNN: {model.nParameters} params; training...")
        model.train(data, nEpochs, batch, validationInterval=40)
        res = model.evaluate(data)
        results["SelGNN"] = res
        print(f"  RMSE: best {res['costBest']:.4f} last {res['costLast']:.4f}")

    for name, layers in [("LocalGNN1Ly", 1)] + (
            [] if args.quick else [("LocalGNN2Ly", 2)]):
        Fl = F[:layers + 1]
        Kl = K[:layers]
        arch = archs.LocalGNN(Fl, Kl, True, "relu", [N] * layers, "NoPool",
                              [1] * layers, [1], S, order="Degree")
        model = T.Model(arch, loss, {"name": "ADAM", "lr": 5e-3},
                        T.TrainerSingleNode, T.evaluate_single_node,
                        name=name, saveDir=args.saveDir, seed=args.seed)
        print(f"{name}: {model.nParameters} params; training...")
        model.train(data, nEpochs, batch, validationInterval=40)
        res = model.evaluate(data)
        results[name] = res
        print(f"  RMSE: best {res['costBest']:.4f} last {res['costLast']:.4f}")

    print("== summary ==")
    for name, res in results.items():
        print(f"{name}: test RMSE {res['costBest']:.4f}")
    return results


if __name__ == "__main__":
    main()
