"""Authorship attribution on a fused word-adjacency network
(reference examples/authorshipGNN.py).

Classifies excerpts as written-by-author vs not, on the graph obtained by
fusing the author's training-set WANs. Compares localized activations
(max/median) against a pointwise-ReLU Selection GNN
(authorshipGNN.py:170-317: F=[1,32], K=[5], lr 5e-3, 25 epochs, batch 20).

Run:  python examples/authorship.py [--quick] [--cpu] [--dataDir PATH]
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
    ap.add_argument("--author", default="poe")
    ap.add_argument("--dataDir", default=None,
                    help="directory containing authorshipData.mat")
    ap.add_argument("--saveDir", default="experiments/authorship")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from graph_neural_networks_tpu import data as D
    from graph_neural_networks_tpu import training as T
    from graph_neural_networks_tpu.models import architectures as archs

    rng = np.random.default_rng(args.seed)
    data = D.Authorship(args.author, 0.8, 0.1, data_dir=args.dataDir, rng=rng)
    W = data.createGraph()
    N = W.shape[0]
    S = W / np.max(np.abs(np.linalg.eigvals(W)).real)
    data.expandDims()
    print(f"== Authorship ({args.author}): N={N}, "
          f"{data.nTrain}/{data.nValid}/{data.nTest} samples ==")

    F, K = [1, 16] if args.quick else [1, 32], [5]
    nEpochs, batch = (10, 20) if args.quick else (25, 20)
    kHop = [2] if args.quick else [3]

    results = {}
    variants = [
        ("SelGNN", dict(kind="plain")),
        ("MaxLocal", dict(kind="max_local")),
    ]
    if not args.quick:
        variants.append(("MedianLocal", dict(kind="median_local")))

    for name, v in variants:
        if v["kind"] == "plain":
            arch = archs.SelectionGNN(F, K, True, "relu", [N], "NoPool", [1],
                                      [2], S, order="Degree")
        else:
            arch = archs.LocalActivationGNN(F, K, True, v["kind"], kHop, [N],
                                            "NoPool", [1], [2], S,
                                            order="Degree")
        model = T.Model(arch, T.losses.cross_entropy_loss,
                        {"name": "ADAM", "lr": 5e-3}, T.Trainer, T.evaluate,
                        name=name, saveDir=args.saveDir, seed=args.seed)
        print(f"{name}: {model.nParameters} params; training...")
        model.train(data, nEpochs, batch, validationInterval=10)
        res = model.evaluate(data)
        results[name] = res
        print(f"  error rate: best {res['costBest']:.4f} "
              f"last {res['costLast']:.4f}")

    print("== summary ==")
    for name, res in results.items():
        print(f"{name}: test error {res['costBest']:.4f}")
    return results


if __name__ == "__main__":
    main()
