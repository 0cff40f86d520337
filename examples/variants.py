"""Filter-family zoo on source localization: every remaining architecture
variant (spectral, node/edge-variant, ARMA, GCAT, edge-variant attention,
coarsened Selection GNN, multi-node aggregation) trained on the same task
so their behavior and cost can be compared side by side.

Complements the five reference drivers; the reference exercises these
variants across its papers (SURVEY.md §2.4).

Run:  python examples/variants.py [--quick] [--cpu]
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
    ap.add_argument("--saveDir", default="experiments/variants")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from graph_neural_networks_tpu import data as D
    from graph_neural_networks_tpu import training as T
    from graph_neural_networks_tpu.models import architectures as archs
    from graph_neural_networks_tpu.utils import graph as gt

    rng = np.random.default_rng(args.seed)
    N, C = (40, 4) if args.quick else (60, 4)
    nTrain, nEpochs, batch = (800, 20, 50) if args.quick else (3000, 30, 100)

    G = gt.Graph("SBM", N, {"nCommunities": C, "probIntra": 0.8,
                            "probInter": 0.2}, rng=rng)
    G.compute_gft()
    S = G.W / np.max(np.diag(G.E).real)
    sources = gt.compute_source_nodes(G.A, C)
    data = D.SourceLocalization(G, nTrain, nTrain // 8, nTrain // 8, sources,
                                tMax=8, rng=rng)
    data.expandDims()

    F, K = [1, 16], [4]
    common = dict(nEpochs=nEpochs, batchSize=batch, validationInterval=20)

    zoo = {
        "Spectral": archs.SpectralGNN(F, [N // 2], True, "relu", [N],
                                      "NoPool", [1], [C], S),
        "NodeVariant": archs.NodeVariantGNN(F, K, [10], True, "relu", [N],
                                            "NoPool", [1], [C], S,
                                            order="Degree"),
        "EdgeVariant": archs.EdgeVariantGNN(F, K, [10], True, "relu", [N],
                                            "NoPool", [1], [C], S,
                                            order="Degree"),
        "ARMA": archs.ARMAfilterGNN(F, [2], [3], True, "relu", [N], "NoPool",
                                    [1], [C], S, tMax=4),
        "GCAT": archs.GraphConvolutionAttentionNetwork(
            F, K, [2], True, "relu", [N], "NoPool", [1], [C], S),
        "EVAttention": archs.EdgeVariantAttention(
            F, [2], [2], True, "relu", [N], "NoPool", [1], [C], S),
        "SelGNNcoarse": archs.SelectionGNN([1, 16, 16], [3, 3], True, "relu",
                                           [0, 0], "MaxPoolLocal", [2, 2],
                                           [C], S, coarsening=True, rng=rng),
        "MultiNodeAgg": archs.MultiNodeAggregationGNN(
            [4, 2], [8, 6], [[1, 8], [8, 16], [16]], [[3], [3]], True,
            "relu", "MaxPoolLocal", [[2], [2]], [C], S, order="Degree"),
    }

    results = {}
    for name, arch in zoo.items():
        model = T.Model(arch, T.losses.cross_entropy_loss,
                        {"name": "ADAM", "lr": 1e-3}, T.Trainer, T.evaluate,
                        name=name, saveDir=args.saveDir, seed=args.seed)
        print(f"{name}: {model.nParameters} params; training...")
        model.train(data, **common)
        res = model.evaluate(data)
        results[name] = res
        print(f"  error rate: best {res['costBest']:.4f}")

    print("== summary ==")
    for name, res in results.items():
        print(f"{name}: test error {res['costBest']:.4f}")
    return results


if __name__ == "__main__":
    main()
