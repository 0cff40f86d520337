"""Source localization on an SBM graph (reference examples/sourceLocGNN.py).

Trains a Selection GNN (degree ordering, zero-pad pooling) and an
Aggregation GNN to identify which community seeded a diffusion process.
Config mirrors sourceLocGNN.py:116-176, 230-429: N=100, 5 communities,
F=[1,32,32], K=[5,5], pooling to [10,10], MLP->5, ADAM 1e-3.

Run:  python examples/sourceloc.py [--quick] [--cpu]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="tiny config")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--saveDir", default="experiments/sourceloc")
    ap.add_argument("--graphType", default="SBM",
                    choices=["SBM", "SmallWorld", "FacebookEgo"],
                    help="reference sourceLocGNN.py:67 graph variants")
    ap.add_argument("--fbDataDir",
                    default="/root/reference/datasets/facebookEgo")
    ap.add_argument("--config", default=None,
                    help="load a typed ExperimentConfig JSON (overrides "
                         "graph/training knobs; utils.config)")
    ap.add_argument("--tMax", type=int, default=None,
                    help="diffusion horizon (default: reference 25)")
    ap.add_argument("--normalize", action="store_true",
                    help="per-node standardization (fixes the large-tMax "
                         "fine-structure collapse; RESULTS.md round 2)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from graph_neural_networks_tpu import data as D
    from graph_neural_networks_tpu import training as T
    from graph_neural_networks_tpu.models import architectures as archs
    from graph_neural_networks_tpu.utils import graph as gt
    from graph_neural_networks_tpu.utils import misc

    rng = np.random.default_rng(args.seed)
    if args.quick:
        N, C = 40, 4
        nTrain, nValid, nTest, nEpochs, batch = 1000, 120, 200, 60, 50
        F, K, pool, mlp = [1, 16, 16], [4, 4], [20, 10], [C]
    else:
        N, C = 100, 5
        nTrain, nValid, nTest, nEpochs, batch = 8000, 200, 200, 40, 100
        F, K, pool, mlp = [1, 32, 32], [5, 5], [10, 10], [C]

    # typed-config path (utils.config): load knobs from JSON, and always
    # dump the effective config next to the run outputs
    from graph_neural_networks_tpu.utils.config import (
        ExperimentConfig, GraphConfig, ModelConfig, TrainingConfig)
    if args.config:
        cfg = ExperimentConfig.load(args.config)
        N = cfg.graph.nNodes
        C = cfg.graph.options.get("nCommunities", C)
        args.graphType = cfg.graph.graphType
        nEpochs = cfg.training.nEpochs
        batch = cfg.training.batchSize
        mk = cfg.model.kwargs
        F = mk.get("dimNodeSignals", F)
        K = mk.get("nFilterTaps", K)
        pool = mk.get("nSelectedNodes", pool)
        mlp = mk.get("dimLayersMLP", mlp)

    if args.graphType == "FacebookEgo":
        # reference sourceLocGNN.py:558-640: real 234-node 2-community
        # ego graph; sources = one high-degree node per community
        from graph_neural_networks_tpu.data.datasets import FacebookEgo
        W = FacebookEgo(data_dir=args.fbDataDir).getAdjacencyMatrix()
        N, C = W.shape[0], 2
        pool = [N // 2, N // 4]
        mlp = [C]
        G = gt.Graph("adjacency", N, {"adjacencyMatrix": W})
        print(f"== Source localization: FacebookEgo N={N}, {C} "
              f"communities ==")
    elif args.graphType == "SmallWorld":
        G = gt.Graph("SmallWorld", N, {"probEdge": 5.0 / N,
                                       "probRewiring": 0.1}, rng=rng)
        print(f"== Source localization: SmallWorld N={N} ==")
    else:
        print(f"== Source localization: SBM N={N}, {C} communities ==")
        G = gt.Graph("SBM", N, {"nCommunities": C, "probIntra": 0.8,
                                "probInter": 0.2}, rng=rng)
    G.compute_gft()
    S = G.W / np.max(np.diag(G.E).real)               # S = W / lambda_max
    sources = gt.compute_source_nodes(G.A, C)
    # tMax = 25 per the reference driver (sourceLocGNN.py:119)
    tMax = args.tMax or (25 if not args.quick else 8)
    data = D.SourceLocalization(G, nTrain, nValid, nTest, sources,
                                tMax=tMax, rng=rng,
                                normalize=args.normalize)
    data.expandDims()
    misc.write_var_values(f"{args.saveDir}/hyperparameters.txt", {
        "N": N, "C": C, "F": F, "K": K, "pool": pool})
    import os
    os.makedirs(args.saveDir, exist_ok=True)
    ExperimentConfig(
        name="sourceloc", seed=args.seed, saveDir=args.saveDir,
        graph=GraphConfig(graphType=args.graphType, nNodes=N,
                          options={"nCommunities": C}),
        model=ModelConfig(architecture="SelectionGNN",
                          kwargs={"dimNodeSignals": F, "nFilterTaps": K,
                                  "nSelectedNodes": pool,
                                  "dimLayersMLP": mlp}),
        training=TrainingConfig(nEpochs=nEpochs, batchSize=batch, lr=1e-3),
    ).save(f"{args.saveDir}/config.json")

    results = {}

    # --- Selection GNN (Degree / EDS / SpectralProxies orderings) --------
    orders = ["Degree"] if args.quick else ["Degree", "EDS",
                                            "SpectralProxies"]
    for order in orders:
        # poolingSize = neighborhood hops summarized at each pooling stage
        # (reference sourceLocGNN.py:253: [6, 8])
        alpha = [3, 3] if args.quick else [6, 8]
        arch = archs.SelectionGNN(F, K, True, "relu", pool, "MaxPoolLocal",
                                  alpha, mlp, S, order=order)
        model = T.Model(arch, T.losses.cross_entropy_loss,
                        {"name": "ADAM", "lr": 1e-3}, T.Trainer, T.evaluate,
                        name=f"SelGNN{order}", saveDir=args.saveDir,
                        seed=args.seed)
        print(f"SelGNN-{order}: {model.nParameters} params; training...")
        model.train(data, nEpochs, batch, validationInterval=20)
        res = model.evaluate(data)
        results[f"SelGNN{order}"] = res
        print(f"  error rate: best {res['costBest']:.4f} "
              f"last {res['costLast']:.4f}")

    # --- Selection GNN with Graclus coarsening pooling --------------------
    # (reference sourceLocGNN.py:318-340: rescaled GSO, poolingSize [2,2])
    if not args.quick:
        arch = archs.SelectionGNN(F, K, True, "relu", [0, 0],
                                  "MaxPoolLocal", [2, 2], mlp, S,
                                  coarsening=True, rng=rng)
        model = T.Model(arch, T.losses.cross_entropy_loss,
                        {"name": "ADAM", "lr": 1e-3}, T.Trainer, T.evaluate,
                        name="SelGNNcrs", saveDir=args.saveDir,
                        seed=args.seed)
        print(f"SelGNN-coarsening: {model.nParameters} params; training...")
        model.train(data, nEpochs, batch, validationInterval=20)
        res = model.evaluate(data)
        results["SelGNNcrs"] = res
        print(f"  error rate: best {res['costBest']:.4f} "
              f"last {res['costLast']:.4f}")

    # --- Aggregation GNN --------------------------------------------------
    aggF, aggK = ([1, 8, 16], [3, 4]) if args.quick else ([1, 16, 32], [4, 8])
    arch = archs.AggregationGNN(aggF, aggK, True, "relu", "MaxPoolLocal",
                                [2, 2], mlp, S, order="Degree", maxN=None)
    model = T.Model(arch, T.losses.cross_entropy_loss,
                    {"name": "ADAM", "lr": 1e-3}, T.Trainer, T.evaluate,
                    name="AggGNN", saveDir=args.saveDir, seed=args.seed)
    print(f"AggGNN: {model.nParameters} params; training...")
    model.train(data, nEpochs, batch, validationInterval=20)
    res = model.evaluate(data)
    results["AggGNN"] = res
    print(f"  error rate: best {res['costBest']:.4f} "
          f"last {res['costLast']:.4f}")

    print("== summary ==")
    for name, res in results.items():
        print(f"{name}: test error {res['costBest']:.4f}")
    return results


if __name__ == "__main__":
    main()
