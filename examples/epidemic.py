"""Epidemic tracking with Graph RNNs (reference examples/epidemicGRNN.py).

Predicts future infection status (8-step-ahead) of each student on the
SocioPatterns high-school friendship graph, from the first 8 steps of an
SIR process. Compares a plain Graph RNN against time/node/edge-gated
variants, trained on the differentiable 1-F1 loss
(epidemicGRNN.py:116-158, 205-287: F=1 -> H=12 -> 2, K=[5,5], tanh/ReLU,
lr 5e-4, 10 epochs, batch 100, nTrain 1000, seqLen 8).

Run:  python examples/epidemic.py [--quick] [--cpu] [--dataDir PATH]
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
    ap.add_argument("--dataDir", default="/root/reference/datasets")
    ap.add_argument("--saveDir", default="experiments/epidemic")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override nEpochs (reference config: 10; the "
                         "gated variants need ~40 to converge — "
                         "RESULTS.md round 2)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from graph_neural_networks_tpu import data as D
    from graph_neural_networks_tpu import training as T
    from graph_neural_networks_tpu.models import architectures as archs

    rng = np.random.default_rng(args.seed)
    if args.quick:
        seqLen, nTrain, nValid, nTest, nEpochs, batch = 4, 300, 50, 50, 20, 50
        H, K = 8, [3, 3]
    else:
        seqLen, nTrain, nValid, nTest, nEpochs, batch = 8, 1000, 120, 200, 10, 100
        H, K = 12, [5, 5]
    if args.epochs:
        nEpochs = args.epochs

    data = D.Epidemics(seqLen, 0.05, 0.3, 4, nTrain, nValid, nTest,
                       data_dir=args.dataDir, rng=rng)
    data.expandDims()
    W = data.Adj.astype(np.float64)
    S = W / np.max(np.abs(np.linalg.eigvalsh(W)))
    print(f"== Epidemics: N={data.N}, seqLen={seqLen}, "
          f"{nTrain}/{nValid}/{nTest} samples ==")

    results = {}
    variants = [("GRNN", None)] + [(f"GatedGRNN-{g}", g)
                                   for g in (("time",) if args.quick
                                             else ("time", "node", "edge"))]
    for name, gate in variants:
        if gate is None:
            arch = archs.GraphRecurrentNN(1, 2, H, K, True, "tanh", "relu",
                                          "relu", [2], S)
        else:
            arch = archs.GatedGraphRecurrentNN(1, 2, H, K, True, "tanh",
                                               "relu", "relu", [2], S,
                                               gateType=gate)
        model = T.Model(arch, T.losses.f1_score_loss,
                        {"name": "ADAM", "lr": 5e-4}, T.Trainer, T.evaluate,
                        name=name, saveDir=args.saveDir, seed=args.seed,
                        T=seqLen)
        print(f"{name}: {model.nParameters} params; training...")
        model.train(data, nEpochs, batch, validationInterval=3)
        res = model.evaluate(data)
        results[name] = res
        print(f"  1-F1: best {res['costBest']:.4f} last {res['costLast']:.4f}")

    print("== summary ==")
    for name, res in results.items():
        print(f"{name}: test 1-F1 {res['costBest']:.4f}")
    return results


if __name__ == "__main__":
    main()
