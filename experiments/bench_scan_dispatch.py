"""Wall-clock win of scanned train-step dispatch (Trainer scanDispatch).

Reference-scale task (source localization, SBM N=100, nTrain=1000,
batch 100 -> 10 steps/epoch) where per-step device work is tiny and
dispatch + the per-step float(loss) host sync dominate. Measures the
whole Trainer.train() wall for scanDispatch True vs False at identical
seeds (identical loss trajectories — asserted) and reports steps/s.

Usage: python experiments/bench_scan_dispatch.py [--cpu] [--epochs E]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from graph_neural_networks_tpu import data as D
    from graph_neural_networks_tpu import training as T
    from graph_neural_networks_tpu.models import architectures as archs
    from graph_neural_networks_tpu.utils import graph as gt

    rng = np.random.default_rng(0)
    G = gt.Graph("SBM", 100, {"nCommunities": 5, "probIntra": 0.8,
                              "probInter": 0.2}, rng=rng)
    S = G.W / np.max(np.abs(np.linalg.eigvalsh(G.W)))
    srcs = gt.compute_source_nodes(G.A, 5)
    data = D.SourceLocalization(G, 1000, 120, 200, srcs, tMax=25, rng=rng)
    data.expandDims()

    def run(mode, flag, epochs):
        arch = archs.SelectionGNN([1, 32, 32], [5, 5], True, "relu",
                                  [100, 100], "NoPool", [1, 1], [5], S,
                                  order="Degree")
        model = T.Model(arch, T.losses.cross_entropy_loss,
                        {"name": "ADAM", "lr": 5e-3}, T.Trainer, T.evaluate,
                        name=f"bench_{mode}", saveDir="/tmp/bench_scan",
                        seed=0)
        t0 = time.perf_counter()
        out = model.train(data, nEpochs=epochs, batchSize=100,
                          validationInterval=5, scanDispatch=flag, seed=0)
        return time.perf_counter() - t0, out

    results = {}
    short = max(1, args.epochs // 10)
    for mode, flag in (("scan", True), ("loop", False)):
        # two runs: the long-minus-short difference removes the one-time
        # compile cost (each Trainer re-jits; on the TPU tunnel a compile
        # is seconds and would otherwise swamp a short benchmark)
        wall_s, _ = run(mode, flag, short)
        wall, out = run(mode, flag, args.epochs)
        n_steps = len(out["lossTrain"])
        n_short = short * (n_steps // args.epochs)
        steady = (n_steps - n_short) / (wall - wall_s)
        results[mode] = {"wall_s": wall, "steps": n_steps,
                         "steps_per_s": n_steps / wall,
                         "steady_steps_per_s": steady,
                         "loss_tail": [float(v)
                                       for v in out["lossTrain"][-3:]]}
        print(f"{mode}: {wall:.2f}s for {n_steps} steps "
              f"({n_steps / wall:.1f} steps/s; steady {steady:.1f})",
              flush=True)

    np.testing.assert_allclose(results["scan"]["loss_tail"],
                               results["loop"]["loss_tail"], rtol=1e-4)
    results["speedup"] = (results["loop"]["wall_s"]
                          / results["scan"]["wall_s"])
    results["steady_speedup"] = (results["scan"]["steady_steps_per_s"]
                                 / results["loop"]["steady_steps_per_s"])
    results["platform"] = jax.devices()[0].platform
    print(json.dumps(results))
    out_path = args.out or ("experiments/bench_scan_dispatch_%s.json"
                            % results["platform"])
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
