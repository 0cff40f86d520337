"""Decentralized flocking controllers (reference examples/flockingGNN.py).

Imitation learning of a centralized expert: time-varying GNN controllers
that only use delayed neighbor information (unit-delay propagation).
Compares a linear local filter, a Local GNN (delayed/batch), an
Aggregation GNN (delayed) and a Graph RNN, trained with DAGger
(flockingGNN.py:73-184, 247-383: 50 agents, F=[6,64], K=[3], MSE on
accelerations, lr 5e-4, 30 epochs, batch 20, DAGger probExpert .993).

Run:  python examples/flocking.py [--quick] [--cpu]
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
    ap.add_argument("--saveDir", default="experiments/flocking")
    ap.add_argument("--nAgents", type=int, default=None,
                    help="override swarm size (default 50 full / 12 quick)")
    ap.add_argument("--ellDegree", type=int, default=None,
                    help="run training + closed-loop rollouts on the "
                         "O(N*deg) ELL layout (large swarms); also "
                         "switches rollout graph normalization to power "
                         "iteration")
    ap.add_argument("--deviceStore", action="store_true",
                    help="device-resident trajectory store (round 5): "
                         "DAGger re-rolls and supervision recompute "
                         "stay on device — ~26x faster DAGger epochs "
                         "on the TPU tunnel; also switches rollout "
                         "lambda to power iteration for speed")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from graph_neural_networks_tpu import data as D
    from graph_neural_networks_tpu import training as T
    from graph_neural_networks_tpu.models import architectures_time as archt

    rng = np.random.default_rng(args.seed)
    if args.quick:
        nAgents, duration, dt = 12, 1.0, 0.1
        nTrain, nValid, nTest, nEpochs, batch = 40, 8, 8, 4, 10
        F, K, H = [6, 16], [3], 16
    else:
        nAgents, duration, dt = 50, 2.0, 0.01
        nTrain, nValid, nTest, nEpochs, batch = 400, 20, 20, 30, 20
        F, K, H = [6, 64], [3], 64

    if args.nAgents is not None:
        nAgents = args.nAgents
    print(f"== Flocking: {nAgents} agents, duration {duration}s ==")
    # commRadius 2.0 = the reference config (flockingGNN.py:126);
    # earlier rounds ran this driver at 6.0 — a denser graph and a
    # much easier task (expert cost ~0.17 vs ~1.49) — so pre-r5 driver
    # numbers are not comparable to the diag_flocking sweeps
    data = D.Flocking(nAgents=nAgents, commRadius=2.0, repelDist=1.0,
                      nTrain=nTrain, nValid=nValid, nTest=nTest,
                      duration=duration, samplingTime=dt, rng=rng)
    if args.ellDegree is not None:
        data.rollout_ell_degree = args.ellDegree
        data.rollout_lam_method = "power"
    if args.deviceStore:
        data.rollout_lam_method = "power"
    T_steps = data.getData("state", "train").shape[1]
    expert_cost = data.evaluate(vel=data.getData("vel", "test"))
    print(f"expert (centralized) cost: {expert_cost:.4f}")

    results = {}
    models = [
        ("LocalFlt", archt.LocalGNN_DB(F[:1] + [2], [K[0]], True, "identity",
                                       [2], 1)),
        ("LocalGNN", archt.LocalGNN_DB(F, K, True, "tanh", [2], 1)),
        ("AggGNN", archt.AggregationGNN_DB([6, 16] if args.quick else [6, 32],
                                           [2], True, "tanh", "MaxPoolLocal",
                                           [2], [2], 1, nExchanges=4)),
        ("GraphRNN", archt.GraphRecurrentNN_DB(6, 2, H, [K[0], K[0]], True,
                                               "tanh", "identity", "identity",
                                               [2], 1)),
    ]
    if args.quick:
        models = [m for m in models if m[0] in ("LocalGNN", "GraphRNN")]

    for name, arch in models:
        model = T.Model(arch, T.losses.mse_loss, {"name": "ADAM", "lr": 5e-4},
                        T.TrainerFlocking, T.evaluate_flocking, name=name,
                        saveDir=args.saveDir, seed=args.seed,
                        N=nAgents, T=T_steps)
        print(f"{name}: {model.nParameters} params; training (DAGger)...")
        model.train(data, nEpochs, batch, validationInterval=20,
                    probExpert=0.993, DAGgerType="randomEpoch",
                    ellDegree=args.ellDegree,
                    deviceStore=args.deviceStore)
        res = model.evaluate(data)
        results[name] = res
        print(f"  closed-loop cost: best {res['costBestFull']:.4f} "
              f"(end {res['costBestEnd']:.4f})")

    print("== summary ==")
    print(f"expert: {expert_cost:.4f}")
    for name, res in results.items():
        print(f"{name}: closed-loop cost {res['costBestFull']:.4f}")
    return results


if __name__ == "__main__":
    main()
