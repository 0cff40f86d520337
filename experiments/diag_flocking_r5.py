"""Round-5 flocking quality sweep on the device-resident DAGger store.

VERDICT r4 item 1: the r3/r4 sweep never ran because every randomEpoch
config pulled dense (B,T,N,N) graph trajectories through the ~25 MB/s
tunnel (~2 min/epoch => ~2 h/config) and the tunnel wedges after
~35-45 min of sustained dispatch. Round 5's TrainerFlocking
deviceStore keeps pos/vel on device and recomputes supervision in the
train step, so one config is minutes — and each config runs as its OWN
process (fresh tunnel session; a wedge kills one config, not the
sweep).

Usage:
    python experiments/diag_flocking_r5.py --timing     # epoch timing
    python experiments/diag_flocking_r5.py --config B_base
    python experiments/diag_flocking_r5.py --list

Reference protocol (reference flockingGNN.py:119-137): N=50,
commRadius 2 (flockingGNN.py:126), repelDist 1, nTrain 400, T=200
(duration 2.0, dt 0.01), LocalGNN_DB, ADAM lr 5e-4, batch 20,
validationInterval 20, DAGger randomEpoch probExpert .993.
Round-2 best: 1.613 (replaceTimeBatch, 60 ep); expert ~1.489; r4
decomposition: the gap is concentrated at rollout steps ~2-3
(transient), second-half costs equal.

Appends one JSON line per run to experiments/diag_flocking_r5.jsonl.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "diag_flocking_r5.jsonl")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")


def make_data(seed=0, quick=False, lam="power"):
    from graph_neural_networks_tpu import data as D
    rng = np.random.default_rng(seed)
    # commRadius=2.0: the config every r2-r4 sweep used (expert cost
    # ~1.489, r2 best 1.613) — the 6.0 of examples/flocking.py makes a
    # much denser graph and a trivially easier task (expert ~0.17),
    # not comparable (first r5 B_base run, discarded)
    if quick:
        data = D.Flocking(nAgents=12, commRadius=2.0, repelDist=1.0,
                          nTrain=24, nValid=8, nTest=8, duration=1.0,
                          samplingTime=0.1, rng=rng)
    else:
        data = D.Flocking(nAgents=50, commRadius=2.0, repelDist=1.0,
                          nTrain=400, nValid=20, nTest=20, duration=2.0,
                          samplingTime=0.01, rng=rng)
    # one consistent lambda_max estimator everywhere (train-step
    # recompute, DAGger re-rolls, validation, final eval): 'power'
    # avoids the per-step batched eigvalsh, which dominates dense
    # rollouts on TPU. Fidelity: probe_lambda_fidelity.json.
    data.rollout_lam_method = lam
    return data


def weighted_mse(tau=10.0, alpha=4.0):
    """Transient-weighted MSE: the r4d decomposition localized the
    remaining cost gap at rollout steps ~2-3, so upweight the early-
    trajectory imitation error: w_t = 1 + alpha*exp(-t/tau),
    normalized. Ours (no reference analogue) — a quality knob."""
    import jax.numpy as jnp

    def loss(yHat, y):
        T = y.shape[1]
        w = 1.0 + alpha * jnp.exp(-jnp.arange(T) / tau)
        w = w / jnp.mean(w)
        return jnp.mean(w[None, :, None, None] * (yHat - y) ** 2)

    return loss


CONFIGS = {
    # name: (F, K, nEpochs, probExpert, DAGgerType, loss, lr)
    "B_base":  ([6, 64], [3], 60, .993, "randomEpoch", "mse", 5e-4),
    "P_low":   ([6, 64], [3], 60, .9, "randomEpoch", "mse", 5e-4),
    "RT":      ([6, 64], [3], 60, .993, "replaceTimeBatch", "mse", 5e-4),
    "K4":      ([6, 64], [4], 60, .993, "randomEpoch", "mse", 5e-4),
    "H128":    ([6, 128], [3], 60, .993, "randomEpoch", "mse", 5e-4),
    "L2":      ([6, 32, 32], [3, 3], 60, .993, "randomEpoch", "mse",
                5e-4),
    "TW":      ([6, 64], [3], 60, .993, "randomEpoch", "tw", 5e-4),
    "TW_RT":   ([6, 64], [3], 60, .993, "replaceTimeBatch", "tw", 5e-4),
    "B_long":  ([6, 64], [3], 120, .993, "randomEpoch", "mse", 5e-4),
    "TW_L2":   ([6, 32, 32], [3, 3], 60, .993, "randomEpoch", "tw",
                5e-4),
    "TW_L2_long": ([6, 32, 32], [3, 3], 120, .993, "randomEpoch",
                   "tw", 5e-4),
}


def run_config(name, seed=0, quick=False, host=False):
    import jax
    from graph_neural_networks_tpu import training as T
    from graph_neural_networks_tpu.models import architectures_time as archt
    F, K, nep, pe, dtype_, lossname, lr = CONFIGS[name]
    if quick:
        nep = 2
        F = [6, 16]
        K = K[:1] if len(K) == 1 else [3, 3]
    data = make_data(seed=seed, quick=quick)
    expert_cost = float(data.evaluate(vel=data.getData("vel", "test")))
    nA = data.nAgents
    T_steps = data.getData("state", "train").shape[1]
    loss = T.losses.mse_loss if lossname == "mse" else weighted_mse()
    arch = archt.LocalGNN_DB(F, K, True, "tanh", [2], 1)
    import tempfile
    sd = tempfile.mkdtemp(prefix=f"fl_r5_{name}_")
    model = T.Model(arch, loss, {"name": "ADAM", "lr": lr},
                    T.TrainerFlocking, T.evaluate_flocking, name=name,
                    saveDir=sd, seed=seed, N=nA, T=T_steps)
    t0 = time.time()
    out = model.train(data, nep, 20 if not quick else 8,
                      validationInterval=20 if not quick else 3,
                      probExpert=pe, DAGgerType=dtype_,
                      deviceStore=not host)
    wall = time.time() - t0
    res = model.evaluate(data)
    emit(tag="config", name=name + ("_host" if host else ""),
         seed=seed, quick=quick,
         F=F, K=K, nEpochs=nep, probExpert=pe, DAGgerType=dtype_,
         loss=lossname, lr=lr, expert_cost=expert_cost,
         cost_best_full=float(res["costBestFull"]),
         cost_best_end=float(res["costBestEnd"]),
         cost_last_full=float(res["costLastFull"]),
         over_expert=float(res["costBestFull"]) / expert_cost,
         best_valid=float(np.min(out["costValid"])),
         wall_s=round(wall, 1),
         epoch_s=round(wall / nep, 2), saveDir=sd)


def run_timing(quick=False):
    """Measure epoch wall time host-store vs deviceStore at the
    reference config (VERDICT item 1's 'done' condition)."""
    import jax
    from graph_neural_networks_tpu import training as T
    from graph_neural_networks_tpu.models import architectures_time as archt
    emit(tag="devices", devices=str(jax.devices()))
    # NOTE: randomEpoch DAGger only re-rolls from epoch 2 on, so
    # nEpochs=1 never pays the re-roll (the d2h-bound part on the host
    # store). host/host2 bracket it: epoch2_s = host2.wall - host.wall.
    for store, neps, lam in (("device", 3, "power"),
                             ("device_eig", 2, "eig"),
                             ("host", 1, "eig"),
                             ("host2", 2, "eig")):
        data = make_data(seed=0, quick=quick,
                         lam="power" if lam == "power" else "eig")
        arch = archt.LocalGNN_DB([6, 64], [3], True, "tanh", [2], 1)
        import tempfile
        sd = tempfile.mkdtemp(prefix=f"fl_r5_timing_{store}_")
        nA = data.nAgents
        T_steps = data.getData("state", "train").shape[1]
        model = T.Model(arch, T.losses.mse_loss,
                        {"name": "ADAM", "lr": 5e-4}, T.TrainerFlocking,
                        T.evaluate_flocking, name="t", saveDir=sd,
                        seed=0, N=nA, T=T_steps)
        t0 = time.time()
        model.train(data, neps, 20 if not quick else 8,
                    validationInterval=20 if not quick else 3,
                    probExpert=.5,       # ~half the set re-rolls: the
                    DAGgerType="randomEpoch",  # DAGger-heavy regime
                    deviceStore=store.startswith("device"),
                    scanDispatch="auto")
        wall = time.time() - t0
        emit(tag="timing", store=store, lam=lam, nEpochs=neps,
             wall_s=round(wall, 1), epoch_s=round(wall / neps, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config")
    ap.add_argument("--timing", action="store_true")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--hostStore", action="store_true",
                    help="run the config on the HOST trajectory store "
                         "(deviceStore=False): isolates the r5 "
                         "stack's quality effect from the storage "
                         "path at identical protocol")
    args = ap.parse_args()
    if args.list:
        print(" ".join(CONFIGS))
        return
    if args.quick:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.timing:
        run_timing(quick=args.quick)
        return
    assert args.config in CONFIGS, (args.config, list(CONFIGS))
    run_config(args.config, seed=args.seed, quick=args.quick,
               host=args.hostStore)


if __name__ == "__main__":
    main()
