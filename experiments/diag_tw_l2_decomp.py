"""Per-step cost decomposition of the round-5 winner (TW_L2 seed 0)
vs the centralized expert — does the transient-weighted loss actually
close the early-step gap diag_flocking_r4d localized (best 0.0332 vs
expert 0.0186 at step 2, second halves equal)?

Rebuilds the seed-0 dataset, loads the Best checkpoint from the sweep
run's saveDir (passed via --saveDir, default the recorded seed-0 dir),
rolls the controller closed-loop on the test split, and emits the
per-step velocity-variance cost curves. Writes
experiments/diag_tw_l2_decomp.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
out_f = open(os.path.join(HERE, "diag_tw_l2_decomp.json"), "w",
             buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--saveDir", default="/tmp/fl_r5_TW_L2_ouvmu5ip")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    from graph_neural_networks_tpu import training as T
    from graph_neural_networks_tpu.models import architectures_time as archt
    from experiments.diag_flocking_r5 import make_data

    emit(devices=str(jax.devices()))
    data = make_data(seed=0)
    arch = archt.LocalGNN_DB([6, 32, 32], [3, 3], True, "tanh", [2], 1)
    model = T.Model(arch, T.losses.mse_loss, {"name": "ADAM", "lr": 5e-4},
                    T.TrainerFlocking, T.evaluate_flocking, name="TW_L2",
                    saveDir=args.saveDir, seed=0, N=data.nAgents,
                    T=data.getData("state", "train").shape[1])
    model.load("Best")

    def cost_curve(vel):
        vel = np.asarray(vel)
        avg = vel.mean(axis=3, keepdims=True)
        return ((vel - avg) ** 2).sum(axis=2).mean(axis=(0, 2))

    ip = data.getData("initPos", "test")
    iv = data.getData("initVel", "test")
    vel_exp = data.getData("vel", "test")
    curve_exp = cost_curve(vel_exp)
    _, vel_b, *_ = data.compute_trajectory(
        ip, iv, data.duration, archit=arch, params=model.params,
        history_window=arch.causal_window)
    curve_b = cost_curve(vel_b)
    Tn = len(curve_exp)
    emit(tag="decomposition", config="TW_L2.s0",
         cost_full=float(curve_b.sum()),
         expert_full=float(curve_exp.sum()),
         steps_0_5_best=[float(v) for v in curve_b[:6]],
         steps_0_5_expert=[float(v) for v in curve_exp[:6]],
         first_half_best=float(curve_b[:Tn // 2].mean()),
         first_half_expert=float(curve_exp[:Tn // 2].mean()),
         second_half_best=float(curve_b[Tn // 2:].mean()),
         second_half_expert=float(curve_exp[Tn // 2:].mean()),
         curve_10_best=[float(v) for v in curve_b[::max(Tn // 10, 1)]],
         curve_10_expert=[float(v)
                          for v in curve_exp[::max(Tn // 10, 1)]])
    emit(done=True)


if __name__ == "__main__":
    main()
