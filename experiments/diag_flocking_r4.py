"""Round-4 flocking quality sweep (VERDICT r3 item 4): spend the fast
rollouts on closing the 1.613-vs-1.489 (8%) plateau.

Two stages (the first draft ran every config with replaceTimeBatch
DAGger — which regenerates a 20-trajectory closed-loop rollout per
BATCH, ~1200 rollouts / ~1h per config; r2 measured randomEpoch within
0.6% of it, so exploration runs on randomEpoch and only the winner
gets the expensive replaceTimeBatch treatment):

  1. exploration (randomEpoch, 60 epochs): r2-best repro + probExpert
     x taps/width x per-feature state scaling x 2-layer,
  2. the best exploration config re-run with replaceTimeBatch DAGger
     at 80 epochs,
  3. an expert-gap DECOMPOSITION (per-step cost curve: transient vs
     steady-state) for the expert and the best controller.

Runs on TPU; writes experiments/diag_flocking_r4.json (JSONL, partial
results usable).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from graph_neural_networks_tpu.data.flocking import Flocking
from graph_neural_networks_tpu.models import architectures_time as archt
from graph_neural_networks_tpu import training as T

HERE = os.path.dirname(os.path.abspath(__file__))
out_f = open(os.path.join(HERE, "diag_flocking_r4.json"), "w", buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


class ScaledLocalGNN_DB(archt.LocalGNN_DB):
    """LocalGNN_DB with fixed per-feature input scaling: the 6 flocking
    state features span ~3 orders of magnitude (velocity diffs vs
    1/d^2 / 1/d^4 position sums), so a fixed inverse-std from the
    training set conditions the first filter layer. The scale rides
    inside apply/rollout_step, so training, closed-loop rollouts and
    evaluation all see it consistently."""

    def set_scale(self, scale):
        self._scale = jnp.asarray(scale, jnp.float32)   # (6,)

    def split_forward(self, params, x, S):
        x = jnp.asarray(x, jnp.float32) * self._scale[None, None, :, None]
        return super().split_forward(params, x, S)

    def rollout_step(self, params, state, x_t, S_t):
        x_t = jnp.asarray(x_t, jnp.float32) * self._scale[None, :, None]
        return super().rollout_step(params, state, x_t, S_t)

    def rollout_step_shifted(self, params, state, x_t, shifted):
        x_t = jnp.asarray(x_t, jnp.float32) * self._scale[None, :, None]
        return super().rollout_step_shifted(params, state, x_t, shifted)


def mse(yh, y):
    return jnp.mean((yh - y) ** 2)


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    emit(devices=str(jax.devices()))
    _ = float(jnp.sum(jnp.ones((8, 8))))
    rng = np.random.default_rng(0)
    t0 = time.time()
    data = Flocking(nAgents=50, commRadius=2.0, repelDist=1.0,
                    nTrain=40 if smoke else 400,
                    nValid=10 if smoke else 20,
                    nTest=10 if smoke else 20,
                    duration=2.0, samplingTime=0.01, rng=rng)
    vel_exp = data.getData("vel", "test")
    cost_exp = float(data.evaluate(vel=vel_exp))
    emit(tag="expert", cost=cost_exp, datagen_s=round(time.time() - t0, 1))
    # per-feature inverse std over the training states
    x_tr = np.asarray(data.getData("state", "train"))   # (B, T, 6, N)
    inv_std = 1.0 / (x_tr.std(axis=(0, 1, 3)) + 1e-8)
    emit(tag="state_scales", inv_std=[float(v) for v in inv_std])

    def run(name, F, K, epochs, dagger, pe, lr, scaled=False, batch=20):
        t0 = time.time()
        if scaled:
            arch = ScaledLocalGNN_DB([6] + F, K, True, "tanh", [2], 1)
            arch.set_scale(inv_std)
        else:
            arch = archt.LocalGNN_DB([6] + F, K, True, "tanh", [2], 1)
        model = T.Model(arch, mse, {"name": "ADAM", "lr": lr},
                        T.TrainerFlocking, T.evaluate_flocking,
                        name=name, saveDir="/tmp/diag_fl_r4", N=50, T=3)
        model.train(data, epochs, batch, validationInterval=40,
                    probExpert=pe, DAGgerType=dagger, doPrint=False)
        res = model.evaluate(data)
        emit(tag="run", name=name, F=F, K=K, epochs=epochs, dagger=dagger,
             probExpert=pe, lr=lr, scaled=scaled,
             costFull=float(res["costBestFull"]),
             costEnd=float(res["costBestEnd"]),
             vs_expert=float(res["costBestFull"]) / cost_exp,
             train_s=round(time.time() - t0, 1))
        return model, res

    # stage 1: exploration (randomEpoch DAGger — r2: within 0.6% of
    # replaceTimeBatch at equal epochs, ~20x fewer rollouts)
    best = None
    explore = [
        dict(name="B_r2base", F=[64], K=[3], epochs=60,
             dagger="randomEpoch", pe=.993, lr=5e-4),
        dict(name="C_pe9", F=[64], K=[3], epochs=60,
             dagger="randomEpoch", pe=.9, lr=5e-4),
        dict(name="D_pe8", F=[64], K=[3], epochs=60,
             dagger="randomEpoch", pe=.8, lr=5e-4),
        dict(name="E_K4", F=[64], K=[4], epochs=60,
             dagger="randomEpoch", pe=.9, lr=5e-4),
        dict(name="F_F128", F=[128], K=[3], epochs=60,
             dagger="randomEpoch", pe=.9, lr=5e-4),
        dict(name="G_scaled", F=[64], K=[3], epochs=60,
             dagger="randomEpoch", pe=.9, lr=5e-4, scaled=True),
        dict(name="H_scaled_K4", F=[64], K=[4], epochs=60,
             dagger="randomEpoch", pe=.9, lr=5e-4, scaled=True),
        dict(name="I_lr1e3", F=[64], K=[3], epochs=90,
             dagger="randomEpoch", pe=.9, lr=1e-3),
        dict(name="J_scaled_2ly", F=[64, 64], K=[3, 3], epochs=60,
             dagger="randomEpoch", pe=.9, lr=5e-4, scaled=True),
    ]
    for cfg in explore:
        try:
            if smoke:
                if cfg["name"] not in ("B_r2base", "G_scaled",
                                       "J_scaled_2ly"):
                    continue
                cfg = dict(cfg, epochs=2)
            model, res = run(**cfg)
            if best is None or res["costBestFull"] < best[1]:
                best = (cfg, float(res["costBestFull"]), model)
        except Exception as e:
            emit(tag="error", name=cfg["name"], err=repr(e)[:200])
    emit(tag="best_explore", name=best[0]["name"], costFull=best[1])

    # stage 2: the winner under replaceTimeBatch DAGger (the expensive
    # per-batch relabeling — r2's best overall setting), 80 epochs
    try:
        cfg2 = dict(best[0], name=best[0]["name"] + "_rtb",
                    epochs=2 if smoke else 80, dagger="replaceTimeBatch")
        model2, res2 = run(**cfg2)
        if float(res2["costBestFull"]) < best[1]:
            best = (cfg2, float(res2["costBestFull"]), model2)
    except Exception as e:
        emit(tag="error", name="stage2", err=repr(e)[:200])
    emit(tag="best", name=best[0]["name"], costFull=best[1],
         vs_expert=best[1] / cost_exp)

    # stage 3: expert-gap decomposition — per-step cost curve
    def cost_curve(vel):
        vel = np.asarray(vel)                      # (B, T, 2, N)
        avg = vel.mean(axis=3, keepdims=True)
        return ((vel - avg) ** 2).sum(axis=2).mean(axis=(0, 2))  # (T,)

    curve_exp = cost_curve(vel_exp)
    bm = best[2]
    bm.load("Best")
    ip = data.getData("initPos", "test")
    iv = data.getData("initVel", "test")
    _, vel_b, *_ = data.compute_trajectory(
        ip, iv, data.duration, archit=bm.archit, params=bm.params,
        history_window=bm.archit.causal_window)
    curve_b = cost_curve(vel_b)
    Tn = len(curve_exp)
    emit(tag="decomposition",
         expert_first_half=float(curve_exp[:Tn // 2].mean()),
         expert_second_half=float(curve_exp[Tn // 2:].mean()),
         best_first_half=float(curve_b[:Tn // 2].mean()),
         best_second_half=float(curve_b[Tn // 2:].mean()),
         expert_curve_10=[float(v) for v in curve_exp[::max(Tn // 10, 1)]],
         best_curve_10=[float(v) for v in curve_b[::max(Tn // 10, 1)]])
    emit(done=True)


if __name__ == "__main__":
    main()
