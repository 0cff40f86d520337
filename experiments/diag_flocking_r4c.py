"""Round-4 flocking sweep, part 3: D_pe8 (stronger learner mixing).

The full 9-config randomEpoch sweep + replaceTimeBatch finale is
infeasible at this session's tunnel d2h rate (~1 h/config: the DAGger
re-rolls pull dense (B,T,N,N) graph trajectories to host at
~25 MB/s, plus 30 closed-loop validations per config). This resume
runs the highest-information remainder only:

  * G_scaled — per-feature input scaling (the new hypothesis; the 6
    state features span ~3 orders of magnitude), 40 epochs
    (diag_flocking2's round-2 budget)
  * decomposition — per-step cost curve for expert vs best-so-far

replaceTimeBatch is dropped: r2 measured randomEpoch within 0.6% of
it at equal epochs. Writes experiments/diag_flocking_r4c.json; the
summarizer merges r4 + r4b.
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
out_f = open(os.path.join(HERE, "diag_flocking_r4c.json"), "w",
             buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


# NOT imported from diag_flocking_r4: importing it would re-open (and
# truncate) its results JSONL at module level.


class ScaledLocalGNN_DB(archt.LocalGNN_DB):
    """LocalGNN_DB with fixed per-feature input scaling (see
    diag_flocking_r4.py)."""

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
                    nValid=8 if smoke else 20,
                    nTest=8 if smoke else 20,
                    duration=2.0, samplingTime=0.01, rng=rng)
    vel_exp = data.getData("vel", "test")
    cost_exp = float(data.evaluate(vel=vel_exp))
    emit(tag="expert", cost=cost_exp, datagen_s=round(time.time() - t0, 1))
    x_tr = np.asarray(data.getData("state", "train"))
    inv_std = 1.0 / (x_tr.std(axis=(0, 1, 3)) + 1e-8)

    def run(name, F, K, epochs, dagger, pe, lr, scaled=False, batch=20,
            vi=120):
        t0 = time.time()
        if scaled:
            arch = ScaledLocalGNN_DB([6] + F, K, True, "tanh", [2], 1)
            arch.set_scale(inv_std)
        else:
            arch = archt.LocalGNN_DB([6] + F, K, True, "tanh", [2], 1)
        model = T.Model(arch, mse, {"name": "ADAM", "lr": lr},
                        T.TrainerFlocking, T.evaluate_flocking,
                        name=name, saveDir="/tmp/diag_fl_r4", N=50, T=3)
        model.train(data, epochs, batch, validationInterval=vi,
                    probExpert=pe, DAGgerType=dagger, doPrint=False)
        res = model.evaluate(data)
        emit(tag="run", name=name, F=F, K=K, epochs=epochs, dagger=dagger,
             probExpert=pe, lr=lr, scaled=scaled,
             costFull=float(res["costBestFull"]),
             costEnd=float(res["costBestEnd"]),
             vs_expert=float(res["costBestFull"]) / cost_exp,
             train_s=round(time.time() - t0, 1))
        return model, res

    best = None
    explore = [
        dict(name="D_pe8", F=[64], K=[3], epochs=2 if smoke else 40,
             dagger="randomEpoch", pe=.8, lr=5e-4),
    ]
    for cfg in explore:
        try:
            model, res = run(**cfg)
            if best is None or res["costBestFull"] < best[1]:
                best = (cfg, float(res["costBestFull"]), model)
        except Exception as e:
            emit(tag="error", name=cfg["name"], err=repr(e)[:200])

    # part-1's B_r2base checkpoint (same saveDir) competes for the
    # decomposition slot
    try:
        arch_b = archt.LocalGNN_DB([6, 64], [3], True, "tanh", [2], 1)
        mb = T.Model(arch_b, mse, {"name": "ADAM", "lr": 5e-4},
                     T.TrainerFlocking, T.evaluate_flocking,
                     name="B_r2base", saveDir="/tmp/diag_fl_r4",
                     N=50, T=3)
        mb.load("Best")
        res_b = mb.evaluate(data)
        cb = float(res_b["costBestFull"])
        emit(tag="run", name="B_r2base(part1-ckpt)", F=[64], K=[3],
             epochs=60, dagger="randomEpoch", probExpert=.993, lr=5e-4,
             scaled=False, costFull=cb,
             costEnd=float(res_b["costBestEnd"]),
             vs_expert=cb / cost_exp, train_s=0.0)
        if best is None or cb < best[1]:
            best = (dict(name="B_r2base"), cb, mb)
    except Exception as e:
        emit(tag="error", name="B_ckpt", err=repr(e)[:200])
    emit(tag="best", name=best[0]["name"], costFull=best[1],
         vs_expert=best[1] / cost_exp)

    # expert-gap decomposition — per-step cost curve
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
