"""Round-4 flocking sweep, recovery: evaluate the interrupted runs'
Best checkpoints + the expert-gap decomposition.

Both long training runs (B_r2base pe=.993, ~30/60 epochs; G_scaled
pe=.9, ~23/40 epochs) were killed by a tunnel failure mode — the
device connection wedges after ~35-45 min of sustained dispatch (the
client blocks forever on one call; CLAUDE.md session hygiene note).
Their per-epoch Best checkpoints survive in /tmp/diag_fl_r4, so this
short run scores them on the full test set and emits the per-step
cost decomposition for the best. Writes diag_flocking_r4d.json.
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
out_f = open(os.path.join(HERE, "diag_flocking_r4d.json"), "w",
             buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


class ScaledLocalGNN_DB(archt.LocalGNN_DB):
    def set_scale(self, scale):
        self._scale = jnp.asarray(scale, jnp.float32)

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
                    nTrain=4,         # train set unused: eval only
                    nValid=4, nTest=8 if smoke else 20,
                    duration=2.0, samplingTime=0.01, rng=rng)
    vel_exp = data.getData("vel", "test")
    cost_exp = float(data.evaluate(vel=vel_exp))
    emit(tag="expert", cost=cost_exp, datagen_s=round(time.time() - t0, 1))
    # NOTE: nTrain differs from the training runs, but the test set is
    # drawn AFTER train/valid from the same generator... it is NOT the
    # identical test set. Comparisons are vs the expert on THIS set.
    inv_std = np.array([1.710030194034431, 1.783368242570959,
                        0.43274254107076204, 0.49633522974175204,
                        0.9469420681760873, 0.8924778321077391])

    def score(name, arch):
        m = T.Model(arch, mse, {"name": "ADAM", "lr": 5e-4},
                    T.TrainerFlocking, T.evaluate_flocking,
                    name=name, saveDir="/tmp/diag_fl_r4", N=50, T=3)
        res = m.evaluate(data)
        cf = float(res["costBestFull"])
        emit(tag="run", name=name + "(ckpt)",
             costFull=cf, costEnd=float(res["costBestEnd"]),
             vs_expert=cf / cost_exp)
        return m, cf

    cands = []
    try:
        arch_b = archt.LocalGNN_DB([6, 64], [3], True, "tanh", [2], 1)
        cands.append(("B_r2base",) + score("B_r2base", arch_b))
    except Exception as e:
        emit(tag="error", name="B", err=repr(e)[:200])
    try:
        arch_g = ScaledLocalGNN_DB([6, 64], [3], True, "tanh", [2], 1)
        arch_g.set_scale(inv_std)
        cands.append(("G_scaled",) + score("G_scaled", arch_g))
    except Exception as e:
        emit(tag="error", name="G", err=repr(e)[:200])
    assert cands
    name, bm, bc = min(cands, key=lambda c: c[2])
    emit(tag="best", name=name, costFull=bc, vs_expert=bc / cost_exp)

    def cost_curve(vel):
        vel = np.asarray(vel)
        avg = vel.mean(axis=3, keepdims=True)
        return ((vel - avg) ** 2).sum(axis=2).mean(axis=(0, 2))

    curve_exp = cost_curve(vel_exp)
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
