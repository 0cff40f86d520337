"""Evaluators: run the Best and Last checkpoints on the test set.

Re-designs of ``alegnn/modules/evaluation.py``:
  evaluate (:18-89), evaluateSingleNode (:91-168),
  evaluateFlocking (:170-328) — the flocking evaluator rolls the trained
  controller closed-loop and reports the cost over the full trajectory and
  at the final instant.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _with_checkpoints(model, fn):
    out = {}
    for label in ("Best", "Last"):
        try:
            model.load(label)
        except FileNotFoundError:
            continue
        out[label] = fn(model)
    return out


def _maybe_save(model, eval_vars, do_save):
    if not do_save:
        return
    import os
    import pickle
    d = os.path.join(model.saveDir, "evalVars")
    os.makedirs(d, exist_ok=True)
    # filename parity with reference evaluation.py:85
    with open(os.path.join(d, f"{model.name}evalVars.pkl"), "wb") as f:
        pickle.dump(eval_vars, f)


def evaluate(model, data, doSaveVars: bool = True, **kwargs):
    """costBest/costLast: data.evaluate on archit(xTest).

    doSaveVars defaults True like the reference (evaluation.py:36-39):
    results pickled to saveDir/evalVars/{name}evalVars.pkl."""
    xTest, yTest = data.getSamples("test")

    def run(m):
        yHat = m.archit.apply(m.params, jnp.asarray(xTest, jnp.float32))
        return float(data.evaluate(np.asarray(yHat), yTest))
    out = _with_checkpoints(model, run)
    result = {"costBest": out.get("Best"), "costLast": out.get("Last")}
    _maybe_save(model, result, doSaveVars)
    return result


def evaluate_single_node(model, data, doSaveVars: bool = True, **kwargs):
    """Same, through singleNodeForward with test-set label ids.
    Saves evalVars like the reference (evaluation.py:160-166)."""
    xTest, yTest = data.getSamples("test")
    ids = data.getLabelID("test")

    def run(m):
        yHat = m.archit.single_node_forward(
            m.params, jnp.asarray(xTest, jnp.float32), list(ids))
        return float(data.evaluate(np.asarray(yHat), yTest))
    out = _with_checkpoints(model, run)
    result = {"costBest": out.get("Best"), "costLast": out.get("Last")}
    _maybe_save(model, result, doSaveVars)
    return result


evaluateSingleNode = evaluate_single_node


def evaluate_flocking(model, data, nVideos: int = 0, **kwargs):
    """Closed-loop trajectory cost for Best/Last over the test initial
    conditions; cost over the full trajectory + at the final instant."""
    init_pos = data.getData("initPos", "test")
    init_vel = data.getData("initVel", "test")

    def run(m):
        def policy(p, x_hist, S_hist):
            from graph_neural_networks_tpu.ops import ell as ell_lib
            if not isinstance(S_hist, ell_lib.EllGso):
                S_hist = jnp.asarray(S_hist, jnp.float32)
            return m.archit.apply(p, jnp.asarray(x_hist, jnp.float32),
                                  S_hist)
        pos, vel, _, _, _ = data.compute_trajectory(
            init_pos, init_vel, data.duration, archit=policy,
            params=m.params,
            history_window=getattr(m.archit, "causal_window", None),
            return_graphs="auto")   # cost eval never reads the graphs
        full = float(data.evaluate(vel=vel))
        end = float(data.evaluate(vel=vel[:, -1:]))
        return {"full": full, "end": end, "pos": pos}

    out = _with_checkpoints(model, run)
    result = {}
    for label in ("Best", "Last"):
        if label in out:
            result[f"cost{label}Full"] = out[label]["full"]
            result[f"cost{label}End"] = out[label]["end"]
            if nVideos > 0:
                data.saveVideo(f"{model.saveDir}/videos{label}",
                               out[label]["pos"][:nVideos])
    return result


evaluateFlocking = evaluate_flocking
