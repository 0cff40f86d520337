"""How many warm-started power iterations does the rollout's lambda_max
tracking need? The grid/chunked env normalizes each step's binary
communication graph by lambda_max estimated with `lam_iters` iterations
warm-started from the previous step's eigenvector. Fewer iterations =
faster steps (each ELL matvec is ~60 ms at N=262k) but a lagged lambda
perturbs the policy inputs. This probe rolls the same swarm at
lam_iters in {1, 2, 4, 8} against a converged reference (64) and
reports trajectory and flocking-cost deltas.

Writes experiments/probe_lambda_fidelity.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from graph_neural_networks_tpu.data import flocking as F
from graph_neural_networks_tpu.models import architectures_time as archt

HERE = os.path.dirname(os.path.abspath(__file__))
out_f = open(os.path.join(HERE, "probe_lambda_fidelity.json"), "w",
             buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def main():
    emit(devices=str(jax.devices()))
    _ = float(jnp.sum(jnp.ones((8, 8))))
    N, T, D = 4096, 101, 32
    env = F.Flocking.for_rollout(N, commRadius=2.0, repelDist=1.0,
                                 samplingTime=0.01,
                                 rng=np.random.default_rng(0))
    ip, iv = env.compute_initial_positions(
        N, 1, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
    net = archt.LocalGNN_DB(dimNodeSignals=[6, 32], nFilterTaps=[4],
                            bias=True, nonlinearity="tanh",
                            dimReadout=[2], dimEdgeFeatures=1)
    params = net.init(jax.random.PRNGKey(1), N=64, T=4)
    dur = T * env.samplingTime

    def run(li):
        out = env.compute_trajectory(
            ip, iv, dur, archit=net, params=params, ell_degree=D,
            env_grid=True, lam_iters=li,
            history_window=net.causal_window)
        return out[0], out[1], env.evaluate(vel=out[1])

    pos_ref, vel_ref, cost_ref = run(64)
    scale = np.abs(pos_ref).max()
    emit(tag="reference", lam_iters=64, cost=cost_ref,
         pos_scale=float(scale))
    # lam_iters=0 on the kernel/window path (r4) is the ZERO-pass FOLD
    # mode: Rayleigh lambda from the main pass's folded W@v, v advanced
    # one warm power iteration per step
    for li in (8, 4, 2, 1, 0):
        pos, vel, cost = run(li)
        emit(lam_iters=li, fold=(li == 0), cost=cost,
             cost_rel_err=abs(cost - cost_ref) / cost_ref,
             pos_maxdiff=float(np.abs(pos - pos_ref).max()),
             pos_rel=float(np.abs(pos - pos_ref).max() / scale))


if __name__ == "__main__":
    main()
