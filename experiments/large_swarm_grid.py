"""Round-3 large-swarm closed-loop rollouts: grid env + step-mode policy.

Full closed loop (env + LocalGNN_DB policy + physics) per step, at
N = 16384 / 65536 / 262144 on one chip, vs the round-2 numbers
(RESULTS.md: 31 s per 100-step rollout at 16k; 3.3 s/step at 65k;
37.8 s/step at 262k with the segmented chunked rollout).

Measures BOTH device-only time (rollout + on-device flocking cost, one
scalar d2h) and the with-trajectory-transfer time — the axon tunnel
moves the O(T·N·D) trajectory at ~25 MB/s, so at these sizes the d2h
dominates any number that pulls full trajectories to host.

Writes experiments/large_swarm_grid.json.
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
out_f = open(os.path.join(HERE, "large_swarm_grid.json"), "w", buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def main():
    emit(devices=str(jax.devices()))
    _ = float(jnp.sum(jnp.ones((8, 8))))
    D = 32
    net = archt.LocalGNN_DB(dimNodeSignals=[6, 32], nFilterTaps=[4],
                            bias=True, nonlinearity="tanh",
                            dimReadout=[2], dimEdgeFeatures=1)
    params = net.init(jax.random.PRNGKey(1), N=64, T=4)

    for N, T, lam_iters in [(16384, 51, 8), (16384, 51, 2),
                            (65536, 26, 2), (262144, 11, 2)]:
        env = F.Flocking.for_rollout(
            N, commRadius=2.0, repelDist=1.0, samplingTime=0.01,
            rng=np.random.default_rng(0))
        ip, iv = env.compute_initial_positions(
            N, 1, env.commRadius, minDist=env.initMinDist,
            geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
        ip = jnp.asarray(ip, jnp.float32)
        iv = jnp.asarray(iv, jnp.float32)
        roll = env._scan_rollout(T, net.causal_window, net, ell_degree=D,
                                 env_grid=True, lam_iters=lam_iters,
                                 step_mode=True)

        @jax.jit
        def roll_cost(params, ip, iv):
            pos, vel, acc, xs, graphs, ok = roll(params, ip, iv)
            avg = jnp.mean(vel, axis=3, keepdims=True)
            cost_t = jnp.mean(jnp.sum((vel - avg) ** 2, axis=2), axis=2)
            return jnp.mean(jnp.sum(cost_t, axis=1)), ok

        t0 = time.perf_counter()
        cost, ok = roll_cost(params, ip, iv)
        cost, ok = float(cost), bool(ok)
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        c2, _ = roll_cost(params, ip, iv)
        _ = float(c2)
        t_dev = time.perf_counter() - t0

        # with-trajectory-transfer (the tunnel d2h shows up here)
        out = roll(params, ip, iv)
        jax.block_until_ready(out[0])
        t0 = time.perf_counter()
        out = roll(params, ip, iv)
        host = [np.asarray(o) for o in jax.tree_util.tree_leaves(out)]
        t_xfer = time.perf_counter() - t0
        nbytes = sum(h.nbytes for h in host)

        emit(N=N, T=T, lam_iters=lam_iters, ok=ok,
             s_first=t_first, s_device=t_dev,
             ms_per_step_device=t_dev / (T - 1) * 1e3,
             s_with_transfer=t_xfer, traj_mb=nbytes / 1e6,
             cost=cost)


if __name__ == "__main__":
    main()
