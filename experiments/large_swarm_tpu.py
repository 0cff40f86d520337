"""Large-swarm closed-loop flocking on one TPU chip — the capability the
ELL stack exists for: a trained decentralized controller evaluated on
swarms far bigger than its training size, with the WHOLE env+model loop
as one compiled lax.scan, O(N·deg) ELL graph histories (dense (T,N,N)
histories would not allocate), and power-iteration lambda_max (no
O(N³) eigvalsh in the loop).

Graph filters are N-independent (permutation equivariance), so params
trained at N=50 apply verbatim at N=16384 — the transferability story
of the reference (architectures.py changeGSO) at a scale it cannot run.

Sync-mode timing protocol per experiments/bench_ell_tpu.py.
Writes JSON lines to experiments/large_swarm_tpu.json.
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
from graph_neural_networks_tpu.ops import ell as ell_lib

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "large_swarm_tpu.json")
out_f = open(OUT, "w", buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def main():
    emit(devices=str(jax.devices()))
    _ = float(jnp.sum(jnp.ones((8, 8))))      # force tunnel sync mode

    # controller params are N-independent; init at a tiny N
    arch = archt.LocalGNN_DB([6, 16], [3], True, "tanh", [2], 1)
    params = arch.init(jax.random.PRNGKey(0), N=32, T=3)
    w = arch.causal_window

    def policy(p, xw, Sw):
        return arch.apply(p, jnp.asarray(xw, jnp.float32), Sw)

    dt = 0.01
    T = 100
    DEG = 32
    for (N, B) in [(4096, 2), (16384, 1)]:
        env = Flocking.for_rollout(N, commRadius=2.0, repelDist=1.0,
                                   samplingTime=dt,
                                   rng=np.random.default_rng(0))
        ip, iv = env.compute_initial_positions(
            N, B, env.commRadius, minDist=env.initMinDist,
            geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
        roll = env._scan_rollout(T, w, policy, ell_degree=DEG,
                                 lam_method="power")
        ipj = jnp.asarray(ip, jnp.float32)
        ivj = jnp.asarray(iv, jnp.float32)
        t0 = time.perf_counter()
        out = roll(params, ipj, ivj)
        jax.block_until_ready(out)
        t_compile = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = roll(params, ipj, ivj)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        pos, vel, accel, states, graphs = out
        vel_np = np.asarray(vel, np.float64)
        cost = float(env.evaluate(vel=vel_np))
        dense_hist_gb = B * T * N * N * 4 / 2**30
        ell_hist_mb = (B * T * N * DEG * (4 + 4)) / 2**20
        emit(N=N, B=B, T=T, deg=DEG,
             t_rollout_s=best, t_compile_s=t_compile,
             agent_steps_per_s=B * N * T / best,
             flocking_cost=cost,
             finite=bool(np.isfinite(vel_np).all()),
             graphs_is_ell=isinstance(graphs, ell_lib.EllGso),
             dense_graph_history_gb=dense_hist_gb,
             ell_graph_history_mb=ell_hist_mb)

    emit(done=True)


if __name__ == "__main__":
    main()
