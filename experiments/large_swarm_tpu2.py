"""Very-large-swarm closed-loop flocking on one TPU chip, part 2: the
chunked O(N·deg) environment step (env_chunk) removes the env's own
(N,N) allocations — at N=65536 the dense per-step distance/adjacency
matrices would be 17 GB EACH, so the part-1 demo (large_swarm_tpu.py)
topped out at N=16384. Here: states + top-D graph built in row chunks,
lambda_max by warm-started power iteration on the ELL matvec, whole
env+model loop still one lax.scan.

Sync-mode timing protocol per experiments/bench_ell_tpu.py.
Writes JSON lines to experiments/large_swarm_tpu2.json.
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
OUT = os.path.join(HERE,
                   os.environ.get("LSWARM_OUT", "large_swarm_tpu2.json"))
out_f = open(OUT, os.environ.get("LSWARM_MODE", "w"), buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def main():
    emit(devices=str(jax.devices()))
    _ = float(jnp.sum(jnp.ones((8, 8))))      # force tunnel sync mode

    arch = archt.LocalGNN_DB([6, 16], [3], True, "tanh", [2], 1)
    params = arch.init(jax.random.PRNGKey(0), N=32, T=3)
    w = arch.causal_window

    def policy(p, xw, Sw):
        return arch.apply(p, jnp.asarray(xw, jnp.float32), Sw)

    dt = 0.01
    DEG = 32
    # seg: host-segmented rollout bounds single-program device time —
    # the monolithic T=50 scan at N=65536 trips the runtime's execution
    # limit (UNAVAILABLE device error; see TODO.md round-2 log)
    import ast
    cases = os.environ.get("LSWARM_CASES")
    cases = (ast.literal_eval(cases) if cases else
             [(16384, 1, 100, 4096, None),
              (65536, 1, 50, 4096, 5),
              (262144, 1, 5, 2048, 1)])
    for (N, B, T, chunk, seg) in cases:
        try:
            env = Flocking.for_rollout(N, commRadius=2.0, repelDist=1.0,
                                       samplingTime=dt,
                                       rng=np.random.default_rng(0))
            ip, iv = env.compute_initial_positions(
                N, B, env.commRadius, minDist=env.initMinDist,
                geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
            if seg is None:
                roll = env._scan_rollout(T, w, policy, ell_degree=DEG,
                                         lam_method="power",
                                         env_chunk=chunk, lam_iters=8)
            else:
                roll = env._scan_rollout_segmented(
                    T, w, policy, ell_degree=DEG, env_chunk=chunk,
                    lam_iters=8, seg=seg)
            ipj = jnp.asarray(ip, jnp.float32)
            ivj = jnp.asarray(iv, jnp.float32)
            t0 = time.perf_counter()
            out = roll(params, ipj, ivj)
            jax.block_until_ready(out[:2])
            t_compile = time.perf_counter() - t0
            best = float("inf")
            for _ in range(1 if seg else 2):
                t0 = time.perf_counter()
                out = roll(params, ipj, ivj)
                jax.block_until_ready(out[:2])
                best = min(best, time.perf_counter() - t0)
            pos, vel, accel, states, graphs = out
            vel_np = np.asarray(vel, np.float64)
            cost = float(env.evaluate(vel=vel_np))
            emit(N=N, B=B, T=T, deg=DEG, env_chunk=chunk, seg=seg,
                 t_rollout_s=best, t_compile_s=t_compile,
                 ms_per_env_step=best / T * 1e3,
                 agent_steps_per_s=B * N * T / best,
                 flocking_cost=cost,
                 finite=bool(np.isfinite(vel_np).all()),
                 graphs_is_ell=isinstance(graphs, ell_lib.EllGso),
                 dense_env_step_gb=2 * B * N * N * 4 / 2**30,
                 chunk_workspace_gb=2 * B * chunk * N * 4 / 2**30)
            del out, pos, vel, accel, states, graphs
        except Exception as e:
            emit(N=N, B=B, T=T, env_chunk=chunk, error=repr(e)[:400])

    emit(done=True)


if __name__ == "__main__":
    main()
