"""1M-agent fused closed-loop rollout on the round-5 stack.

Re-validates the million-agent monolithic scan after the fused table
build became the default (the r4 number, 432 ms/step, predates it) and
after table_build's per-tile starts DMA fix (the whole-array SMEM
prefetch was 4 B over the chip's 1 MB SMEM at this geometry — the
first r5 attempt failed to compile). Marginal step = (chain 13 - chain
3) / 10, every output consumed. Also measures the eval-shaped
(return_graphs=False) step — the serving configuration.

Writes experiments/probe_1m_r5.json.
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
out_f = open(os.path.join(HERE, "probe_1m_r5.json"), "w", buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    emit(devices=str(jax.devices()))
    float(jnp.zeros(8).sum())          # sync-mode d2h
    N = 4096 if smoke else 1048576
    D = 32
    env = F.Flocking.for_rollout(N, commRadius=2.0, repelDist=1.0,
                                 samplingTime=0.01,
                                 rng=np.random.default_rng(0))
    ip, iv = env.compute_initial_positions(
        N, 1, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
    pos = jnp.asarray(ip, jnp.float32)
    vel = jnp.asarray(iv, jnp.float32)
    net = archt.LocalGNN_DB([6, 32], [4], True, "tanh", [2], 1)
    params = net.init(jax.random.PRNGKey(1), N=64, T=4)

    # eval-shaped only: the train-shaped (return_graphs=True) 1M
    # number comes from probe_fused_policy.json (282.4 ms/step) — a
    # 13-deep train-shaped chain OOMs HBM here (23.3 GB: the stacked
    # (T, N, 32) ELL graph trajectory dominates), which is itself the
    # point of the eval shape
    for return_graphs in ((False,) if not smoke else (True, False)):
        init_fn, step_fn = env._chunked_pieces(
            net.causal_window, net, D, None, 0, step_mode=True,
            env_grid=True, return_graphs=return_graphs)

        def chain(T):
            @jax.jit
            def f(params, pos, vel):
                carry, _ = init_fn(pos, vel)
                carry, ys = jax.lax.scan(
                    lambda c, _: step_fn(params, c), carry, None,
                    length=T)
                return sum(jnp.sum(jnp.asarray(l, jnp.float32))
                           for l in jax.tree_util.tree_leaves(
                               (carry, ys))), carry[-1]
            r, ok = f(params, pos, vel)
            jax.block_until_ready(r)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                r, ok = f(params, pos, vel)
                jax.block_until_ready(r)
                best = min(best, time.perf_counter() - t0)
            return best * 1e3, bool(ok)

        t3, ok3 = chain(3)
        t13, ok13 = chain(13)
        step_ms = (t13 - t3) / 10
        emit(tag="scan_1m" if not smoke else "scan_smoke",
             return_graphs=return_graphs, t3_ms=t3, t13_ms=t13,
             step_ms=step_ms, ok=ok3 and ok13,
             agent_steps_per_s=N / (step_ms / 1e3))
    emit(done=True)


if __name__ == "__main__":
    main()
