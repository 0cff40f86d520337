"""Where do the 764 ms/step of the N=262144 grid rollout go?

Components measured separately: grid env (lam_iters=2) ~413 ms,
policy (one register shift: N*D row gathers) ~60 ms expected — leaving
~290 ms unexplained. This probe times each piece with the queued-
dispatch protocol (bench.py note: NEVER block per dispatch through the
tunnel) and the full step_fn.

Writes experiments/probe_262k_breakdown.json.
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
from graph_neural_networks_tpu.ops import ell as ell_lib

HERE = os.path.dirname(os.path.abspath(__file__))
out_f = open(os.path.join(HERE, "probe_262k_breakdown.json"), "w",
             buffering=1)
REPEAT = 5


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def timeit(fn, *args):
    g = jax.jit(fn)
    r = g(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPEAT):
            r = g(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best / REPEAT * 1e3


def main():
    emit(devices=str(jax.devices()), repeat=REPEAT)
    _ = float(jnp.sum(jnp.ones((8, 8))))
    N, D, B = 262144, 32, 1
    env = F.Flocking.for_rollout(N, commRadius=2.0, repelDist=1.0,
                                 samplingTime=0.01,
                                 rng=np.random.default_rng(0))
    ip, iv = env.compute_initial_positions(
        N, B, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
    pos = jnp.asarray(ip, jnp.float32)
    vel = jnp.asarray(iv, jnp.float32)
    v0 = jnp.ones((B, N), jnp.float32) / np.sqrt(N)
    net = archt.LocalGNN_DB(dimNodeSignals=[6, 32], nFilterTaps=[4],
                            bias=True, nonlinearity="tanh",
                            dimReadout=[2], dimEdgeFeatures=1)
    params = net.init(jax.random.PRNGKey(1), N=64, T=4)

    # components — consume EVERY output: returning slices lets XLA
    # dead-code-eliminate part of the env (round-4 finding; the round-3
    # version of this probe under-measured components this way)
    def consume(i, s, x, v, ok):
        return (jnp.sum(i.astype(jnp.float32)) + jnp.sum(s) + jnp.sum(x)
                + jnp.sum(v) + ok.astype(jnp.float32))

    def env_only(pos, vel, v0):
        return consume(*F._jnp_env_step_grid(pos, vel, 2.0, D, v0,
                                             lam_iters=2))
    emit(tag="env_grid_lam2", t_ms=timeit(env_only, pos, vel, v0))

    def env_lam0(pos, vel, v0):
        return consume(*F._jnp_env_step_grid(pos, vel, 2.0, D, v0,
                                             lam_iters=0))
    emit(tag="env_grid_lam0", t_ms=timeit(env_lam0, pos, vel, v0))

    # a realistic graph + state for the policy
    i0, s0, x0, v1, ok = jax.jit(
        lambda p, v, v0: F._jnp_env_step_grid(p, v, 2.0, D, v0,
                                              lam_iters=2))(pos, vel, v0)
    jax.block_until_ready(i0)
    pstate = net.rollout_init(params, B, N)

    def policy_only(x0, i0, s0, pstate):
        st, y = net.rollout_step(params, pstate, x0,
                                 ell_lib.EllGso(i0, s0[:, None]))
        return jnp.sum(y)
    emit(tag="policy_step", t_ms=timeit(policy_only, x0, i0, s0, pstate))

    # the full step_fn via _chunked_pieces (what the scan runs).
    # MARGINAL-step method (round 4): a short chain divided by its
    # length silently amortizes init_fn's lam_iters=32 cold start
    # (~1.4 s at 262k) into the per-step number — that arithmetic was
    # the round-3 "1.3x scan residual" (probe_gridwin_internals).
    init_fn, step_fn = env._chunked_pieces(
        net.causal_window, net, D, None, 2, step_mode=True,
        env_grid=True)

    def chain(T):
        def f(params, pos, vel):
            carry, _ = init_fn(pos, vel)

            def body(c, _):
                return step_fn(params, c)
            carry, ys = jax.lax.scan(body, carry, None, length=T)
            return sum(jnp.sum(jnp.asarray(l, jnp.float32))
                       for l in jax.tree_util.tree_leaves((carry, ys)))
        g = jax.jit(f)
        r = g(params, pos, vel)
        jax.block_until_ready(r)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = g(params, pos, vel)
            jax.block_until_ready(r)
            best = min(best, time.perf_counter() - t0)
        return best * 1e3
    t_short, t_long = chain(REPEAT), chain(5 * REPEAT)
    emit(tag="full_scan_step_marginal",
         t_ms=(t_long - t_short) / (4 * REPEAT),
         t_chain_short_ms=t_short, t_chain_long_ms=t_long)


if __name__ == "__main__":
    main()
