"""Round-4 grid-env kernel v2 probe at N=262144 (and the scan residual).

Measures, on the real chip:
  * env step (grid) with the fused Pallas candidate-path kernel vs the
    XLA window path, lam_iters 0 and 2 — ALL outputs consumed (the
    round-3 probe returned slices, so XLA dead-code-eliminated part of
    the env: components were under-measured, inflating the apparent
    scan residual; `dce_env_lam0` reproduces that variant for
    comparison),
  * kernel-vs-XLA exactness on chip,
  * the full closed-loop scan step (policy + env + physics) so the
    residual = full - (env + policy) can be judged against honestly
    measured components.

Writes experiments/probe_gridwin_v2.json.
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
out_f = open(os.path.join(HERE, "probe_gridwin_v2.json"), "w", buffering=1)
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
    _ = float(jnp.sum(jnp.ones((8, 8))))   # tunnel warm-up transfer
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

    def consume(i, s, x, v, ok):
        # consume EVERY output so nothing is DCE'd
        return (jnp.sum(i.astype(jnp.float32)) + jnp.sum(s) + jnp.sum(x)
                + jnp.sum(v) + ok.astype(jnp.float32))

    def env_fn(kernel, iters, factor=1):
        def f(pos, vel, v0):
            out = F._jnp_env_step_grid(pos, vel, 2.0, D, v0,
                                       lam_iters=iters,
                                       use_kernel=kernel,
                                       cell_factor=factor,
                                       cell_cap=16 * factor)
            return consume(*out)
        return f

    for iters in (0, 2):
        emit(tag=f"env_v2_lam{iters}",
             t_ms=timeit(env_fn(True, iters), pos, vel, v0))
        emit(tag=f"env_quad_lam{iters}",
             t_ms=timeit(env_fn(True, iters, 2), pos, vel, v0))
        emit(tag=f"env_xla_lam{iters}",
             t_ms=timeit(env_fn(False, iters), pos, vel, v0))

    # the round-3 probe's DCE-prone variant, for the record
    def dce_env(pos, vel, v0):
        i, s, x, v, ok = F._jnp_env_step_grid(pos, vel, 2.0, D, v0,
                                              lam_iters=0,
                                              use_kernel=True)
        return jnp.sum(s[:, :, 0]) + jnp.sum(x[:, 0])
    emit(tag="dce_env_v2_lam0", t_ms=timeit(dce_env, pos, vel, v0))

    # on-chip exactness: kernel vs XLA window path
    ik, sk, xk, vk, okk = jax.jit(lambda p, v, v0: F._jnp_env_step_grid(
        p, v, 2.0, D, v0, lam_iters=2, use_kernel=True))(pos, vel, v0)
    ix, sx, xx, vx, okx = jax.jit(lambda p, v, v0: F._jnp_env_step_grid(
        p, v, 2.0, D, v0, lam_iters=2, use_kernel=False,
        lam_path="window"))(pos, vel, v0)
    exact_idx = bool(jnp.all(ik == ix))
    sd = float(jnp.max(jnp.abs(sk - sx)))
    xd = float(jnp.max(jnp.abs(xk - xx)))
    emit(tag="exactness_kernel_vs_xla", idx_equal=exact_idx,
         val_maxdiff=sd, states_maxdiff=xd,
         ok=bool(okk) and bool(okx))

    # policy step (register shift), all outputs consumed
    net = archt.LocalGNN_DB(dimNodeSignals=[6, 32], nFilterTaps=[4],
                            bias=True, nonlinearity="tanh",
                            dimReadout=[2], dimEdgeFeatures=1)
    params = net.init(jax.random.PRNGKey(1), N=64, T=4)
    pstate = net.rollout_init(params, B, N)

    def policy_only(x0, i0, s0, pstate):
        st, y = net.rollout_step(params, pstate, x0,
                                 ell_lib.EllGso(i0, s0[:, None]))
        return (jnp.sum(y)
                + sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(st)))
    emit(tag="policy_step",
         t_ms=timeit(policy_only, xk, ik, sk, pstate))

    # full scan step via _chunked_pieces (what the rollout runs)
    init_fn, step_fn = env._chunked_pieces(
        net.causal_window, net, D, None, 2, step_mode=True,
        env_grid=True)

    def full_step_chain(params, pos, vel):
        carry, _ = init_fn(pos, vel)

        def body(c, _):
            return step_fn(params, c)
        carry, ys = jax.lax.scan(body, carry, None, length=REPEAT)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(ys))
    g = jax.jit(full_step_chain)
    r = g(params, pos, vel)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = g(params, pos, vel)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    emit(tag="full_scan_step", t_ms=best / REPEAT * 1e3)
    emit(done=True)


if __name__ == "__main__":
    main()
