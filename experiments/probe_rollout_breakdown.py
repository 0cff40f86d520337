"""Where do the 310 ms/step of the N=16384 closed-loop rollout go?

The chunked env step benches at ~15 ms (bench_swarm_env_tpu.json), yet
the full rollout costs ~310 ms/step — and the dense-env rollout costs
about the same, so the bottleneck is in the SHARED path (policy on ELL
windows / window bookkeeping), not the env. This probe times each
component in isolation with the fori-chain sync protocol
(experiments/bench_ell_tpu.py): policy-only, env-only, window-roll-only,
and the full step.

Writes JSON lines to experiments/probe_rollout_breakdown.json.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from graph_neural_networks_tpu.data import flocking as F
from graph_neural_networks_tpu.models import architectures_time as archt
from graph_neural_networks_tpu.ops import ell as ell_lib

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "probe_rollout_breakdown.json")
out_f = open(OUT, "w", buffering=1)
REPEAT = 10


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def device_time(fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best / REPEAT


def main():
    emit(devices=str(jax.devices()), repeat=REPEAT)
    _ = float(jnp.sum(jnp.ones((8, 8))))
    rng = np.random.default_rng(0)

    N = int(os.environ.get("PROBE_N", 16384))
    B, D, w = 1, 32, 3
    chunk = min(4096, N)
    arch = archt.LocalGNN_DB([6, 16], [3], True, "tanh", [2], 1)
    params = arch.init(jax.random.PRNGKey(0), N=32, T=3)

    env = F.Flocking.for_rollout(N, commRadius=2.0, repelDist=1.0,
                                 samplingTime=0.01,
                                 rng=np.random.default_rng(0))
    ip, iv = env.compute_initial_positions(
        N, B, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
    pos = jnp.asarray(ip, jnp.float32)
    vel = jnp.asarray(iv, jnp.float32)
    v0 = jnp.ones((B, N), jnp.float32) / np.sqrt(N)
    i0, s0, x0, v0 = jax.jit(
        lambda p, v, vp: F._jnp_env_step_chunked(p, v, 2.0, D, chunk, vp,
                                                 lam_iters=32))(pos, vel, v0)
    xw = jnp.zeros((B, w, 6, N), jnp.float32).at[:, -1].set(x0)
    iw = jnp.zeros((B, w, N, D), jnp.int32).at[:, -1].set(i0)
    vw = jnp.zeros((B, w, 1, N, D), jnp.float32).at[:, -1].set(s0[:, None])

    # 1. policy only, chained
    @jax.jit
    def policy_chain(params, xw, iw, vw):
        def step(i, xw):
            y = arch.apply(params, xw, ell_lib.EllGso(iw, vw))
            return xw + 0.0 * y[:, -1, :1]          # dependence, same shape
        return jax.lax.fori_loop(0, REPEAT, step, xw)

    t = device_time(policy_chain, params, xw, iw, vw)
    emit(tag="policy_only", N=N, t_ms=t * 1e3)

    # 2. env only, chained (matches bench_swarm_env_tpu env_step)
    @jax.jit
    def env_chain(pos, vel, v):
        def step(i, c):
            pos, vel, v = c
            i_n, s_n, x_n, v = F._jnp_env_step_chunked(
                pos, vel, 2.0, D, chunk, v, lam_iters=8)
            return (pos + 0.0 * x_n[:, :2], vel, v)
        return jax.lax.fori_loop(0, REPEAT, step, (pos, vel, v0))[0]

    t = device_time(env_chain, pos, vel, v0)
    emit(tag="env_only", N=N, t_ms=t * 1e3)

    # 3. window roll only
    @jax.jit
    def window_chain(xw, iw, vw):
        def step(i, c):
            xw, iw, vw = c
            xw = jnp.concatenate([xw[:, 1:], xw[:, :1]], axis=1)
            iw = jnp.concatenate([iw[:, 1:], iw[:, :1]], axis=1)
            vw = jnp.concatenate([vw[:, 1:], vw[:, :1]], axis=1)
            return (xw, iw, vw)
        return jax.lax.fori_loop(0, REPEAT, step, (xw, iw, vw))[0]

    t = device_time(window_chain, xw, iw, vw)
    emit(tag="window_roll_only", N=N, t_ms=t * 1e3)

    # 3b. ablated scan variants: same scan structure as the rollout, with
    # pieces knocked out — isolates policy-in-scan vs env-in-scan vs
    # trajectory stacking (ys) cost.
    init_fn, step_fn = env._chunked_pieces(w, lambda p, xw, Sw: arch.apply(
        p, xw, Sw), D, chunk, 8)
    carry0, _ = jax.jit(init_fn)(pos, vel)

    def time_scan(fn):
        g = jax.jit(fn)
        r = g(params, carry0)
        jax.block_until_ready(r)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = g(params, carry0)
            jax.block_until_ready(r)
            best = min(best, time.perf_counter() - t0)
        return best / REPEAT * 1e3

    def scan_carry_only(params, carry):
        def body(c, _):
            c, _y = step_fn(params, c)
            return c, None
        return jax.lax.scan(body, carry, None, length=REPEAT)[0]

    emit(tag="scan_carry_only", N=N, t_ms=time_scan(scan_carry_only))

    def scan_no_policy(params, carry):
        def body(c, _):
            pos_t, vel_t, xw, iw, vw, v = c
            a = jnp.zeros_like(vel_t)
            vel_n = a * 0.01 + vel_t
            pos_n = vel_t * 0.01 + pos_t
            i_n, s_n, x_n, v = F._jnp_env_step_chunked(
                pos_n, vel_n, 2.0, D, chunk, v, lam_iters=8)
            xw = jnp.concatenate([xw[:, 1:], x_n[:, None]], axis=1)
            iw = jnp.concatenate([iw[:, 1:], i_n[:, None]], axis=1)
            vw = jnp.concatenate([vw[:, 1:], s_n[:, None, None]], axis=1)
            return ((pos_n, vel_n, xw, iw, vw, v),
                    (pos_n, vel_n, a, x_n, (i_n, s_n)))
        return jax.lax.scan(body, carry, None, length=REPEAT)

    emit(tag="scan_no_policy", N=N, t_ms=time_scan(scan_no_policy))

    def scan_env_minimal(params, carry):
        # same env step, scan primitive, but tiny carry (no windows, no ys)
        pos_t, vel_t, *_ , v_t = carry
        def body(c, _):
            pos, vel, v = c
            i_n, s_n, x_n, v = F._jnp_env_step_chunked(
                pos, vel, 2.0, D, chunk, v, lam_iters=8)
            return (pos + 0.0 * x_n[:, :2], vel, v), None
        return jax.lax.scan(body, (pos_t, vel_t, v_t), None,
                            length=REPEAT)[0]

    emit(tag="scan_env_minimal", N=N, t_ms=time_scan(scan_env_minimal))

    def fori_env_windows(params, carry):
        # env + window concats, fori primitive, windows in carry
        def body(i, c):
            pos, vel, xw, iw, vw, v = c
            i_n, s_n, x_n, v = F._jnp_env_step_chunked(
                pos, vel, 2.0, D, chunk, v, lam_iters=8)
            xw = jnp.concatenate([xw[:, 1:], x_n[:, None]], axis=1)
            iw = jnp.concatenate([iw[:, 1:], i_n[:, None]], axis=1)
            vw = jnp.concatenate([vw[:, 1:], s_n[:, None, None]], axis=1)
            return (pos + 0.0 * x_n[:, :2], vel, xw, iw, vw, v)
        return jax.lax.fori_loop(0, REPEAT, body, carry)[0]

    emit(tag="fori_env_windows", N=N, t_ms=time_scan(fori_env_windows))

    @jax.jit
    def fori_env_full_dep(pos, vel, v):
        # dependence on ALL env outputs (idx, val, states, v): nothing
        # can be dead-code-eliminated. If this matches scan_env_minimal,
        # the fast "env_only" fori numbers were a DCE artifact and the
        # true env cost is topk-dominated.
        def body(i, c):
            pos, vel, v = c
            i_n, s_n, x_n, v = F._jnp_env_step_chunked(
                pos, vel, 2.0, D, chunk, v, lam_iters=8)
            dep = (s_n.sum() + i_n.sum().astype(jnp.float32)
                   + x_n[:, :2] * 0.0)
            return (pos + 0.0 * dep, vel, v)
        return jax.lax.fori_loop(0, REPEAT, body, (pos, vel, v))[0]

    r = fori_env_full_dep(pos, vel, v0); jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = fori_env_full_dep(pos, vel, v0); jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    emit(tag="fori_env_full_dep", N=N, t_ms=best / REPEAT * 1e3)

    def scan_full_ys(params, carry):
        def body(c, _):
            return step_fn(params, c)
        return jax.lax.scan(body, carry, None, length=REPEAT)

    emit(tag="scan_full_ys", N=N, t_ms=time_scan(scan_full_ys))

    # 4. full scan step (monolithic rollout program, T=REPEAT+1)
    policy = lambda p, xw, Sw: arch.apply(p, xw, Sw)
    roll = env._scan_rollout(REPEAT + 1, w, policy, ell_degree=D,
                             lam_method="power", env_chunk=chunk,
                             lam_iters=8)
    r = roll(params, pos, vel)
    jax.block_until_ready(r[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = roll(params, pos, vel)
        jax.block_until_ready(r[0])
        best = min(best, time.perf_counter() - t0)
    emit(tag="full_scan_step", N=N, t_ms=best / REPEAT * 1e3)

    emit(done=True)


if __name__ == "__main__":
    main()
