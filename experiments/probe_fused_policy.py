"""Fused-policy rollout probe (round 4): the policy's tap registers
ride the grid env's cell table as payload blocks, so the env's window
pass emits S_t @ registers and the policy's separate O(N*d_max)-row
ELL register gather disappears (at 1M that gather's padded temp alone
was ~9 GB and OOM'd the monolithic scan: /tmp/probe1m.log, round 4).

Measures on chip:
  1. one-step parity fused vs unfused at N=262144 (rel maxdiff),
  2. marginal full-scan step (chain T=25 minus T=5) fused vs unfused,
  3. env-only step cost with vs without an 18-wide payload (lam0),
  4. the 1M-agent fused rollout (chain 13 minus chain 3).

Writes experiments/probe_fused_policy.json (JSONL).
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
out_f = open(os.path.join(HERE, "probe_fused_policy.json"), "w", buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def bench_once(g, *args):
    r = g(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        r = g(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def make(env, net, params, pos, vel, D, fused):
    if fused:
        os.environ.pop("GNT_NO_FUSED_POLICY", None)
    else:
        os.environ["GNT_NO_FUSED_POLICY"] = "1"
    init_fn, step_fn = env._chunked_pieces(
        net.causal_window, net, D, None, 0, step_mode=True,
        env_grid=True)
    os.environ.pop("GNT_NO_FUSED_POLICY", None)
    return init_fn, step_fn


def chain_fn(init_fn, step_fn, T):
    # consume EVERY output (carry and ys) so no env component is
    # dead-code-eliminated; ys are reduced per step inside the scan
    # (carried scalar) so long chains don't stack O(T*N*D) trajectories
    def f(params, pos, vel):
        def body(c, _):
            carry, acc = c
            carry, ys = step_fn(params, carry)
            acc = acc + sum(jnp.sum(jnp.asarray(l, jnp.float32))
                            for l in jax.tree_util.tree_leaves(ys))
            return (carry, acc), None
        (carry, acc), _ = jax.lax.scan(
            body, (init_fn(pos, vel)[0], jnp.float32(0)), None, length=T)
        return acc + sum(jnp.sum(jnp.asarray(l, jnp.float32))
                         for l in jax.tree_util.tree_leaves(carry))
    return jax.jit(f)


def setup(N, B, seed=0):
    env = F.Flocking.for_rollout(N, commRadius=2.0, repelDist=1.0,
                                 samplingTime=0.01,
                                 rng=np.random.default_rng(seed))
    ip, iv = env.compute_initial_positions(
        N, B, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
    return env, jnp.asarray(ip, jnp.float32), jnp.asarray(iv, jnp.float32)


def main():
    emit(devices=str(jax.devices()))
    _ = float(jnp.sum(jnp.ones((8, 8))))          # force sync tunnel mode

    net = archt.LocalGNN_DB(dimNodeSignals=[6, 32], nFilterTaps=[4],
                            bias=True, nonlinearity="tanh",
                            dimReadout=[2], dimEdgeFeatures=1)
    params = net.init(jax.random.PRNGKey(1), N=64, T=4)
    emit(tag="payload_width", P=net.payload_width)

    # ---- N=262144: parity + marginal step, fused vs unfused ----------
    N, B, D = 262144, 1, 32
    env, pos, vel = setup(N, B)

    def one_step(fused):
        init_fn, step_fn = make(env, net, params, pos, vel, D, fused)

        def f(params, pos, vel):
            c, _ = init_fn(pos, vel)
            c, ys = step_fn(params, c)
            return ys
        return jax.jit(f)(params, pos, vel)

    ys_u = one_step(False)
    ys_f = one_step(True)
    rel = {}
    for i, name in enumerate(["pos", "vel", "a", "x"]):
        d = float(jnp.max(jnp.abs(ys_f[i] - ys_u[i])))
        s = float(jnp.max(jnp.abs(ys_u[i]))) or 1.0
        rel[name] = d / s
    emit(tag="parity_262k", **rel)
    del ys_u, ys_f

    for fused in (False, True):
        init_fn, step_fn = make(env, net, params, pos, vel, D, fused)
        t5 = bench_once(chain_fn(init_fn, step_fn, 5), params, pos, vel)
        t25 = bench_once(chain_fn(init_fn, step_fn, 25), params, pos, vel)
        emit(tag="scan_262k", fused=fused, t5_ms=t5, t25_ms=t25,
             step_ms=(t25 - t5) / 20,
             agent_steps_per_s=N / ((t25 - t5) / 20 / 1e3))

    # ---- env-only: payload cost isolation (lam0) ----------------------
    v0 = jnp.ones((B, N), jnp.float32) / np.sqrt(N)
    pay = jnp.asarray(
        np.random.default_rng(1).random((B, N, 18)), jnp.float32)

    # quad scheme (cell_cap=32, factor=2) — what env_grid=True uses
    def env_plain(p, v, vv):
        o = F._jnp_env_step_grid(p, v, 2.0, D, vv, lam_iters=0,
                                 cell_cap=32, cell_factor=2)
        return sum(jnp.sum(jnp.asarray(l, jnp.float32)) for l in o)

    def env_pay(p, v, vv, pl):
        o = F._jnp_env_step_grid(p, v, 2.0, D, vv, lam_iters=0,
                                 cell_cap=32, cell_factor=2, payload=pl)
        return sum(jnp.sum(jnp.asarray(l, jnp.float32)) for l in o)

    def chainE(f, n, with_pay):
        # the carry feeds v_prev so iterations depend on each other
        # (no CSE); the first version of this chain closed over the
        # OUTER vv and XLA CSE'd the whole loop to one env step
        def g(p, v, vv, pl):
            def body(vc, _):
                s = (f(p, v, vc, pl) if with_pay else f(p, v, vc))
                return vc + jnp.broadcast_to(s * 1e-20, vc.shape), None
            vvn, _ = jax.lax.scan(body, vv, None, length=n)
            return jnp.sum(vvn)
        return jax.jit(g)

    t2 = bench_once(chainE(env_plain, 2, False), pos, vel, v0, pay)
    t10 = bench_once(chainE(env_plain, 10, False), pos, vel, v0, pay)
    emit(tag="env_262k_lam0", t_ms=(t10 - t2) / 8)
    t2 = bench_once(chainE(env_pay, 2, True), pos, vel, v0, pay)
    t10 = bench_once(chainE(env_pay, 10, True), pos, vel, v0, pay)
    emit(tag="env_262k_lam0_pay18", t_ms=(t10 - t2) / 8)
    del env, pos, vel, v0, pay

    # ---- the 1M-agent fused rollout -----------------------------------
    N = 1048576
    env, pos, vel = setup(N, B)
    init_fn, step_fn = make(env, net, params, pos, vel, D, True)
    t3 = bench_once(chain_fn(init_fn, step_fn, 3), params, pos, vel)
    t13 = bench_once(chain_fn(init_fn, step_fn, 13), params, pos, vel)
    step_ms = (t13 - t3) / 10
    emit(tag="swarm_1M_fused", t_chain3_ms=t3, t_chain13_ms=t13,
         step_ms=step_ms, agent_steps_per_s=N / (step_ms / 1e3))

    # exactness flag at 1M (one step, via the carry)
    init_fn2, step_fn2 = make(env, net, params, pos, vel, D, True)

    def okf(params, pos, vel):
        c, _ = init_fn2(pos, vel)
        c, _ = step_fn2(params, c)
        return c[-1]
    emit(tag="swarm_1M_ok", ok=bool(jax.jit(okf)(params, pos, vel)))
    emit(done=True)


if __name__ == "__main__":
    main()
