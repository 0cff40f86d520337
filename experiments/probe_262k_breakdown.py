"""Where does the N=262144 fused closed-loop step (96 ms, round 4) go?

Round-3 history: the full step was 990 ms with a mysterious "1.3x scan
residual" — which turned out to be the probe's own arithmetic (a short
chain divided by its length amortizes init_fn's lam_iters=32 cold
start into the per-step number). Round 4 measures everything marginal
and itemizes the FUSED-policy stack (registers as table payload):

  build (sort + feature-blocked scatter)  with / without payload
  window pass (gather + fused kernel)     with / without payload
  policy math (tap combine + readout, no graph work)
  env step total (fold lambda)            with / without payload
  full scan step, fused vs unfused        (marginal: chain25 - chain5)

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


def rt_measure():
    z = jnp.ones((8, 8))
    float(jnp.sum(z))
    best = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        float(jnp.sum(z))
        best = min(best, time.perf_counter() - t0)
    return best


def timeit(fn, *args):
    g = jax.jit(fn)
    r = g(*args)
    jax.block_until_ready(r)
    rt = rt_measure()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPEAT):
            r = g(*args)
        jax.block_until_ready(r)
        best = min(best, max(time.perf_counter() - t0 - rt, 1e-9))
    return best / REPEAT * 1e3


def main():
    emit(devices=str(jax.devices()), repeat=REPEAT)
    _ = float(jnp.sum(jnp.ones((8, 8))))
    N, D, B, PW = 262144, 32, 1, 18
    env = F.Flocking.for_rollout(N, commRadius=2.0, repelDist=1.0,
                                 samplingTime=0.01,
                                 rng=np.random.default_rng(0))
    ip, iv = env.compute_initial_positions(
        N, B, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
    pos = jnp.asarray(ip, jnp.float32)
    vel = jnp.asarray(iv, jnp.float32)
    v0 = jnp.ones((B, N), jnp.float32) / np.sqrt(N)
    pay = jnp.asarray(np.random.default_rng(1).random((B, N, PW)),
                      jnp.float32)
    net = archt.LocalGNN_DB(dimNodeSignals=[6, 32], nFilterTaps=[4],
                            bias=True, nonlinearity="tanh",
                            dimReadout=[2], dimEdgeFeatures=1)
    params = net.init(jax.random.PRNGKey(1), N=64, T=4)

    # quad-scheme geometry (env_grid=True defaults)
    H, Gx, Gy, C = F._grid_geometry(N, None, 32, 2)
    inv_s = 1.0 / (2 * 2.0)
    r2 = 2.0 ** 2

    # -- build: sort + feature-blocked scatter --------------------------
    def build(px, py, vx, vy, vv, pl):
        rows, *_ = F._grid_build_table(px, py, vx, vy, inv_s, H, Gx, Gy,
                                       C, v=vv, pay=pl)
        return jnp.sum(rows)
    a = (pos[0, 0], pos[0, 1], vel[0, 0], vel[0, 1], v0[0])
    emit(tag="build_7f", t_ms=timeit(lambda *z: build(*z, None), *a))
    emit(tag="build_25f", t_ms=timeit(build, *a, pay[0]))

    # -- window pass: gather + fused kernel on a prebuilt table ---------
    for n_pay, tag in ((0, "window_pass"), (PW, "window_pass_pay18")):
        rows, cx, cy, ok, _ = jax.jit(
            lambda px, py, vx, vy, vv, pl: F._grid_build_table(
                px, py, vx, vy, inv_s, H, Gx, Gy, C, v=vv,
                pay=pl if n_pay else None),
            static_argnames=())(*a, pay[0])
        jax.block_until_ready(rows)
        Wt = rows.shape[1]
        chunk = F._fit_chunk(N, max(4096, 65536 * 256 // Wt))

        def wpass(px, py, vx, vy, cx, cy, rows):
            out = F._grid_rows_chunked(
                px, py, vx, vy, cx, cy, 0, N, chunk, rows, Gx, Gy, C,
                r2, D, N, inv_s=inv_s, factor=2, n_pay=n_pay)
            return sum(jnp.sum(jnp.asarray(l, jnp.float32))
                       for l in out)
        emit(tag=tag, t_ms=timeit(wpass, pos[0, 0], pos[0, 1],
                                  vel[0, 0], vel[0, 1], cx, cy, rows),
             table_lanes=int(Wt), chunk=int(chunk))

    # -- policy math alone (tap combine + readout, shift precomputed) ---
    pstate = net.rollout_init(params, B, N)
    x0 = jnp.asarray(np.random.default_rng(2).random((B, 6, N)),
                     jnp.float32)

    def policy_math(x0, pstate, sh):
        st, y = net.rollout_step_shifted(params, pstate, x0, sh)
        return jnp.sum(y)
    emit(tag="policy_combine",
         t_ms=timeit(policy_math, x0, pstate, pay))

    # -- the policy's UNFUSED graph work (register shift by ELL gather) -
    i0, s0, x0e, v1, ok = jax.jit(
        lambda p, v, vv: F._jnp_env_step_grid(
            p, v, 2.0, D, vv, lam_iters=0, cell_cap=32,
            cell_factor=2))(pos, vel, v0)
    jax.block_until_ready(i0)

    def policy_unfused(x0, i0, s0, pstate):
        st, y = net.rollout_step(params, pstate, x0,
                                 ell_lib.EllGso(i0, s0[:, None]))
        return jnp.sum(y)
    emit(tag="policy_step_unfused",
         t_ms=timeit(policy_unfused, x0e, i0, s0, pstate))

    # -- env step total (fold lambda), with / without payload ----------
    def env_plain(p, v, vv):
        o = F._jnp_env_step_grid(p, v, 2.0, D, vv, lam_iters=0,
                                 cell_cap=32, cell_factor=2)
        return sum(jnp.sum(jnp.asarray(l, jnp.float32)) for l in o)
    emit(tag="env_grid_lam0", t_ms=timeit(env_plain, pos, vel, v0))

    def env_pay(p, v, vv, pl):
        o = F._jnp_env_step_grid(p, v, 2.0, D, vv, lam_iters=0,
                                 cell_cap=32, cell_factor=2, payload=pl)
        return sum(jnp.sum(jnp.asarray(l, jnp.float32)) for l in o)
    emit(tag="env_grid_lam0_pay18", t_ms=timeit(env_pay, pos, vel, v0,
                                                pay))

    # -- full scan step, marginal (chain 25 - chain 5), fused/unfused ---
    def scan_step(fused):
        if fused:
            os.environ.pop("GNT_NO_FUSED_POLICY", None)
        else:
            os.environ["GNT_NO_FUSED_POLICY"] = "1"
        init_fn, step_fn = env._chunked_pieces(
            net.causal_window, net, D, None, 0, step_mode=True,
            env_grid=True)
        os.environ.pop("GNT_NO_FUSED_POLICY", None)

        def chain(T):
            def f(params, pos, vel):
                def body(c, _):
                    carry, acc = c
                    carry, ys = step_fn(params, carry)
                    acc = acc + sum(
                        jnp.sum(jnp.asarray(l, jnp.float32))
                        for l in jax.tree_util.tree_leaves(ys))
                    return (carry, acc), None
                (carry, acc), _ = jax.lax.scan(
                    body, (init_fn(pos, vel)[0], jnp.float32(0)),
                    None, length=T)
                return acc + sum(jnp.sum(jnp.asarray(l, jnp.float32))
                                 for l in jax.tree_util.tree_leaves(carry))
            g = jax.jit(f)
            r = g(params, pos, vel)
            jax.block_until_ready(r)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                r = g(params, pos, vel)
                jax.block_until_ready(r)
                best = min(best, time.perf_counter() - t0)
            return best * 1e3
        t5, t25 = chain(5), chain(25)
        return (t25 - t5) / 20

    emit(tag="full_scan_step_fused", t_ms=scan_step(True))
    emit(tag="full_scan_step_unfused", t_ms=scan_step(False))
    emit(done=True)


if __name__ == "__main__":
    main()
