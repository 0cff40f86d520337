"""Decompose the 91.9 ms env_v2_lam0 at N=262144 and the scan residual.

Pieces timed (queued-dispatch protocol):
  * table build alone (sort + scatter + pad)
  * h9 window ids + window-major gather alone
  * grid_window kernel alone on a prebuilt (9, chunk, 128) operand
    (full and wv_only variants), at several row_tiles
  * one wv (lambda matvec) pass: scatter + gather + wv kernel
  * scan variants to localize the full-step residual: env-only scan,
    policy-only scan, physics-only scan, full scan

Writes experiments/probe_gridwin_internals.json.
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
from graph_neural_networks_tpu.ops import gridwin

HERE = os.path.dirname(os.path.abspath(__file__))
out_f = open(os.path.join(HERE, "probe_gridwin_internals.json"), "w",
             buffering=1)
REPEAT = 5


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def timeit(fn, *args, jit=True):
    g = jax.jit(fn) if jit else fn
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
    r = 2.0
    r2 = r * r
    inv_r = 1.0 / r
    env = F.Flocking.for_rollout(N, commRadius=r, repelDist=1.0,
                                 samplingTime=0.01,
                                 rng=np.random.default_rng(0))
    ip, iv = env.compute_initial_positions(
        N, B, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
    pos = jnp.asarray(ip[0], jnp.float32)
    vel = jnp.asarray(iv[0], jnp.float32)
    px, py, vx, vy = pos[0], pos[1], vel[0], vel[1]
    v0 = jnp.ones((N,), jnp.float32) / np.sqrt(N)
    H, Gx, Gy, C = F._grid_geometry(N, None, 16)
    emit(tag="geometry", H=H, Gx=Gx, Gy=Gy, C=C)

    # 1. table build alone
    def build(px, py, vx, vy, v0):
        out = F._grid_build_table(px, py, vx, vy, inv_r, H, Gx, Gy, C,
                                  v=v0)
        return out[0], out[1], out[2]
    emit(tag="build_table", t_ms=timeit(build, px, py, vx, vy, v0))

    cell_rows, cx, cy, ok, (order, vpos) = jax.jit(
        lambda *a: F._grid_build_table(*a, inv_r, H, Gx, Gy, C, v=v0))(
        px, py, vx, vy)
    jax.block_until_ready(cell_rows)

    # 2. h9 + window-major gather alone (full N, no chunking)
    offs = jnp.array([(dx, dy) for dx in (-1, 0, 1)
                      for dy in (-1, 0, 1)], jnp.int32)

    def gather_only(cell_rows, cx, cy):
        h9 = F._grid_hash(cx[:, None] + offs[None, :, 0],
                          cy[:, None] + offs[None, :, 1], Gx, Gy)
        cand = jnp.take(cell_rows, jnp.swapaxes(h9, 0, 1).reshape(-1),
                        axis=0)
        return jnp.sum(cand[:, :1])
    emit(tag="h9_gather_fullN",
         t_ms=timeit(gather_only, cell_rows, cx, cy))

    # 3. kernel alone on a prebuilt operand (chunk = 65536)
    chunk = 65536
    h9c = F._grid_hash(cx[:chunk, None] + offs[None, :, 0],
                       cy[:chunk, None] + offs[None, :, 1], Gx, Gy)
    cand = jnp.take(cell_rows, jnp.swapaxes(h9c, 0, 1).reshape(-1),
                    axis=0).reshape(9, chunk, 128)
    keep = (jnp.argmax(h9c[:, :, None] == h9c[:, None, :], -1)
            == jnp.arange(9)[None, :])
    own = jnp.concatenate(
        [px[:chunk, None], py[:chunk, None], vx[:chunk, None],
         vy[:chunk, None],
         jnp.arange(chunk, dtype=jnp.float32)[:, None],
         keep.astype(jnp.float32),
         jnp.zeros((chunk, 114), jnp.float32)], axis=1)
    jax.block_until_ready((cand, own))
    scale = N / chunk
    for rt in (256, 512, 1024):
        t = timeit(lambda c, o: gridwin.grid_window(
            c, o, C=C, r2=r2, d_max=D, row_tile=rt), cand, own)
        emit(tag=f"kernel_full_rt{rt}", t_ms=t, t_scaled_to_N=t * scale)
    for rt in (512, 1024):
        t = timeit(lambda c, o: gridwin.grid_window(
            c, o, C=C, r2=r2, d_max=D, row_tile=rt, wv_only=True),
            cand, own)
        emit(tag=f"kernel_wv_rt{rt}", t_ms=t, t_scaled_to_N=t * scale)

    # 4. one full wv pass (scatter + gather + kernel) as in _jnp_env_step_grid
    flat = cell_rows.reshape(-1)

    def wv_pass(vb):
        tbl = flat.at[vpos].set(jnp.take(vb, order),
                                mode="drop").reshape(H, 128)
        return F._grid_rows_chunked(px, py, vx, vy, cx, cy, 0, N, chunk,
                                    tbl, Gx, Gy, C, r2, D, N,
                                    use_kernel=True, wv_only=True)
    emit(tag="wv_pass_full", t_ms=timeit(wv_pass, v0))

    def scatter_only(vb):
        return flat.at[vpos].set(jnp.take(vb, order),
                                 mode="drop").reshape(H, 128)[0, 0]
    emit(tag="wv_scatter_only", t_ms=timeit(scatter_only, v0))

    # 5. whole env step variants (all outputs consumed)
    posb, velb = pos[None], vel[None]
    v0b = v0[None]

    def consume(i, s, x, v, ok):
        return (jnp.sum(i.astype(jnp.float32)) + jnp.sum(s) + jnp.sum(x)
                + jnp.sum(v) + ok.astype(jnp.float32))

    def env_lam(iters):
        def f(p, v, vv):
            return consume(*F._jnp_env_step_grid(p, v, r, D, vv,
                                                 lam_iters=iters,
                                                 use_kernel=True))
        return f
    emit(tag="env_lam0", t_ms=timeit(env_lam(0), posb, velb, v0b))
    emit(tag="env_lam1", t_ms=timeit(env_lam(1), posb, velb, v0b))
    emit(tag="env_lam2", t_ms=timeit(env_lam(2), posb, velb, v0b))

    # 6. scan-residual localization
    net = archt.LocalGNN_DB(dimNodeSignals=[6, 32], nFilterTaps=[4],
                            bias=True, nonlinearity="tanh",
                            dimReadout=[2], dimEdgeFeatures=1)
    params = net.init(jax.random.PRNGKey(1), N=64, T=4)
    init_fn, step_fn = env._chunked_pieces(
        net.causal_window, net, D, None, 2, step_mode=True, env_grid=True)

    def scan_time(body_maker):
        def run(params, posb, velb):
            carry, _ = init_fn(posb, velb)
            body = body_maker(params)
            carry, ys = jax.lax.scan(body, carry, None, length=REPEAT)
            return sum(jnp.sum(jnp.asarray(l, jnp.float32))
                       for l in jax.tree_util.tree_leaves((carry, ys)))
        g = jax.jit(run)
        rr = g(params, posb, velb)
        jax.block_until_ready(rr)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            rr = g(params, posb, velb)
            jax.block_until_ready(rr)
            best = min(best, time.perf_counter() - t0)
        return best / REPEAT * 1e3

    # full step (env + policy + physics)
    emit(tag="scan_full",
         t_ms=scan_time(lambda params: (lambda c, _: step_fn(params, c))))

    # env-only scan: same carry, zero accel (policy skipped)
    def env_only_maker(params):
        def body(carry, _):
            *c, ok = carry
            pos_t, vel_t, x_t, i_t, s_t, pstate, v = c
            a = jnp.zeros_like(pos_t)
            vel_n = a * 0.01 + vel_t
            pos_n = a * 0.01 ** 2 / 2 + vel_t * 0.01 + pos_t
            i_n, s_n, x_n, v, ok_n = F._jnp_env_step_grid(
                pos_n, vel_n, r, D, v, lam_iters=2)
            return ((pos_n, vel_n, x_n, i_n, s_n, pstate, v,
                     jnp.logical_and(ok, ok_n)),
                    (pos_n, vel_n, a, x_n, (i_n, s_n)))
        return body
    emit(tag="scan_env_only", t_ms=scan_time(env_only_maker))

    # policy-only scan: env skipped, graph fixed from carry
    def policy_only_maker(params):
        def body(carry, _):
            *c, ok = carry
            pos_t, vel_t, x_t, i_t, s_t, pstate, v = c
            pstate, y = net.rollout_step(
                params, pstate, x_t, ell_lib.EllGso(i_t, s_t[:, None]))
            a = jnp.clip(y, -10.0, 10.0)
            vel_n = a * 0.01 + vel_t
            pos_n = a * 0.01 ** 2 / 2 + vel_t * 0.01 + pos_t
            x_n = x_t + jnp.mean(a)    # fake dependence, keeps shapes
            return ((pos_n, vel_n, x_n, i_t, s_t, pstate, v, ok),
                    (pos_n, vel_n, a, x_n, (i_t, s_t)))
        return body
    emit(tag="scan_policy_only", t_ms=scan_time(policy_only_maker))
    emit(done=True)


if __name__ == "__main__":
    main()
