"""Itemize the remaining cost of the EVAL-SHAPED 262k env step (the
round-5 flagship floor: full closed-loop eval step ~63-66 ms) — the
round-6 optimization map. Components, each timed RT-subtracted with
queued dispatches:

  build    fused table build (payload 18)
  gather   the 4-window candidate row gather (N x 4 rows at W=896)
  kernel   grid_window d_max=0 n_pay=18 on pre-gathered operands
  env      full _jnp_env_step_grid (d_max=0, lam fold, payload 18)
  policy   rollout_step_shifted (shard-local math only, fused mode)

Writes experiments/probe_eval_itemize_r5.json.
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
from graph_neural_networks_tpu.ops import gridwin
from graph_neural_networks_tpu.models import architectures_time as archt

HERE = os.path.dirname(os.path.abspath(__file__))
out_f = open(os.path.join(HERE, "probe_eval_itemize_r5.json"), "w",
             buffering=1)
REPEAT = 10


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def round_trip():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,))
    float(f(x)[0])
    jax.block_until_ready(f(x))
    best = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def timeit(fn, *args, rt=0.0):
    g = jax.jit(fn)
    r = g(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPEAT):
            r = g(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0 - rt)
    return max(best, 0.0) / REPEAT * 1e3


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    emit(devices=str(jax.devices()))
    rt = round_trip()
    emit(tag="rt_ms", t_ms=rt * 1e3)
    rng = np.random.default_rng(0)
    N = 4096 if smoke else 262144
    r = 2.0
    P = 18
    H, Gx, Gy, C = F._grid_geometry(N, None, 32, 2)
    side = 3.0 * np.sqrt(N)
    px = jnp.asarray(rng.uniform(0, side, N), jnp.float32)
    py = jnp.asarray(rng.uniform(0, side, N), jnp.float32)
    vx = jnp.asarray(rng.normal(size=N), jnp.float32)
    vy = jnp.asarray(rng.normal(size=N), jnp.float32)
    v0 = jnp.asarray(rng.normal(size=N), jnp.float32)
    pay = jnp.asarray(rng.normal(size=(N, P)), jnp.float32)
    inv_s = 1.0 / (2 * r)

    # build (payload 18)
    t_build = timeit(
        lambda *a: F._grid_build_table(*a, inv_s, H, Gx, Gy, C,
                                       v=v0, pay=pay,
                                       builder="fused")[0],
        px, py, vx, vy, rt=rt)
    cell_rows, cx, cy, ok, _ = jax.jit(
        lambda *a: F._grid_build_table(*a, inv_s, H, Gx, Gy, C, v=v0,
                                       pay=pay, builder="fused"))(
        px, py, vx, vy)
    W = cell_rows.shape[1]

    # candidate gather only (the window-major take the kernel consumes)
    offs = jnp.array([(dx, dy) for dx in (0, 1) for dy in (0, 1)],
                     jnp.int32)

    def cand_gather(cr, pxc, pyc):
        bx = jnp.floor(pxc * inv_s - 0.5).astype(jnp.int32)
        by = jnp.floor(pyc * inv_s - 0.5).astype(jnp.int32)
        wx = bx[:, None] + offs[None, :, 0]
        wy = by[:, None] + offs[None, :, 1]
        h9 = F._grid_hash(wx, wy, Gx, Gy)
        return jnp.take(cr, jnp.swapaxes(h9, 0, 1).reshape(-1),
                        axis=0).reshape(4, N, W)

    t_gather = timeit(cand_gather, cell_rows, px, py, rt=rt)
    cand = jax.jit(cand_gather)(cell_rows, px, py)
    own = jnp.concatenate(
        [px[:, None], py[:, None], vx[:, None], vy[:, None],
         jnp.arange(N, dtype=jnp.float32)[:, None],
         jnp.ones((N, 4), jnp.float32),
         jnp.zeros((N, 128 - 9), jnp.float32)], axis=1)

    # kernel only, eval shape (d_max=0) and train shape (d_max=64)
    rtile = F._fit_chunk(N, 256)
    t_kernel0 = timeit(
        lambda c, o: gridwin.grid_window(
            c, o, C=C, r2=r * r, d_max=0, n_pay=P, row_tile=rtile,
            interpret=True if smoke else None), cand, own, rt=rt)
    t_kernel64 = timeit(
        lambda c, o: gridwin.grid_window(
            c, o, C=C, r2=r * r, d_max=64, n_pay=P, row_tile=rtile,
            interpret=True if smoke else None), cand, own, rt=rt)

    # full env step, eval and train shapes
    pos = jnp.stack([px, py])[None]
    vel = jnp.stack([vx, vy])[None]
    t_env0 = timeit(
        lambda p, v, vv, pp: F._jnp_env_step_grid(
            p, v, r, 0, vv, lam_iters=0, cell_cap=C, cell_factor=2,
            payload=pp), pos, vel, v0[None], pay[None], rt=rt)
    t_env64 = timeit(
        lambda p, v, vv, pp: F._jnp_env_step_grid(
            p, v, r, 64, vv, lam_iters=0, cell_cap=C, cell_factor=2,
            payload=pp), pos, vel, v0[None], pay[None], rt=rt)

    # policy shard-local math (fused mode: combine + readout only)
    net = archt.LocalGNN_DB([6, 32], [4], True, "tanh", [2], 1)
    params = net.init(jax.random.PRNGKey(1), N=64, T=4)
    pstate = net.rollout_init(None, 1, N)
    x_t = jnp.asarray(rng.normal(size=(1, 6, N)), jnp.float32)
    sh_t = jnp.zeros((1, N, P), jnp.float32)
    t_policy = timeit(
        lambda s, x, sh: net.rollout_step_shifted(params, s, x, sh)[1],
        pstate, x_t, sh_t, rt=rt)

    emit(tag="itemize", N=N, P=P,
         build_ms=t_build, gather_ms=t_gather,
         kernel_eval_ms=t_kernel0, kernel_train_ms=t_kernel64,
         env_eval_ms=t_env0, env_train_ms=t_env64,
         policy_ms=t_policy,
         sum_eval_ms=t_build + t_gather + t_kernel0 + t_policy)
    emit(done=True)


if __name__ == "__main__":
    main()
