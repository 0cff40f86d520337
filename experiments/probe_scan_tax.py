"""Bisect the ~270 ms/step scan tax at N=262144 (probe_gridwin_internals:
env-only scan 441 ms vs 170 ms env alone; policy-only scan 403 vs 135).

Scans with TRIVIAL bodies over the same carry/ys structure as the
rollout, dropping one element at a time:
  * full carry + full ys (pos, vel, a, x, (i, s))
  * full carry, no ys
  * no ELL arrays (i, s) anywhere
  * ys without the ELL trajectory
  * physics-only carry (pos, vel)
  * consume tax control: same ys summed outside scan

Writes experiments/probe_scan_tax.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
out_f = open(os.path.join(HERE, "probe_scan_tax.json"), "w", buffering=1)
REPEAT = 5


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def scan_time(fn, *args):
    g = jax.jit(fn)
    r = g(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = g(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best / REPEAT * 1e3


def main():
    emit(devices=str(jax.devices()), repeat=REPEAT)
    _ = float(jnp.sum(jnp.ones((8, 8))))
    N, D, B = 262144, 32, 1
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(size=(B, 2, N)), jnp.float32)
    vel = jnp.asarray(rng.normal(size=(B, 2, N)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, 6, N)), jnp.float32)
    i0 = jnp.asarray(rng.integers(0, N, (B, N, D)), jnp.int32)
    s0 = jnp.asarray(rng.random((B, N, D)), jnp.float32)
    v0 = jnp.ones((B, N), jnp.float32)
    reg = jnp.asarray(rng.normal(size=(B, 3, 6, N)), jnp.float32)

    def run(body, carry):
        def f(*c):
            cc, ys = jax.lax.scan(body, tuple(c), None, length=REPEAT)
            return sum(jnp.sum(jnp.asarray(l, jnp.float32))
                       for l in jax.tree_util.tree_leaves((cc, ys)))
        return scan_time(f, *carry)

    # trivial math touching every carry element once
    def stepm(pos, vel, x, i, s, reg, v):
        a = jnp.tanh(vel) * 0.01
        vel_n = vel + a
        pos_n = pos + vel_n * 0.01
        x_n = x * 0.999 + 0.001
        s_n = s * 0.999
        reg_n = reg * 0.999
        v_n = v * 0.999
        return pos_n, vel_n, x_n, i, s_n, reg_n, v_n, a

    def body_full(c, _):
        pos, vel, x, i, s, reg, v = c
        pos_n, vel_n, x_n, i_n, s_n, reg_n, v_n, a = stepm(*c)
        return ((pos_n, vel_n, x_n, i_n, s_n, reg_n, v_n),
                (pos_n, vel_n, a, x_n, (i_n, s_n)))
    emit(tag="trivial_full_carry_full_ys",
         t_ms=run(body_full, (pos, vel, x, i0, s0, reg, v0)))

    def body_noys(c, _):
        pos_n, vel_n, x_n, i_n, s_n, reg_n, v_n, a = stepm(*c)
        return ((pos_n, vel_n, x_n, i_n, s_n, reg_n, v_n), ())
    emit(tag="trivial_full_carry_no_ys",
         t_ms=run(body_noys, (pos, vel, x, i0, s0, reg, v0)))

    def body_no_ell_ys(c, _):
        pos_n, vel_n, x_n, i_n, s_n, reg_n, v_n, a = stepm(*c)
        return ((pos_n, vel_n, x_n, i_n, s_n, reg_n, v_n),
                (pos_n, vel_n, a, x_n))
    emit(tag="trivial_full_carry_ys_no_ell",
         t_ms=run(body_no_ell_ys, (pos, vel, x, i0, s0, reg, v0)))

    def body_phys(c, _):
        pos, vel = c
        a = jnp.tanh(vel) * 0.01
        vel_n = vel + a
        pos_n = pos + vel_n * 0.01
        return (pos_n, vel_n), (pos_n, vel_n, a)
    emit(tag="trivial_phys_only", t_ms=run(body_phys, (pos, vel)))

    # int32 ELL idx stored per step, alone
    def body_ell_only(c, _):
        i, s = c
        return (i, s * 0.999), (i, s)
    emit(tag="trivial_ell_only", t_ms=run(body_ell_only, (i0, s0)))

    # ELL with minor-dim 128 padding avoided: (B, D, N) layout instead
    iT = jnp.swapaxes(i0, 1, 2).copy()         # (B, D, N)
    sT = jnp.swapaxes(s0, 1, 2).copy()

    def body_ell_T(c, _):
        i, s = c
        return (i, s * 0.999), (i, s)
    emit(tag="trivial_ell_only_DN_layout",
         t_ms=run(body_ell_T, (iT, sT)))
    emit(done=True)


if __name__ == "__main__":
    main()
