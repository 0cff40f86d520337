"""Fused cell-window math kernel for the grid swarm environment.

The grid env step gathers, per agent, 9 feature-blocked cell rows
(data.flocking._grid_rows). The pure-XLA formulation then pays a heavy
re-layout: per-feature slices of the (rows, 9, 6, C) candidate tensor
tile-pad up to 14x, and the explicit feature-major transpose still
costs ~60 ms of the ~120 ms window math at N=262k (round-3 probes; the
logical traffic is ~4 ms). This kernel fuses everything AFTER the
gather into one pass over the candidate block:

    input   packed (rows*9, 128): [cand 6C=96 | px py vx vy id | keep
                                   | pad] — ONE exactly-128-lane
                                   operand: the tpu custom call
                                   requires linear operand layouts and
                                   XLA's tiled->linear relayout runs
                                   through a ~18 MB scoped-vmem stack
                                   buffer PER OPERAND, which blew the
                                   16 MB scoped limit with three
                                   separately-padded operands
    output  out (rows*9, 2C+16): [mask | masked candidate id |
                                  6 partial state features | pad]

Everything is elementwise on (tile, C)-lane slices — no transposes, no
(rows, 9, 6, C) tensor ever exists. The cheap tail (9-window partial-
state reduction, rank-compare min-reduce over the 9C candidates) stays
in XLA where it measured ~5 ms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ZERO_TOL = 1e-9


def _make_kernel(C: int, r2: float):
    def kernel(in_ref, out_ref):
        cand = in_ref[:]
        base = 6 * C
        px, py = cand[:, base:base + 1], cand[:, base + 1:base + 2]
        vx, vy = cand[:, base + 2:base + 3], cand[:, base + 3:base + 4]
        oid = cand[:, base + 4:base + 5]
        keep = cand[:, base + 5:base + 6]
        cpx = cand[:, 0 * C:1 * C]
        cpy = cand[:, 1 * C:2 * C]
        cvx = cand[:, 2 * C:3 * C]
        cvy = cand[:, 3 * C:4 * C]
        valid = cand[:, 4 * C:5 * C] * keep
        cid = cand[:, 5 * C:6 * C]
        dpx = px - cpx
        dpy = py - cpy
        d2 = dpx * dpx + dpy * dpy
        m = ((valid > 0.0) & (d2 <= r2) & (jnp.exp(-d2) > ZERO_TOL)
             & (cid != oid))
        mf = m.astype(cand.dtype)
        inv = jnp.where(d2 > ZERO_TOL, 1.0 / d2, 0.0) * mf
        dvx = vx - cvx
        dvy = vy - cvy
        red = lambda z: jnp.sum(z, axis=1, keepdims=True)
        st = jnp.concatenate(
            [red(dvx * mf), red(dvy * mf),
             red(dpx * inv * inv), red(dpy * inv * inv),
             red(dpx * inv), red(dpy * inv),
             jnp.zeros_like(px), jnp.zeros_like(px)], axis=1)
        big = jnp.asarray(float(2 ** 24), cand.dtype)
        out_ref[:] = jnp.concatenate(
            [mf, jnp.where(m, cid, big), st,
             jnp.zeros((mf.shape[0], 8), cand.dtype)], axis=1)
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("C", "r2", "row_tile", "interpret"))
def grid_window_math(packed, *, C: int, r2: float,
                     row_tile: int = 2048, interpret: bool = False):
    """packed (A, 128) with A = rows*9 (see module docstring) ->
    (mcid (A, 2C) [mask | masked id, invalid -> 2^24], st (A, 8))."""
    A, W = packed.shape
    assert W == 128 and 6 * C + 6 <= 128, (W, C)
    rt = min(row_tile, A)
    assert A % rt == 0, (A, rt)
    grid = (A // rt,)
    out = pl.pallas_call(
        _make_kernel(C, r2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rt, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, 2 * C + 16), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A, 2 * C + 16), packed.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(packed)
    return out[:, :2 * C], out[:, 2 * C:2 * C + 8]
