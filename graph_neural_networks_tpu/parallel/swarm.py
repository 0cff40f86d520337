"""Node-sharded large-swarm environment: closed-loop flocking across a
device mesh.

Each chip owns a block of agents. Per step, inside ONE ``shard_map``:
  * all-gather the swarm positions/velocities (O(N) floats over ICI),
  * compute the owned ROWS of the communication graph and the 6-feature
    states against the full swarm — O(Np·N) workspace per chip, never a
    global (N,N) anywhere,
  * top-D the rows into the row-sharded ELL table the node-sharded DB
    architectures (parallel.db.ShardedEllGso) consume directly,
  * normalize by lambda_max from a mesh-wide power iteration (all-gather
    + shard-local ELL contraction + psum norms), warm-started across
    physics steps.

Combined with ``sharded_swarm_rollout`` this scales the whole
decentralized-controller evaluation loop — environment AND model — over
the 'graph' mesh axis: the single-chip analogue is
``data.flocking._jnp_env_step_chunked`` / ``_scan_rollout(env_chunk=)``,
and the semantics match it exactly (parity-tested). Replaces at scale:
reference dataTools.py:2612-3020 + 3166-3340 (single-device numpy).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from graph_neural_networks_tpu.data.base import ZERO_TOL
from graph_neural_networks_tpu.ops import ell as ell_lib
from graph_neural_networks_tpu.parallel.db import ShardedEllGso

__all__ = ["sharded_env_step", "sharded_swarm_rollout", "pad_swarm"]


def pad_swarm(pos, vel, mesh: Mesh, axis: str = "graph",
              spacing: float = 1e3):
    """Pad (B,2,N) positions/velocities to a multiple of the mesh axis
    size. Pad agents are parked on a distant line with `spacing` between
    them (no edges to the swarm OR to each other — a clustered pad would
    form its own dense component and corrupt the lambda_max
    normalization) and zero velocity. Returns (pos_pad, vel_pad, n_orig)
    as device arrays laid out over the mesh."""
    pos, vel = np.asarray(pos), np.asarray(vel)
    B, _, N = pos.shape
    parts = mesh.shape[axis]
    n_pad = (-N) % parts
    if n_pad:
        far = np.abs(pos).max() + spacing
        px = far + spacing * np.arange(1, n_pad + 1)
        pp = np.stack([px, np.full(n_pad, far)])[None].repeat(B, 0)
        pos = np.concatenate([pos, pp], axis=-1)
        vel = np.concatenate([vel, np.zeros((B, 2, n_pad))], axis=-1)
    sh = NamedSharding(mesh, P(None, None, axis))
    return (jax.device_put(jnp.asarray(pos, jnp.float32), sh),
            jax.device_put(jnp.asarray(vel, jnp.float32), sh), N)


def sharded_env_step(pos, vel, comm_radius, d_max, mesh: Mesh,
                     axis: str = "graph", v_prev=None, lam_iters: int = 8,
                     env_chunk: Optional[int] = None, env_grid=None,
                     payload=None):
    """One env step on node-sharded (B,2,N_pad) pos/vel. Returns
    (idx (B,Np·P,D) row-sharded with global column ids, val_norm
    (B,Np·P,D) row-sharded, states (B,6,N_pad) node-sharded,
    v (B,N_pad) node-sharded) — matching data.flocking's
    ``_jnp_env_step_chunked`` exactly when d_max covers the max degree.
    env_chunk sub-chunks each chip's OWN rows (workspace O(B·chunk·N)
    per chip instead of O(B·Np·N) — the million-agent regime).

    env_grid (True or (table_size, cell_cap)): each chip builds the
    O(N) modular cell table from the all-gathered swarm (one N-key
    sort + scatter, replicated work ~ms) and runs the O(Np·k)
    cell-list window math on its OWN rows only
    (data.flocking._grid_rows) — the distributed form of
    ``_jnp_env_step_grid``.

    payload (B,N_pad,Pw) node-sharded: all-gathered alongside pos/vel
    (the same O(N) ICI pattern) and the step additionally returns its
    NORMALIZED graph shift (W/lambda) @ payload as node-sharded
    (B,N_pad,Pw) rows — the mesh form of the fused-policy register
    shift (data.flocking._jnp_env_step_grid payload). Grid mode folds
    it into the window pass; all-pairs mode computes it as a masked
    (chunk,N)x(N,Pw) matmul. Untruncated-mask semantics: equals the
    ELL shift whenever d_max covers the true max in-degree.

    d_max=0 (grid mode only): EVAL-SHAPED step — idx/val come back
    zero-width, the window kernel skips its rank/selection block, and
    lambda_max comes from the SHARDED WINDOW pass (v_prev rides the
    cell table; lam_iters=0 is the psum'd Rayleigh fold, each further
    iteration one candidate-window wv pass over the re-scattered
    eigenvector) instead of the ELL matvec (which would be empty).
    The mesh mirror of the single-chip return_graphs=False path.

    Returns (idx, val_norm, states, v[, shifted_payload], ok); ``ok``
    is False iff some cell overflowed cell_cap this step — or, with a
    payload and d_max > 0, iff some in-degree exceeded d_max (grid
    mode; all-pairs always True) — the same exactness contract as the
    single-chip step."""
    r2 = comm_radius ** 2
    n_pay = 0 if payload is None else int(payload.shape[-1])

    # check_vma=False: the grid path may run the fused Pallas window
    # kernel (ops.gridwin) inside the shard (CLAUDE.md: pallas-in-
    # shard_map needs it); the collectives below are explicit either way
    @partial(shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(None, None, axis), P(None, None, axis),
                       P(None, axis), P(None, axis, None)),
             out_specs=(P(None, axis, None), P(None, axis, None),
                        P(None, None, axis), P(None, axis),
                        P(None, axis, None), P()))
    def _step(pos_blk, vel_blk, v_blk, pay_blk):
        B, _, Np = pos_blk.shape
        pos_full = jax.lax.all_gather(pos_blk, axis, axis=2, tiled=True)
        vel_full = jax.lax.all_gather(vel_blk, axis, axis=2, tiled=True)
        if n_pay:
            pay_full = jax.lax.all_gather(pay_blk, axis, axis=1,
                                          tiled=True)      # B,N,Pw
        N = pos_full.shape[-1]
        lo0 = jax.lax.axis_index(axis) * Np
        cols = jnp.arange(N)
        from graph_neural_networks_tpu.data.flocking import _fit_chunk
        chunk = Np if env_chunk is None else _fit_chunk(Np, env_chunk)

        # d_max == 0 (grid only): EVAL-MODE step — no ELL graph is
        # emitted, the window kernel skips its rank/selection block,
        # and lambda comes from the WINDOW pass (v rides the table's
        # 7th feature block; the ELL matvec would be empty) — the mesh
        # form of the single-chip window-lambda fold (VERDICT r4 #5).
        win_lam = env_grid is not None and d_max == 0
        if env_grid is not None:
            from graph_neural_networks_tpu.data import flocking as F
            gts, gcc, gcf = F._parse_env_grid(env_grid)
            H, Gx, Gy, Cc = F._grid_geometry(N, gts, gcc, gcf)
            inv_s = 1.0 / (gcf * comm_radius)
            gchunk = _fit_chunk(Np, 8192)
            v_full0 = (jax.lax.all_gather(v_blk, axis, axis=1,
                                          tiled=True) if win_lam
                       else jnp.zeros((B, N), pos_blk.dtype))

            def one_grid(pf_b, vf_b, vfull_b, pay_b):
                cell_rows, cx, cy, ok_b, (order, vpos) = \
                    F._grid_build_table(
                        pf_b[0], pf_b[1], vf_b[0], vf_b[1],
                        inv_s, H, Gx, Gy, Cc,
                        v=vfull_b if win_lam else None,
                        pay=pay_b if n_pay else None)
                out = F._grid_rows_chunked(
                    pf_b[0], pf_b[1], vf_b[0], vf_b[1], cx, cy,
                    lo0, Np, gchunk, cell_rows, Gx, Gy, Cc, r2,
                    d_max, N, inv_s=inv_s, factor=gcf, n_pay=n_pay)
                if n_pay:
                    i_, v_, s_, wv_, wp_, cnt_ = out
                    if d_max > 0:
                        # fused-payload coverage: the shift sums the
                        # untruncated mask while the emitted ELL graph
                        # truncates to d_max — surface in-degree
                        # overflow like cell overflow (ADVICE r4)
                        ok_b = jnp.logical_and(
                            ok_b, jnp.max(cnt_) <= d_max)
                else:
                    (i_, v_, s_, wv_), wp_ = out, jnp.zeros(
                        (Np, 0), pf_b.dtype)
                return (i_, v_, s_, wv_, wp_, ok_b, cell_rows, order,
                        vpos, cx, cy)

            (idx, val01, states, wvb, wpay, oks, tbls, orders, vposs,
             cxs, cys) = jax.vmap(one_grid)(
                pos_full, vel_full, v_full0,
                pay_full if n_pay else jnp.zeros((B, N, 0),
                                                 pos_blk.dtype))
            # every chip built the same table from the gathered swarm;
            # psum-min makes the flag a legal replicated output
            ok = (jax.lax.psum(jnp.all(oks).astype(jnp.int32), axis)
                  == jax.lax.axis_size(axis))
        else:
            idx = val01 = states = wpay = None   # all-pairs path below
            ok = None

        def one(lo_local):
            pr = jax.lax.dynamic_slice(pos_blk, (0, 0, lo_local),
                                       (B, 2, chunk))
            vr = jax.lax.dynamic_slice(vel_blk, (0, 0, lo_local),
                                       (B, 2, chunk))
            rows = lo0 + lo_local + jnp.arange(chunk)
            dp = pr[..., :, None] - pos_full[:, :, None, :]  # B,2,c,N
            d2 = jnp.sum(dp ** 2, axis=1)                    # B,c,N
            m = ((d2 <= r2) & (jnp.exp(-d2) > ZERO_TOL)
                 & (cols[None, None, :] != rows[None, :, None]))
            mf = m.astype(pos_blk.dtype)
            from graph_neural_networks_tpu.data.flocking import _env_topk
            val01, idx = _env_topk(mf, d_max)                # B,c,D
            dv = vr[..., :, None] - vel_full[:, :, None, :]
            inv = jnp.where(d2 > ZERO_TOL, 1.0 / d2, 0.0) * mf
            inv = inv[:, None]
            mfe = mf[:, None]
            st = jnp.concatenate(
                [jnp.sum(dv * mfe, -1), jnp.sum(dp * inv ** 2, -1),
                 jnp.sum(dp * inv, -1)], axis=-2)            # B,6,c
            wp = (jnp.einsum("bcn,bnp->bcp", mf, pay_full) if n_pay
                  else jnp.zeros((B, chunk, 0), pos_blk.dtype))
            return idx.astype(jnp.int32), val01, st, wp

        if env_grid is not None:
            pass                          # computed above
        elif chunk == Np:
            idx, val01, states, wpay = one(0)
        else:
            idxs, vals, sts, wps = jax.lax.map(
                one, jnp.arange(Np // chunk) * chunk)
            idx = jnp.moveaxis(idxs, 0, 1).reshape(B, Np, d_max)
            val01 = jnp.moveaxis(vals, 0, 1).reshape(B, Np, d_max)
            states = jnp.moveaxis(sts, 0, 2).reshape(B, 6, Np)
            wpay = jnp.moveaxis(wps, 0, 1).reshape(B, Np, n_pay)

        if win_lam:
            from graph_neural_networks_tpu.data import flocking as F
            Wt = tbls.shape[-1]

            def wv_pass(vb):
                vf = jax.lax.all_gather(vb, axis, axis=1, tiled=True)

                def onep(cr, order, vpos, cx_b, cy_b, pf_b, vf_b,
                         vfull_b):
                    tbl = cr.reshape(-1).at[vpos].set(
                        jnp.take(vfull_b, order),
                        mode="drop").reshape(H, Wt)
                    return F._grid_rows_chunked(
                        pf_b[0], pf_b[1], vf_b[0], vf_b[1], cx_b, cy_b,
                        lo0, Np, gchunk, tbl, Gx, Gy, Cc, r2, 0, N,
                        inv_s=inv_s, factor=gcf, wv_only=True)

                return jax.vmap(onep)(tbls, orders, vposs, cxs, cys,
                                      pos_full, vel_full, vf)

            def nrm(w):
                n2 = jax.lax.psum(jnp.sum(w ** 2, axis=1), axis)
                return w / jnp.maximum(jnp.sqrt(n2), ZERO_TOL)[:, None]

            if lam_iters == 0:
                # zero-pass fold: Rayleigh quotient from the wv the
                # main window pass already computed; v still advances
                lam = (jax.lax.psum(
                    jnp.einsum("bn,bn->b", v_blk, wvb), axis)
                    / jnp.maximum(jax.lax.psum(
                        jnp.sum(v_blk ** 2, axis=1), axis), ZERO_TOL))
                vb = nrm(wvb)
            else:
                vb = nrm(wvb)
                vb = jax.lax.fori_loop(
                    0, lam_iters - 1, lambda i, v: nrm(wv_pass(v)), vb)
                lam = jax.lax.psum(
                    jnp.einsum("bn,bn->b", vb, wv_pass(vb)), axis)
            lam = jnp.where(jnp.abs(lam) < ZERO_TOL, 1.0, lam)
            return (idx, val01 / lam[:, None, None], states, vb,
                    wpay / lam[:, None, None], ok)

        ell_blk = ell_lib.EllGso(idx, val01[:, None])

        def mv(vb):                                            # (B,Np)
            vf = jax.lax.all_gather(vb, axis, axis=1, tiled=True)
            return ell_lib.ell_shift_rows(
                vf[..., None, None], ell_blk)[..., 0, 0]

        def body(_, vb):
            wb = mv(vb)
            nrm2 = jax.lax.psum(jnp.sum(wb ** 2, axis=1), axis)
            return wb / jnp.maximum(jnp.sqrt(nrm2), ZERO_TOL)[:, None]

        vb = jax.lax.fori_loop(0, lam_iters, body, v_blk)
        lam = jax.lax.psum(jnp.einsum("bn,bn->b", vb, mv(vb)), axis)
        lam = jnp.where(jnp.abs(lam) < ZERO_TOL, 1.0, lam)
        if ok is None:
            ok = jax.lax.psum(jnp.int32(1), axis) \
                == jax.lax.axis_size(axis)      # all-pairs: always exact
        return (idx, val01 / lam[:, None, None], states, vb,
                wpay / lam[:, None, None], ok)

    if v_prev is None:
        B, _, Npad = pos.shape
        v_prev = jnp.ones((B, Npad), pos.dtype) / jnp.sqrt(Npad)
    if payload is None:
        B, _, Npad = pos.shape
        payload = jnp.zeros((B, Npad, 0), pos.dtype)
    i_, v_, s_, vb, wp, ok = _step(pos, vel, v_prev, payload)
    if n_pay:
        return i_, v_, s_, vb, wp, ok
    return i_, v_, s_, vb, ok


def sharded_swarm_rollout(T: int, w: int, policy, comm_radius: float,
                          dt: float, accel_max: float, d_max: int,
                          mesh: Mesh, axis: str = "graph", n_orig=None,
                          lam_iters: int = 8,
                          env_chunk: Optional[int] = None,
                          env_grid=None, step_mode: bool = False,
                          return_cost: bool = False):
    """Build a jitted closed-loop rollout over the mesh: the mirror of
    ``Flocking._scan_rollout(env_chunk=...)`` with every array
    node-sharded and the graph windows as ShardedEllGso. policy:
    (params, x_hist (B,w,6,N_pad), ShardedEllGso) -> (B,w,2,N_pad);
    pad-agent accelerations are zeroed (pads never move), so results on
    the first n_orig agents match the single-chip rollout exactly.

    step_mode=True (requires a payload-capable DB architecture with one
    edge feature as ``policy``): the mesh form of the FUSED-POLICY
    rollout (data.flocking._chunked_pieces). The policy's per-step math
    (tap combine + readout) is purely per-node — it runs shard-local
    with ZERO communication — and its registers are shifted by the env
    step itself: the node-sharded payload is all-gathered alongside
    pos/vel (same O(N) ICI pattern the windowed policy's db_shift pays
    PER LAYER) and shifted by the untruncated in-range mask. No history
    windows, no separate register gather.

    Returns rollout(params, pos_pad, vel_pad) -> (pos, vel, accel,
    states, ShardedEllGso graph trajectory), all (B,T,...) node-sharded
    [+ the grid exactness flag].

    return_cost=True: the mesh form of ``Flocking.rollout_cost`` — the
    velocity-variance cost (pad agents masked out) accumulates in the
    scan carry and the rollout returns (cost_full, cost_end[, ok])
    scalars instead of trajectories: nothing O(T·N) is ever stacked,
    device-resident, or pulled — the million-agent multi-chip
    evaluation path."""
    if step_mode:
        assert (hasattr(policy, "rollout_step_shifted")
                and hasattr(policy, "rollout_payload")
                and getattr(policy, "E", None) == 1
                and getattr(policy, "payload_width", 0) > 0), \
            "step_mode needs a payload-capable DB architecture (E == 1)"

    # cost-mode fused rollouts never read the ELL graph (the policy's
    # registers shift via the window payload), so the env runs
    # EVAL-SHAPED: d_max=0 skips the kernel's rank/selection block and
    # lambda folds into the window pass (sharded window-lambda) — the
    # mesh mirror of the single-chip return_graphs=False path.
    # Velocities (hence costs) are exact vs the d_max>0 run whenever
    # d_max covered the true in-degree (the same contract).
    d_env = (0 if (return_cost and step_mode and env_grid is not None)
             else d_max)

    def env(pos, vel, v, payload=None):
        return sharded_env_step(pos, vel, comm_radius, d_env, mesh,
                                axis, v_prev=v, lam_iters=lam_iters,
                                env_chunk=env_chunk, env_grid=env_grid,
                                payload=payload)

    def rollout(params, init_pos, init_vel):
        B, _, Npad = init_pos.shape
        n_eff = Npad if n_orig is None else n_orig
        mask = (jnp.arange(Npad) < n_eff)
        mask = mask.astype(init_pos.dtype)[None, None]        # 1,1,Npad

        def stepcost(vel):                            # (B,2,Npad)->(B,)
            vbar = jnp.sum(vel * mask, axis=-1, keepdims=True) / n_eff
            d = (vel - vbar) * mask
            return jnp.sum(d * d, axis=(1, 2)) / n_eff

        def cost_scan(step, carry0):
            c0 = stepcost(init_vel)

            def body(cc, _):
                carry, acc, _last = cc
                carry, ys = step(carry, None)
                c = stepcost(ys[1])                   # vel_n
                return (carry, acc + c, c), None

            (carry, acc, last), _ = jax.lax.scan(
                body, (carry0, c0, c0), None, length=T - 1)
            return carry, jnp.mean(acc), jnp.mean(last)
        v0 = jnp.ones((B, Npad), init_pos.dtype) / jnp.sqrt(Npad)
        i0, s0, x0, v0, ok0 = sharded_env_step(
            init_pos, init_vel, comm_radius, d_env, mesh, axis,
            v_prev=v0, lam_iters=max(lam_iters, 32), env_chunk=env_chunk,
            env_grid=env_grid)
        if step_mode:
            # zero registers shift to zero: no payload pass at init
            pstate0 = policy.rollout_init(None, B, Npad)
            sh0 = jnp.zeros_like(
                policy.rollout_payload(pstate0).reshape(B, Npad, -1))

            def step(carry, _):
                pos_t, vel_t, x_t, sh_t, pstate, v, ok = carry
                pstate, y = policy.rollout_step_shifted(
                    params, pstate, x_t, sh_t)
                a = jnp.clip(y, -accel_max, accel_max) * mask
                vel_n = a * dt + vel_t
                pos_n = a * dt * dt / 2 + vel_t * dt + pos_t
                pay = policy.rollout_payload(pstate).reshape(B, Npad, -1)
                i_n, s_n, x_n, v, sh_n, ok_n = env(pos_n, vel_n, v,
                                                   payload=pay)
                return ((pos_n, vel_n, x_n, sh_n, pstate, v,
                         jnp.logical_and(ok, ok_n)),
                        (pos_n, vel_n, a, x_n, (i_n, s_n)))

            carry = (init_pos, init_vel, x0, sh0, pstate0, v0, ok0)
            if return_cost:
                carry, cf, ce = cost_scan(step, carry)
                out = (cf, ce)
                if env_grid is not None:
                    out = out + (carry[-1],)
                return out
            carry, (pos, vel, acc, xs, Ss) = jax.lax.scan(
                step, carry, None, length=T - 1)
            swap = lambda z: jnp.moveaxis(z, 0, 1)
            pos = jnp.concatenate([init_pos[:, None], swap(pos)], axis=1)
            vel = jnp.concatenate([init_vel[:, None], swap(vel)], axis=1)
            zero_a = jnp.zeros_like(acc[:1])
            accel = jnp.concatenate([swap(acc), swap(zero_a)], axis=1)
            states = jnp.concatenate([x0[:, None], swap(xs)], axis=1)
            gi = jnp.concatenate([i0[:, None], swap(Ss[0])], axis=1)
            gv = jnp.concatenate([s0[:, None], swap(Ss[1])], axis=1)
            graphs = ShardedEllGso(gi, gv[:, :, None], mesh, axis,
                                   n_orig=Npad)
            out = (pos, vel, accel, states, graphs)
            if env_grid is not None:
                out = out + (carry[-1],)   # exactness flag
            return out

        xw = jnp.zeros((B, w, 6, Npad), init_pos.dtype).at[:, -1].set(x0)
        iw = jnp.zeros((B, w, Npad, d_max), jnp.int32).at[:, -1].set(i0)
        vw = jnp.zeros((B, w, 1, Npad, d_max),
                       init_pos.dtype).at[:, -1].set(s0[:, None])

        def step(carry, _):
            pos_t, vel_t, xw, iw, vw, v, ok = carry
            S_hist = ShardedEllGso(iw, vw, mesh, axis, n_orig=Npad)
            y = policy(params, xw, S_hist)
            a = jnp.clip(y[:, -1], -accel_max, accel_max) * mask
            vel_n = a * dt + vel_t
            pos_n = a * dt * dt / 2 + vel_t * dt + pos_t
            i_n, s_n, x_n, v, ok_n = env(pos_n, vel_n, v)
            xw = jnp.concatenate([xw[:, 1:], x_n[:, None]], axis=1)
            iw = jnp.concatenate([iw[:, 1:], i_n[:, None]], axis=1)
            vw = jnp.concatenate([vw[:, 1:], s_n[:, None, None]], axis=1)
            return ((pos_n, vel_n, xw, iw, vw, v,
                     jnp.logical_and(ok, ok_n)),
                    (pos_n, vel_n, a, x_n, (i_n, s_n)))

        carry = (init_pos, init_vel, xw, iw, vw, v0, ok0)
        if return_cost:
            carry, cf, ce = cost_scan(step, carry)
            out = (cf, ce)
            if env_grid is not None:
                out = out + (carry[-1],)
            return out
        carry, (pos, vel, acc, xs, Ss) = jax.lax.scan(step, carry, None,
                                                      length=T - 1)
        swap = lambda z: jnp.moveaxis(z, 0, 1)
        pos = jnp.concatenate([init_pos[:, None], swap(pos)], axis=1)
        vel = jnp.concatenate([init_vel[:, None], swap(vel)], axis=1)
        zero_a = jnp.zeros_like(acc[:1])
        accel = jnp.concatenate([swap(acc), swap(zero_a)], axis=1)
        states = jnp.concatenate([x0[:, None], swap(xs)], axis=1)
        gi = jnp.concatenate([i0[:, None], swap(Ss[0])], axis=1)
        gv = jnp.concatenate([s0[:, None], swap(Ss[1])], axis=1)
        graphs = ShardedEllGso(gi, gv[:, :, None], mesh, axis,
                               n_orig=Npad)
        out = (pos, vel, accel, states, graphs)
        if env_grid is not None:
            out = out + (carry[-1],)   # exactness flag (grid env)
        return out

    return jax.jit(rollout)
