"""On-chip Pallas compile-check harness (VERDICT r4 item 4).

COMPILES — not interprets — every production Pallas kernel entry point
at production-ish shapes on the real TPU, then executes each once.
Interpret-mode tests validate plumbing and math but cannot catch Mosaic
lowering failures (that is exactly how the round-4 gather build's
table_transpose shipped marked done while failing to compile on chip);
this script is the backstop. Run it every round before the snapshot:

    timeout 1200 python experiments/kernel_compile_check.py

Emits one JSON row per kernel entry to
experiments/kernel_compile_check.json; exit code 1 if any entry fails.
`--cpu` runs the same list in interpret mode (plumbing smoke only —
NOT a substitute for the on-chip run).

Covered entry points (the kernels production paths actually launch):
  band multi-column (ops.spmm.band_matmul via filters.lsigf, R=2048)
  band fused K-tap register (ops.spmm.band_register via lsigf, R=512)
  both with grads (the custom-VJP backward launches)
  BCSR v2 (ops.spmm.bcsr_matmul via lsigf mode='bcsr') + grads
  rectangular BCSR (ops.spmm.bcsr_shift_rect, the sharded shard-local
    contraction) + grads
  flash banded attention stats/apply (fwd) + bwd kernels
    (ops.attention_flash.graph_attention_band_flash)
  grid window kernel (ops.gridwin.grid_window): full selection,
    wv_only, fused payload (n_pay=18), eval mode (d_max=0)
  table_transpose (ops.gridwin, the gather-build relayout): F=7 and
    F=25 (payload) variants
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
CPU = "--cpu" in sys.argv

import jax

if CPU:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def _band_setup(N, R, bw, seed=0):
    from graph_neural_networks_tpu.ops import gso as gso_lib
    rng = np.random.default_rng(seed)
    S = np.zeros((N, N), np.float32)
    ii = rng.integers(0, N, size=int(0.01 * N * N))
    jj = ii + rng.integers(-bw, bw + 1, size=len(ii))
    ok = (jj >= 0) & (jj < N)
    S[ii[ok], jj[ok]] = rng.random(ok.sum())
    return S, rng


def checks():
    """Yield (name, fn, args): fn jittable, args device-ready."""
    from graph_neural_networks_tpu.ops import (attention_flash as af,
                                               filters, gridwin,
                                               gso as gso_lib, spmm)

    # -- band kernels through the production router (filters.lsigf) ----
    N, bw = 4096, 256
    S, rng = _band_setup(N, 512, bw)
    g_band = gso_lib.as_gso(S[None], mode="band")
    # h (F,E,K,G), x (B,G,N): B*G is the kernel row count R — 512 rows
    # routes lsigf to the fused register kernel, 2048 to multi-column
    h = jnp.asarray(rng.standard_normal((2, 1, 5, 2)) * 0.3, jnp.float32)
    x_reg = jnp.asarray(rng.standard_normal((256, 2, N)), jnp.float32)
    x_big = jnp.asarray(rng.standard_normal((1024, 2, N)), jnp.float32)

    def lsigf_fwd(h, x):
        return filters.lsigf(h, g_band, x)

    def lsigf_loss(h, x):
        return jnp.sum(filters.lsigf(h, g_band, x) ** 2)

    yield ("band_register_fwd(R=512)", lsigf_fwd, (h, x_reg))
    yield ("band_register_grad(R=512)",
           jax.grad(lsigf_loss, argnums=(0, 1)), (h, x_reg))
    yield ("band_multicol_fwd(R=2048)", lsigf_fwd, (h, x_big))
    yield ("band_multicol_grad(R=2048)",
           jax.grad(lsigf_loss, argnums=(0, 1)), (h, x_big))

    # -- BCSR v2 through the router ------------------------------------
    g_bcsr = gso_lib.as_gso(S[None], mode="bcsr")

    def bcsr_fwd(h, x):
        return filters.lsigf(h, g_bcsr, x)

    def bcsr_loss(h, x):
        return jnp.sum(filters.lsigf(h, g_bcsr, x) ** 2)

    yield ("bcsr_fwd", bcsr_fwd, (h, x_reg))
    yield ("bcsr_grad", jax.grad(bcsr_loss, argnums=(0, 1)), (h, x_reg))

    # -- rectangular BCSR (sharded shard-local contraction): keep the
    # square layout's blocks whose OUTPUT column falls in the first
    # 1024 cols -> an (N-in x 1024-out) rectangular slice
    blocks, brow, bcol = spmm.dense_to_bcsr(S, 128)
    keep = bcol < 1024 // 128
    blocks, brow, bcol = blocks[keep], brow[keep], bcol[keep]
    blocks_t, brow_t, bcol_t = spmm.bcsr_transpose(blocks, brow, bcol)
    xb = jnp.asarray(rng.standard_normal((512, N)), jnp.float32)
    args_r = (jnp.asarray(blocks), jnp.asarray(brow), jnp.asarray(bcol),
              jnp.asarray(blocks_t), jnp.asarray(brow_t),
              jnp.asarray(bcol_t))

    def rect_fwd(x):
        return spmm.bcsr_shift_rect(x, *args_r, 1024, N)

    def rect_loss(x):
        return jnp.sum(spmm.bcsr_shift_rect(x, *args_r, 1024, N) ** 2)

    yield ("bcsr_rect_fwd", rect_fwd, (xb,))
    yield ("bcsr_rect_grad", jax.grad(rect_loss), (xb,))

    # -- flash banded attention (stats + apply fwd; bwd kernel in grad)
    Na, bwa = 2048, 256
    Sa, rnga = _band_setup(Na, 0, bwa, seed=1)
    ga = gso_lib.as_gso(Sa[None], mode="band")
    slab5 = filters._slab5(ga)
    xa = jnp.asarray(rnga.standard_normal((4, 8, Na)), jnp.float32)
    aa = jnp.asarray(rnga.standard_normal((2, 1, 2 * 16)) * .3,
                     jnp.float32)
    Wp = jnp.asarray(rnga.standard_normal((2, 1, 16, 8)) * .3,
                     jnp.float32)

    def flash_fwd(x, a, W):
        return af.graph_attention_band_flash(x, a, W, slab5, ga.band_w)

    def flash_loss(x, a, W):
        return jnp.sum(flash_fwd(x, a, W) ** 2)

    yield ("flash_attn_fwd", flash_fwd, (xa, aa, Wp))
    yield ("flash_attn_grad", jax.grad(flash_loss, argnums=(0, 1, 2)),
           (xa, aa, Wp))

    # -- grid window kernel (quad scheme shapes, production row tiles) -
    rows, C, n_win = 16384, 32, 4
    rngg = np.random.default_rng(2)

    def gw_args(P):
        W = -(-(7 + P) * C // 128) * 128
        cand = jnp.asarray(rngg.standard_normal((n_win, rows, W)),
                           jnp.float32)
        own = jnp.asarray(rngg.standard_normal((rows, 128)), jnp.float32)
        return cand, own

    cand0, own0 = gw_args(0)
    interp = True if CPU else None
    yield ("grid_window_full(d_max=64)",
           lambda c, o: gridwin.grid_window(
               c, o, C=C, r2=4.0, d_max=64, interpret=interp),
           (cand0, own0))
    yield ("grid_window_wv_only",
           lambda c, o: gridwin.grid_window(
               c, o, C=C, r2=4.0, d_max=64, wv_only=True,
               interpret=interp),
           (cand0, own0))
    cand18, own18 = gw_args(18)
    yield ("grid_window_payload(n_pay=18)",
           lambda c, o: gridwin.grid_window(
               c, o, C=C, r2=4.0, d_max=64, n_pay=18, row_tile=256,
               interpret=interp),
           (cand18, own18))
    yield ("grid_window_eval(d_max=0,n_pay=18)",
           lambda c, o: gridwin.grid_window(
               c, o, C=C, r2=4.0, d_max=0, n_pay=18, row_tile=256,
               interpret=interp),
           (cand18, own18))

    # -- table_transpose (gather-build relayout) -----------------------
    H = 8192
    for F_n in (7, 25):
        mm = jnp.asarray(rngg.standard_normal((H * C, 128)), jnp.float32)
        yield (f"table_transpose(F={F_n})",
               lambda m, F_n=F_n: gridwin.table_transpose(
                   m, C=C, F=F_n, interpret=interp),
               (mm,))

    # -- table_build (fused scatter-free build) ------------------------
    Nb2 = 65536
    pr = gridwin.table_build_pad_rows(C)
    for F_n in (7, 25):
        fs = jnp.asarray(
            np.concatenate([rngg.standard_normal((Nb2, 128)),
                            np.zeros((pr, 128))]), jnp.float32)
        bounds = np.sort(rngg.integers(0, Nb2, H - 1))
        starts = jnp.asarray(
            np.concatenate([[0], bounds, [Nb2]]).astype(np.int32))
        yield (f"table_build(F={F_n})",
               lambda f_, s_, F_n=F_n: gridwin.table_build(
                   f_, s_, C=C, F=F_n, interpret=interp),
               (fs, starts))


def main():
    import contextlib
    rows = []
    n_fail = 0
    print(json.dumps({"devices": str(jax.devices()),
                      "mode": "interpret-smoke" if CPU else "compile"}),
          flush=True)
    if CPU:   # spmm/flash kernels have no CPU lowering: interpret them
        from jax.experimental.pallas import tpu as pltpu
        ctx = pltpu.force_tpu_interpret_mode()
    else:
        ctx = contextlib.nullcontext()
    with ctx:
        run_all(rows)
    n_fail = sum(not r["ok"] for r in rows)
    summary = {"total": len(rows), "failed": n_fail,
               "all_ok": n_fail == 0,
               "backend": jax.default_backend(),
               "date": time.strftime("%Y-%m-%d")}
    print(json.dumps(summary), flush=True)
    if not CPU:
        with open(os.path.join(HERE, "kernel_compile_check.json"),
                  "w") as f:
            json.dump({"summary": summary, "rows": rows}, f, indent=1)
    sys.exit(1 if n_fail else 0)


def run_all(rows):
    for name, fn, args in checks():
        row = {"kernel": name}
        t0 = time.perf_counter()
        try:
            jfn = jax.jit(fn)
            compiled = jfn.lower(*args).compile()
            row["compile_s"] = round(time.perf_counter() - t0, 2)
            t1 = time.perf_counter()
            out = compiled(*args)
            jax.block_until_ready(out)
            row["run_s"] = round(time.perf_counter() - t1, 3)
            leaves = jax.tree_util.tree_leaves(out)
            row["finite"] = all(
                bool(jnp.all(jnp.isfinite(l))) for l in leaves
                if jnp.issubdtype(l.dtype, jnp.floating))
            row["ok"] = bool(row["finite"])
        except Exception as e:
            row["ok"] = False
            row["error"] = "".join(
                traceback.format_exception_only(type(e), e))[-800:]
        print(json.dumps(row), flush=True)
        rows.append(row)


if __name__ == "__main__":
    main()
