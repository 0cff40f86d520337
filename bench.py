"""Headline benchmark: LSIGF graph-convolution throughput on one chip,
with roofline (MFU) accounting.

Measures the K-tap LSIGF (the framework's hot kernel, SURVEY.md §2.2) on a
sparse graph two ways:
  * dense  -- the reference algorithm (dense N x N matmuls, what
    alegnn/utils/graphML.py:158-161 does on every shift), and
  * band   -- this framework's Pallas block-banded SpMM path.

Roofline accounting: the chip's achievable peak is MEASURED by a dense
MXU probe at the same dtype/precision as the kernel (not taken from a
datasheet), and roofline_pct = executed_flops/sec / peak. Executed flops
for the band kernel are the dense math on the stored band slab
(2*R*nb*(2w+1)*bs^2 per shift); the `edge_fraction` field reports how
much of that executed math is true graph edges — the honest split
between kernel efficiency (roofline_pct) and format efficiency
(edge_fraction), per VERDICT.md round-1 item 2.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"roofline_pct", ...}. Run with --sweep for the {N, density, bandwidth,
R} x {f32, bf16} x {band, bcsr} sweep (written to
experiments/bench_sweep.json).

vs_baseline definition history (keep round-over-round numbers
comparable): BENCH_r01 (4.19x) compared the K-shift chain end-to-end
including the final tap contraction on both paths; BENCH_r02 onward
(5.07x) compares the per-shift SpMM alone (dense matmul t / band kernel
t at equal f32 precision, same chip) — the tap contraction is identical
on both paths and only diluted the kernel comparison.

Measurement protocol note (r3, tightened r4): the axon tunnel's
BLOCKED dispatch round-trip varies (measured 1.5 ms in r1-r2, ~25 ms
in r3/r4); every timing queues `iters` dispatches and blocks once —
but that still leaves RT/iters per op, which at 24 ms RT inflated
r2/r3 band numbers by up to ~15 us/shift (the "bf16 at 60% of peak"
gap was mostly this). r5 artifact probe_bf16_deepchain.json: on
RT-proof 2048/4096-deep chains bf16 = 28.0 us/shift = 2.86 T edges/s
(~48% of the bf16 MXU peak — HBM-bound, as documented) and f32 =
103.5 us (82-84%); 512-deep chains are themselves shorter than the
RT and read low. r4: _bench,
measure_peak and measure_hbm_bw all measure the RT with a null
dispatch and subtract it.

Flagship metric (r4, VERDICT r3 item 7): the one JSON line also
carries `flagship_agent_steps_per_s` / `flagship_step_ms` — the
N=262144 closed-loop grid-env rollout (LocalGNN_DB policy in the
loop, lam_iters=2), measured as the MARGINAL scan step (chain T=25
minus T=5, over 20): round 3's "1.3x scan residual" turned out to be
the cold-start env (lam_iters=32) amortized into a 5-step average
(probe_gridwin_internals), so per-step numbers here exclude init by
construction. `vs_baseline` remains the band-kernel ratio (unchanged
definition since r2). Two flagship numbers are emitted:
`flagship_step_ms` is the train-shaped rollout (the scan also emits
the ELL graph trajectory DAGger consumes) and `flagship_eval_step_ms`
(return_graphs=False) is the eval-shaped one (zero-column graphs,
bit-identical trajectories); `flagship_agent_steps_per_s` is defined
on the eval-shaped step.
"""

import json
import sys
import time

import numpy as np


def _tunnel_rt():
    """Blocked dispatch round-trip through the axon tunnel (measured:
    1.5-25 ms depending on session). Every _bench batch pays it ONCE;
    subtracting it keeps per-op numbers comparable across sessions —
    r2/r3 numbers carried up to ~15 us/shift of it (r4 finding: the
    'bf16 at 60% of peak' gap was mostly this)."""
    if "rt" in _PEAK_CACHE:
        return _PEAK_CACHE["rt"]
    import jax.numpy as jnp
    z = jnp.ones((8, 8))
    float(jnp.sum(z))
    best = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        float(jnp.sum(z))
        best = min(best, time.perf_counter() - t0)
    _PEAK_CACHE["rt"] = best
    return best


def _bench(fn, iters=20, warmup=3):
    for _ in range(warmup):
        r = fn()
    r.block_until_ready()
    rt = _tunnel_rt()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    r.block_until_ready()
    return max(time.perf_counter() - t0 - rt, 1e-9) / iters


_PEAK_CACHE = {}


def measure_hbm_bw():
    """Achievable HBM copy bandwidth (bytes/s moved = read + write),
    measured with a 256 MB elementwise-scale kernel."""
    if "hbm" in _PEAK_CACHE:
        return _PEAK_CACHE["hbm"]
    import jax
    import jax.numpy as jnp
    n = 64 * (1 << 20)                       # 64M f32 = 256 MB
    x = jnp.ones((n,), jnp.float32)
    REPEAT = 20

    @jax.jit
    def f(z):
        return jax.lax.fori_loop(0, REPEAT, lambda i, z: z * 1.0000001, z)

    f(x).block_until_ready()
    rt = _tunnel_rt()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        f(x).block_until_ready()
        best = min(best, max(time.perf_counter() - t0 - rt, 1e-9) / REPEAT)
    _PEAK_CACHE["hbm"] = 2 * 4 * n / best    # read + write
    return _PEAK_CACHE["hbm"]


def measure_peak(dtype_name: str):
    """Achievable dense-matmul peak (FLOP/s) at a given dtype/precision,
    measured on this chip with a 4096^3 MXU probe."""
    if dtype_name in _PEAK_CACHE:
        return _PEAK_CACHE[dtype_name]
    import jax
    import jax.numpy as jnp
    dt, prec = {
        "f32": (jnp.float32, jax.lax.Precision.HIGHEST),
        "f32x": (jnp.float32, jax.lax.Precision.DEFAULT),
        "bf16": (jnp.bfloat16, jax.lax.Precision.DEFAULT),
    }[dtype_name]
    M, REPEAT = 4096, 40
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.random((M, M)), dt)
    B = jnp.asarray(rng.random((M, M)), dt)

    @jax.jit
    def f(z):
        return jax.lax.fori_loop(
            0, REPEAT,
            lambda i, z: jnp.dot(z, B, precision=prec,
                                 preferred_element_type=dt), z)

    f(A).block_until_ready()
    rt = _tunnel_rt()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        f(A).block_until_ready()
        best = min(best, max(time.perf_counter() - t0 - rt, 1e-9) / REPEAT)
    _PEAK_CACHE[dtype_name] = 2 * M ** 3 / best
    return _PEAK_CACHE[dtype_name]


def make_graph(N: int, density: float, bandwidth: int, seed: int = 0):
    """Banded sparse graph: the post-RCM structure parallel.partition
    produces for real-world graphs (edges concentrate near the diagonal)."""
    rng = np.random.default_rng(seed)
    S = np.zeros((N, N), np.float32)
    ii = rng.integers(0, N, size=int(density * N * N))
    jj = ii + rng.integers(-bandwidth, bandwidth + 1, size=len(ii))
    ok = (jj >= 0) & (jj < N)
    S[ii[ok], jj[ok]] = rng.random(ok.sum())
    return S, int((np.abs(S) > 0).sum())


def bench_config(N, R, density, bandwidth, dtype_name="f32", kernel="band",
                 K=5, repeat=20, check=True):
    """Time one LSIGF config; returns a result dict with roofline_pct."""
    import jax
    import jax.numpy as jnp
    from graph_neural_networks_tpu.ops import spmm

    dt, prec = {
        "f32": (jnp.float32, jax.lax.Precision.HIGHEST),
        "f32x": (jnp.float32, jax.lax.Precision.DEFAULT),
        "bf16": (jnp.bfloat16, jax.lax.Precision.DEFAULT),
    }[dtype_name]
    rng = np.random.default_rng(0)
    S, nnz = make_graph(N, density, bandwidth)
    x = jnp.asarray(rng.random((R, N)), dt)
    bs = 128
    n_shifts = K - 1

    if kernel == "band":
        s_band, w = spmm.dense_to_band(S, bs)
        sb = jnp.asarray(s_band, dt)
        nb = s_band.shape[0]
        ct = spmm.auto_col_tile(N, bs)
        flops_per_shift = 2 * R * nb * (2 * w + 1) * bs * bs

        @jax.jit
        def run(x):
            return jax.lax.fori_loop(
                0, repeat * n_shifts,
                lambda i, z: spmm.band_matmul(z, sb, n_cols=N, w=w,
                                              col_tile=ct,
                                              precision=prec), x)

        def once(xx):
            return spmm.band_matmul(xx, sb, n_cols=N, w=w, col_tile=ct,
                                    precision=prec)
        meta = {"w": w, "band_mem": s_band.size / (N * N), "col_tile": ct}
    elif kernel == "band_reg":
        # the fused K-tap register: what lsigf actually launches for
        # small row counts (one kernel for all K taps, signal in VMEM)
        s_band, w = spmm.dense_to_band(S, bs)
        sb = jnp.asarray(s_band, dt)
        nb = s_band.shape[0]
        flops_per_shift = 2 * R * nb * (2 * w + 1) * bs * bs

        @jax.jit
        def run(x):
            def body(i, z):
                return spmm.band_shift_register(
                    z, sb, n_taps=K, n_cols=N, w=w,
                    precision=prec)[K - 1]
            return jax.lax.fori_loop(0, repeat, body, x)

        def once(xx):
            return spmm.band_shift_register(xx, sb, n_taps=2, n_cols=N,
                                            w=w, precision=prec)[1]
        meta = {"w": w, "band_mem": s_band.size / (N * N)}
    elif kernel == "bcsr":
        blocks, brow, bcol = spmm.dense_to_bcsr(S, bs)
        blk = jnp.asarray(blocks, dt)
        browj = jnp.asarray(brow)
        bcolj = jnp.asarray(bcol)
        nnzb = blocks.shape[0]
        flops_per_shift = 2 * R * nnzb * bs * bs

        @jax.jit
        def run(x):
            return jax.lax.fori_loop(
                0, repeat * n_shifts,
                lambda i, z: spmm.bcsr_matmul(z, blk, browj, bcolj, n_cols=N,
                                              precision=prec), x)

        def once(xx):
            return spmm.bcsr_matmul(xx, blk, browj, bcolj, n_cols=N,
                                    precision=prec)
        meta = {"nnzb": nnzb, "bcsr_mem": blocks.size / (N * N)}
    else:
        raise ValueError(kernel)

    if check:
        d = np.asarray(x, np.float32) @ S
        b = np.asarray(once(x), np.float32)
        err = np.abs(d - b).max() / (np.abs(d).max() + 1e-9)
        tol = 3e-2 if dtype_name != "f32" else 1e-3
        assert err < tol, f"{kernel} mismatch: rel err {err}"

    t = _bench(lambda: run(x)) / repeat / n_shifts   # per shift
    peak = measure_peak(dtype_name)
    executed = flops_per_shift / t
    # minimal HBM traffic per shift (slab + x + y each touched once):
    # hbm_pct_min near 100 => bandwidth-bound at this dtype; << 100 =>
    # compute-bound (roofline_pct is then the binding number)
    itemsize = 2 if dtype_name == "bf16" else 4
    slab_elems = flops_per_shift / (2 * R)           # stored block math
    min_traffic = (slab_elems + 2 * R * N) * itemsize
    hbm_bw = measure_hbm_bw()
    return dict(
        kernel=kernel, dtype=dtype_name, N=N, R=R, density=density,
        bandwidth=bandwidth, nnz=nnz, t_shift_ms=t * 1e3,
        edges_per_s=R * nnz / t,
        executed_tflops=executed / 1e12,
        peak_tflops=peak / 1e12,
        roofline_pct=100.0 * executed / peak,
        hbm_gbps=hbm_bw / 1e9,
        hbm_pct_min=100.0 * (min_traffic / t) / hbm_bw,
        edge_fraction=nnz * 1.0 / (flops_per_shift / (2 * R)),
        **meta)


def bench_flagship(N=262144, D=32, t_short=5, t_long=25):
    """Marginal closed-loop step time of the flagship N=262144 grid-env
    rollout (policy + env + physics inside one lax.scan), in both
    trajectory modes:
      * train-shaped (return_graphs=True): the scan also emits the
        (T, N, D) ELL graph trajectory — what DAGger training consumes;
      * eval-shaped (return_graphs=False): zero-column graphs — the
        window kernel skips its rank/selection block and the scan skips
        the graph stacking; positions are bit-identical (exactness
        tested in tests/test_rollout_step.py).
    Returns (t_train_ms, t_eval_ms, agent_steps_per_s_eval)."""
    import jax
    import jax.numpy as jnp
    from graph_neural_networks_tpu.data import flocking as F
    from graph_neural_networks_tpu.models import architectures_time as archt
    env = F.Flocking.for_rollout(N, commRadius=2.0, repelDist=1.0,
                                 samplingTime=0.01,
                                 rng=np.random.default_rng(0))
    ip, iv = env.compute_initial_positions(
        N, 1, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
    pos = jnp.asarray(ip, jnp.float32)
    vel = jnp.asarray(iv, jnp.float32)
    net = archt.LocalGNN_DB(dimNodeSignals=[6, 32], nFilterTaps=[4],
                            bias=True, nonlinearity="tanh",
                            dimReadout=[2], dimEdgeFeatures=1)
    params = net.init(jax.random.PRNGKey(1), N=64, T=4)

    def marginal(return_graphs):
        # lam_iters=0 = the zero-pass Rayleigh fold, the recommended
        # large-swarm setting (5.7e-6 relative cost error vs a
        # converged 64-iteration reference, probe_lambda_fidelity.json)
        init_fn, step_fn = env._chunked_pieces(
            net.causal_window, net, D, None, 0, step_mode=True,
            env_grid=True, return_graphs=return_graphs)

        def chain(T):
            @jax.jit
            def f(params, pos, vel):
                carry, _ = init_fn(pos, vel)
                carry, ys = jax.lax.scan(
                    lambda c, _: step_fn(params, c), carry, None,
                    length=T)
                return sum(jnp.sum(jnp.asarray(l, jnp.float32))
                           for l in jax.tree_util.tree_leaves(
                               (carry, ys)))
            # barrier with a REAL scalar d2h, not block_until_ready:
            # some tunnel sessions stay fire-and-forget under
            # block_until_ready even after a prior d2h (observed
            # r5: both chains "completed" in ~us and the marginal
            # step read -0). The pull adds one RT per measurement,
            # which cancels in the T_long - T_short marginal.
            float(f(params, pos, vel))
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                r = f(params, pos, vel)
                float(r)
                best = min(best, time.perf_counter() - t0)
            return best * 1e3
        return (chain(t_long) - chain(t_short)) / (t_long - t_short)

    t_train_ms = marginal(True)
    t_eval_ms = marginal(False)
    return t_train_ms, t_eval_ms, N / (t_eval_ms / 1e3)


def bench_dense(N, R, dtype_name="f32", K=5, repeat=20):
    import jax
    import jax.numpy as jnp
    dt, prec = {
        "f32": (jnp.float32, jax.lax.Precision.HIGHEST),
        "f32x": (jnp.float32, jax.lax.Precision.DEFAULT),
        "bf16": (jnp.bfloat16, jax.lax.Precision.DEFAULT),
    }[dtype_name]
    rng = np.random.default_rng(0)
    S, _ = make_graph(N, 0.01, 256)
    Sd = jnp.asarray(S, dt)
    x = jnp.asarray(rng.random((R, N)), dt)

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(
            0, repeat * (K - 1),
            lambda i, z: jnp.dot(z, Sd, precision=prec), x)

    return _bench(lambda: run(x)) / repeat / (K - 1)


def main():
    # Watchdog: if the TPU pool is down, backend init/compiles HANG
    # indefinitely (observed multi-hour outages after a device fault).
    # Emit an honest error line and exit rather than hanging the caller.
    import os
    import threading

    def _give_up():
        print(json.dumps({
            "metric": "lsigf_band_spmm_edges_per_s", "value": 0,
            "unit": "ERROR: TPU backend unavailable for 45 min "
                    "(device-pool outage); see experiments/logs/"
                    "tpu_recovery.log", "vs_baseline": 0}), flush=True)
        os._exit(2)

    watchdog = threading.Timer(45 * 60, _give_up)
    watchdog.daemon = True
    watchdog.start()

    import jax
    # persistent compilation cache: the remote-compile tunnel makes fresh
    # compiles slow (~minutes); cached reruns take seconds
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_compilation_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    N = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 4096
    R, density, bandwidth = 512, 0.01, 256

    if "--sweep" in sys.argv:
        results = []
        base = dict(N=4096, R=512, density=0.01, bandwidth=256)
        configs = []
        for dt in ("f32", "bf16"):
            configs.append({**base, "dtype_name": dt, "kernel": "band"})
            configs.append({**base, "dtype_name": dt, "kernel": "bcsr"})
        configs.append({**base, "dtype_name": "f32", "kernel": "band_reg"})
        configs.append({**base, "R": 1024, "dtype_name": "f32",
                        "kernel": "band_reg"})
        configs.append({**base, "R": 1024, "dtype_name": "f32",
                        "kernel": "band"})
        for n in (1024, 16384):
            configs.append({**base, "N": n, "dtype_name": "f32",
                            "kernel": "band"})
        # small-N at production row counts: N=1024 is launch-cost bound
        # at R=512 (t_shift ~= 20us fixed + 43.6 ns/row, the marginal
        # row AT the f32 compute limit — measured r3) and reaches ~91%
        # once R amortizes the fixed cost
        configs.append({**base, "N": 1024, "R": 2048, "dtype_name": "f32",
                        "kernel": "band"})
        configs.append({**base, "N": 1024, "R": 4096, "dtype_name": "f32",
                        "kernel": "band"})
        for bw in (128, 512):
            configs.append({**base, "bandwidth": bw, "dtype_name": "f32",
                            "kernel": "band"})
        for r in (128, 2048):
            configs.append({**base, "R": r, "dtype_name": "f32",
                            "kernel": "band"})
        for cfg in configs:
            res = bench_config(**cfg)
            watchdog.cancel()     # chip alive; long sweeps are legitimate
            results.append(res)
            print(json.dumps(res), flush=True)
        import os
        os.makedirs("experiments", exist_ok=True)
        with open("experiments/bench_sweep.json", "w") as f:
            json.dump(results, f, indent=1)
        return

    # Headline = the path lsigf actually runs at R<=REGISTER_MAX_ROWS:
    # the fused K-tap register (one Pallas launch for all taps, signal
    # resident in VMEM between shifts).
    res = bench_config(N, R, density, bandwidth, "f32", "band_reg")
    watchdog.cancel()             # chip alive past the first config
    t_dense = bench_dense(N, R, "f32")
    speedup = t_dense / (res["t_shift_ms"] / 1e3)
    # production row count (R = batch*features >= 2048): lsigf routes to
    # the chained multi-column band kernel there, which saturates the MXU
    res_prod = bench_config(N, 2048, density, bandwidth, "f32", "band",
                            check=False)
    # flagship: N=262144 closed-loop grid-env rollout, marginal step
    try:
        flag_ms, flag_eval_ms, flag_aps = bench_flagship()
    except Exception as e:  # never lose the kernel headline to a flagship
        flag_ms, flag_eval_ms, flag_aps = -1.0, -1.0, -1.0
        print(json.dumps({"flagship_error": repr(e)[:200]}),
              file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "lsigf_band_spmm_edges_per_s",
        "value": res["edges_per_s"],
        "unit": f"edges/s (N={N}, nnz={res['nnz']}, R={R}, "
                f"band mem {res['band_mem']:.1%} of dense, "
                f"dense {t_dense*1e3:.2f}ms, band {res['t_shift_ms']:.2f}ms"
                f"/shift, {res['executed_tflops']:.1f} TF/s executed vs "
                f"{res['peak_tflops']:.1f} TF/s measured f32 peak; "
                f"R=2048: {res_prod['roofline_pct']:.0f}% of roofline; "
                f"flagship 262k closed-loop {flag_ms:.0f}ms/step)",
        "vs_baseline": speedup,
        "roofline_pct": round(res["roofline_pct"], 1),
        "roofline_pct_production": round(res_prod["roofline_pct"], 1),
        "edge_fraction": round(res["edge_fraction"], 4),
        "flagship_step_ms": round(flag_ms, 1),
        "flagship_eval_step_ms": round(flag_eval_ms, 1),
        "flagship_agent_steps_per_s": round(flag_aps, 0),
    }))


if __name__ == "__main__":
    main()
