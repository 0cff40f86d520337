"""Round-2 TPU extras, bundled into one process (remote compiles are not
disk-cached, so batch everything): row-tile tuning for the band kernel,
banded vs dense attention timing, and the flocking scan-rollout speedup.
"""
import json, time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

def bench(fn, iters=20, warmup=3):
    for _ in range(warmup):
        r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters

out = {}

# --- 1. band kernel row-tile sweep (R=512 f32, headline config) ---------
from graph_neural_networks_tpu.ops import spmm
rng = np.random.default_rng(0)
N, R, bw = 4096, 512, 256
S = np.zeros((N, N), np.float32)
ii = rng.integers(0, N, size=int(0.01 * N * N))
jj = ii + rng.integers(-bw, bw + 1, size=len(ii))
ok = (jj >= 0) & (jj < N)
S[ii[ok], jj[ok]] = rng.random(ok.sum())
s_band, w = spmm.dense_to_band(S, 128)
sb = jnp.asarray(s_band)
x = jnp.asarray(rng.random((R, N)), jnp.float32)
REP = 40
for rt in (128, 256, 512):
    @jax.jit
    def run(x, rt=rt):
        return jax.lax.fori_loop(0, REP, lambda i, z: spmm.band_matmul(
            z, sb, n_cols=N, w=w, row_tile=rt), x)
    t = bench(lambda: run(x)) / REP
    out[f"band_rt{rt}_ms"] = t * 1e3
    print(f"row_tile={rt}: {t*1e3:.3f} ms/shift", flush=True)

# --- 2. banded vs dense attention (N=2048 to keep dense feasible) -------
from graph_neural_networks_tpu.ops import filters, gso as gso_lib
from graph_neural_networks_tpu.ops import attention_band as ab
N2 = 2048
S2 = np.zeros((N2, N2), np.float32)
ii = rng.integers(0, N2, size=int(0.01 * N2 * N2))
jj = ii + rng.integers(-bw, bw + 1, size=len(ii))
ok = (jj >= 0) & (jj < N2)
S2[ii[ok], jj[ok]] = rng.random(ok.sum())
B, G, F, P = 8, 16, 16, 2
xa = jnp.asarray(rng.random((B, G, N2)), jnp.float32)
a = jnp.asarray(rng.standard_normal((P, 1, 2 * F)) * .3, jnp.float32)
Wp = jnp.asarray(rng.standard_normal((P, 1, F, G)) * .3, jnp.float32)
g_dense = gso_lib.as_gso(S2)
g_band = gso_lib.as_gso(S2, mode="band")
f_d = jax.jit(lambda x: filters.graph_attention(x, a, Wp, g_dense))
f_b = jax.jit(lambda x: filters.graph_attention(x, a, Wp, g_band))
np.testing.assert_allclose(np.asarray(f_b(xa)), np.asarray(f_d(xa)),
                           atol=2e-3, rtol=2e-3)
t_d = bench(lambda: f_d(xa), iters=10)
t_b = bench(lambda: f_b(xa), iters=10)
out["attn_dense_ms"] = t_d * 1e3
out["attn_band_ms"] = t_b * 1e3
print(f"attention N={N2}: dense {t_d*1e3:.2f} ms, band {t_b*1e3:.2f} ms, "
      f"speedup {t_d/t_b:.2f}x", flush=True)

# --- 3. flocking scan rollout on TPU ------------------------------------
from graph_neural_networks_tpu.data.flocking import Flocking
from graph_neural_networks_tpu.models import architectures_time as archt
data = Flocking(nAgents=50, commRadius=2.0, repelDist=1.0, nTrain=4,
                nValid=2, nTest=8, duration=2.0, samplingTime=0.01,
                rng=np.random.default_rng(3))
arch = archt.LocalGNN_DB([6, 32], [3], True, "tanh", [2], 1)
params = arch.init(jax.random.PRNGKey(0), N=50, T=3)
wnd = arch.causal_window
pol = lambda p, xh, Sh: arch.apply(p, jnp.asarray(xh, jnp.float32),
                                   jnp.asarray(Sh, jnp.float32))
ip = data.getData("initPos", "test"); iv = data.getData("initVel", "test")
t0 = time.perf_counter()
data.compute_trajectory(ip, iv, data.duration, archit=pol, params=params,
                        history_window=wnd, jit=True)
out["rollout_scan_compile_s"] = time.perf_counter() - t0
t0 = time.perf_counter()
data.compute_trajectory(ip, iv, data.duration, archit=pol, params=params,
                        history_window=wnd, jit=True)
out["rollout_scan_s"] = time.perf_counter() - t0
t0 = time.perf_counter()
data.compute_trajectory(ip, iv, data.duration, archit=pol, params=params,
                        history_window=wnd, jit=False)
out["rollout_host_s"] = time.perf_counter() - t0
print(f"flocking rollout T=200 B=8: scan {out['rollout_scan_s']:.2f}s, "
      f"host loop {out['rollout_host_s']:.2f}s, "
      f"speedup {out['rollout_host_s']/out['rollout_scan_s']:.1f}x",
      flush=True)

with open("experiments/bench_r2_extras.json", "w") as fh:
    json.dump(out, fh, indent=1)
print("saved experiments/bench_r2_extras.json", flush=True)
