"""Banded attention at N=16384: the dense path's alpha tensor would be
B*P*E*N^2 f32 = 16 GiB (impossible on one v5e); the band path runs it."""
import json, time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from graph_neural_networks_tpu.ops import filters, gso as gso_lib

_ = float(jnp.sum(jnp.ones((8, 8))))  # force tunnel sync mode before timing
rng = np.random.default_rng(0)
N, bw = 16384, 256
S = np.zeros((N, N), np.float32)
ii = rng.integers(0, N, size=int(0.002 * N * N))
jj = ii + rng.integers(-bw, bw + 1, size=len(ii))
ok = (jj >= 0) & (jj < N)
S[ii[ok], jj[ok]] = rng.random(ok.sum())
nnz = int((S != 0).sum())
B, G, F, P = 4, 16, 16, 2
x = jnp.asarray(rng.random((B, G, N)), jnp.float32)
a = jnp.asarray(rng.standard_normal((P, 1, 2 * F)) * .3, jnp.float32)
W = jnp.asarray(rng.standard_normal((P, 1, F, G)) * .3, jnp.float32)
g = gso_lib.as_gso(S, mode="band", keep_dense=False)
f = jax.jit(lambda x: filters.graph_attention(x, a, W, g))
y = f(x); jax.block_until_ready(y)
t0 = time.perf_counter()
for _ in range(5):
    y = f(x)
jax.block_until_ready(y)
t = (time.perf_counter() - t0) / 5
alpha_gib = B * P * 1 * N * N * 4 / 2**30
print(json.dumps({
    "metric": "band_attention_n16384_ms", "value": t * 1e3,
    "unit": f"ms/layer (N={N}, nnz={nnz}, B={B}, heads={P}, "
            f"dense alpha would be {alpha_gib:.0f} GiB)",
}), flush=True)
with open("experiments/bench_attn_16k.json", "w") as fh:
    json.dump({"t_ms": t * 1e3, "N": N, "nnz": nnz,
               "dense_alpha_gib": alpha_gib}, fh, indent=1)
