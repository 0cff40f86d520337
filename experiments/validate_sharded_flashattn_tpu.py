"""Single-chip TPU validation: the sharded band attention with the flash
shard-local kernels compiles and executes inside shard_map on a real TPU
(n_parts=1 mesh; zero-filled halo ppermutes; ext-layout pallas calls),
matches the dense attention, and its custom-VJP gradients match autodiff
through the dense path. Plus one timing of the sharded-flash apply."""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import scipy.sparse
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compilation_cache")

from graph_neural_networks_tpu import parallel as par
from graph_neural_networks_tpu.ops import filters, gso as gso_lib
from graph_neural_networks_tpu.parallel import attention as sha


def emit(**kw):
    print(json.dumps(kw), flush=True)


rng = np.random.default_rng(0)
N, k = 1024, 6
rows = np.repeat(np.arange(N), k)
cols = np.clip(rows + rng.integers(-100, 101, size=N * k), 0, N - 1)
A = scipy.sparse.coo_matrix((rng.random(N * k).astype(np.float32),
                             (rows, cols)), shape=(N, N)).tocsr()
A = ((A + A.T) * 0.5).tocoo()

mesh = par.make_mesh((1, 1))
part = par.partition_nodes(A, 1, order="none")
assert part.inner_bs == 128 and part.w >= 1
emit(step="partition", w=part.w, nbl=part.nbl, n_padded=part.n_padded)

sattn = sha.ShardedBandAttention(mesh, part, data_axis="data")
emit(step="flash_enabled", use_flash=sattn.use_flash,
     platform=jax.devices()[0].platform)
assert sattn.use_flash

B, P, F, G = 2, 2, 8, 4
x = rng.standard_normal((B, G, N)).astype(np.float32)
xp = jnp.asarray(part.pad_signal(x))
a = jnp.asarray(rng.standard_normal((P, 1, 2 * F)) * .3, jnp.float32)
W_p = jnp.asarray(rng.standard_normal((P, 1, F, G)) * .3, jnp.float32)
Sd = gso_lib.as_gso(np.asarray(part.S_csr[0].todense())[None])

with mesh:
    got = np.asarray(sha.sharded_graph_attention(xp, a, W_p, sattn))
want = np.asarray(filters.graph_attention(xp, a, W_p, Sd))
err = float(np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-30))
emit(step="fwd_parity", rel_err=err, ok=bool(err < 1e-3))

def loss_sharded(x, a, W):
    return jnp.sum(sha.sharded_graph_attention(x, a, W, sattn) ** 2)

def loss_dense(x, a, W):
    return jnp.sum(filters.graph_attention(x, a, W, Sd) ** 2)

with mesh:
    gs = jax.grad(loss_sharded, argnums=(0, 1, 2))(xp, a, W_p)
    jax.block_until_ready(gs)
# Both paths at DEFAULT matmul precision (what users run). On TPU, f32
# einsums default to bf16x3, so the tolerance is precision-noise-bound:
# measured da rel_err 5e-8 (identical surrounding einsums dominate),
# dx 2.6e-3 (flash accumulates true f32 where the dense coefficient
# einsums are bf16x3). Recomputing the dense side at HIGHEST makes all
# three diffs LARGER (dx 8e-3) — the residual is the shared projection
# einsums' bf16x3, not the kernels; exact-f32 parity is covered by the
# CPU interpret-mode tests (test_sharded_attention.py).
gd = jax.grad(loss_dense, argnums=(0, 1, 2))(xp, a, W_p)
for got_g, want_g, name in zip(gs, gd, ("x", "a", "W")):
    e = float(np.max(np.abs(np.asarray(got_g) - np.asarray(want_g)))
              / (np.max(np.abs(np.asarray(want_g))) + 1e-30))
    emit(step=f"grad_parity_{name}", rel_err=e, ok=bool(e < 5e-3))

# timing: jitted sharded-flash GAT apply at a production-ish size
N2, k2 = 16384, 8
rows2 = np.repeat(np.arange(N2), k2)
cols2 = np.clip(rows2 + rng.integers(-128, 129, size=N2 * k2), 0, N2 - 1)
A2 = scipy.sparse.coo_matrix((rng.random(N2 * k2).astype(np.float32),
                              (rows2, cols2)), shape=(N2, N2))
part2 = par.partition_nodes(A2, 1, order="none")
sattn2 = sha.ShardedBandAttention(mesh, part2, data_axis="data")
x2 = jnp.asarray(rng.standard_normal((8, G, part2.n_padded)), jnp.float32)

fn = jax.jit(lambda xx: sha.sharded_graph_attention(xx, a, W_p, sattn2))
with mesh:
    y = fn(x2); jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(10):
        y = fn(x2)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / 10
emit(step="timing_sharded_flash_gat", N=N2, B=8, P=P, F=F, w=part2.w,
     fwd_ms=round(dt * 1e3, 3))
print("DONE", flush=True)
