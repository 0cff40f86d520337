"""Single-chip TPU validation: the ring shift with the Pallas shard-local
contraction compiles and executes inside shard_map on a real TPU
(n_parts=1 mesh; zero-filled halo ppermutes), and matches scipy."""
import sys, os, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import scipy.sparse
import jax, jax.numpy as jnp
from graph_neural_networks_tpu import parallel as par

rng = np.random.default_rng(0)
N, k = 4096, 4
rows = np.repeat(np.arange(N), k)
cols = np.clip(rows + rng.integers(-200, 201, size=N * k), 0, N - 1)
A = scipy.sparse.coo_matrix((rng.random(N * k).astype(np.float32),
                             (rows, cols)), shape=(N, N))
mesh = par.make_mesh((1, 1))
part = par.partition_nodes(A, 1, order="none")
assert part.inner_bs == 128 and part.w >= 1
sgso = par.ShardedGso(mesh, part)
x = jnp.asarray(rng.random((2, 1, 1, part.n_padded)), jnp.float32)
with mesh:
    y, vjp = jax.vjp(sgso.shift, x)
    (dx,) = vjp(y)
    jax.block_until_ready((y, dx))
S = scipy.sparse.csr_matrix(part.S_csr[0])
want = (S.T @ np.asarray(x)[0, 0, 0])
np.testing.assert_allclose(np.asarray(y)[0, 0, 0], want, atol=1e-3,
                           rtol=1e-3)
want_dx = S @ np.asarray(y)[0, 0, 0]
np.testing.assert_allclose(np.asarray(dx)[0, 0, 0], want_dx, atol=1e-3,
                           rtol=1e-3)
print(json.dumps({"sharded_pallas_tpu": "ok", "N": N, "w": part.w,
                  "platform": jax.devices()[0].platform}))
