import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from graph_neural_networks_tpu.data import flocking as F
float(jnp.zeros(8).sum())
def rt_():
    f = jax.jit(lambda x: x + 1.0); x = jnp.zeros((8,))
    float(f(x)[0]); best = 1e9
    for _ in range(10):
        t0 = time.perf_counter(); jax.block_until_ready(f(x)); best = min(best, time.perf_counter()-t0)
    return best
def timeit(fn, *a, rt=0.0):
    g = jax.jit(fn); r = g(*a); jax.block_until_ready(r); best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10): r = g(*a)
        jax.block_until_ready(r); best = min(best, time.perf_counter()-t0-rt)
    return max(best,0)/10*1e3
rng = np.random.default_rng(0)
N = 262144; r = 2.0; P = 18
H, Gx, Gy, C = F._grid_geometry(N, None, 32, 2)
side = 3.0*np.sqrt(N)
px = jnp.asarray(rng.uniform(0, side, N), jnp.float32)
py = jnp.asarray(rng.uniform(0, side, N), jnp.float32)
W = -(-(7+P)*C//128)*128
cell_rows = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
inv_s = 1.0/(2*r)
offs = jnp.array([(dx,dy) for dx in (0,1) for dy in (0,1)], jnp.int32)
def h9_of(pxc, pyc):
    bx = jnp.floor(pxc*inv_s - 0.5).astype(jnp.int32)
    by = jnp.floor(pyc*inv_s - 0.5).astype(jnp.int32)
    return F._grid_hash(bx[:,None]+offs[None,:,0], by[:,None]+offs[None,:,1], Gx, Gy)
rt = rt_()
print("rt_ms", rt*1e3)
h9 = jax.jit(h9_of)(px, py)
# current: window-major single take
t_cur = timeit(lambda cr, h: jnp.take(cr, jnp.swapaxes(h,0,1).reshape(-1), axis=0).reshape(4, N, W), cell_rows, h9, rt=rt)
# 4 separate takes
t_4 = timeit(lambda cr, h: tuple(jnp.take(cr, h[:, w], axis=0) for w in range(4)), cell_rows, h9, rt=rt)
# single take, agent-major
t_am = timeit(lambda cr, h: jnp.take(cr, h.reshape(-1), axis=0), cell_rows, h9, rt=rt)
# narrow table (env-only width 256) for reference
cr256 = cell_rows[:, :256]
t_n = timeit(lambda cr, h: jnp.take(cr, jnp.swapaxes(h,0,1).reshape(-1), axis=0).reshape(4, N, 256), cr256, h9, rt=rt)
# SORTED indices (locality): does gather speed depend on index order?
hs = jnp.sort(h9.reshape(-1))
t_sorted = timeit(lambda cr, h: jnp.take(cr, h, axis=0), cell_rows, hs, rt=rt)
print(json.dumps(dict(t_window_major=t_cur, t_four_takes=t_4, t_agent_major=t_am, t_narrow256=t_n, t_sorted=t_sorted)))
