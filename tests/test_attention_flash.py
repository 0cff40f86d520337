"""Flash banded attention (Pallas) vs the XLA band path and dense ref."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from graph_neural_networks_tpu.ops import (attention_band as ab,
                                           attention_flash as af,
                                           filters, gso as gso_lib, spmm)


def _setup(N=96, bw=20, ibs=16, E=1, P=2, F=3, G=2, B=2, seed=0):
    rng = np.random.default_rng(seed)
    S = np.zeros((E, N, N), np.float32)
    for e in range(E):
        ii = rng.integers(0, N, 400)
        jj = ii + rng.integers(-bw, bw + 1, 400)
        ok = (jj >= 0) & (jj < N)
        S[e, ii[ok], jj[ok]] = rng.random(ok.sum())
    g = gso_lib.as_gso(S, mode="band", block_size=ibs)
    slab5 = filters._slab5(g)
    x = jnp.asarray(rng.standard_normal((B, G, N)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((P, E, 2 * F)) * .3, jnp.float32)
    W_p = jnp.asarray(rng.standard_normal((P, E, F, G)) * .3, jnp.float32)
    return S, g, slab5, x, a, W_p


def test_flash_gat_matches_band_and_dense():
    S, g, slab5, x, a, W_p = _setup()
    want = ab.graph_attention_band(x, a, W_p, slab5, g.band_w)
    dense = filters.graph_attention(x, a, W_p, gso_lib.as_gso(S))
    with pltpu.force_tpu_interpret_mode():
        got = af.graph_attention_band_flash(x, a, W_p, slab5, g.band_w,
                                            interpret=True)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(got, dense, atol=1e-4, rtol=1e-4)


def test_flash_gat_grads_match_band():
    S, g, slab5, x, a, W_p = _setup(N=64, bw=12)

    def loss_flash(x, a, W_p):
        y = af.graph_attention_band_flash(x, a, W_p, slab5, g.band_w,
                                          interpret=True)
        return jnp.sum(y ** 2)

    def loss_band(x, a, W_p):
        return jnp.sum(ab.graph_attention_band(x, a, W_p, slab5,
                                               g.band_w) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(x, a, W_p)
    gb = jax.grad(loss_band, argnums=(0, 1, 2))(x, a, W_p)
    for got, want, name in zip(gf, gb, ("x", "a", "W")):
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3,
                                   err_msg=name)


def test_flash_gcat_matches_band():
    S, g, slab5, x, a, W_p = _setup(E=2, seed=3)
    h = jnp.asarray(np.random.default_rng(1).random((2, 3)), jnp.float32)
    want = ab.gat_lsigf_band(h, x, a, W_p, slab5, g.band_w)
    with pltpu.force_tpu_interpret_mode():
        got = af.gat_lsigf_band_flash(h, x, a, W_p, slab5, g.band_w,
                                      interpret=True)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_flash_gcat_grads():
    S, g, slab5, x, a, W_p = _setup(N=64, bw=12, seed=5)
    h = jnp.asarray(np.random.default_rng(2).random((1, 3)), jnp.float32)

    def lf(h, x, a, W_p):
        return jnp.sum(af.gat_lsigf_band_flash(h, x, a, W_p, slab5,
                                               g.band_w,
                                               interpret=True) ** 2)

    def lb(h, x, a, W_p):
        return jnp.sum(ab.gat_lsigf_band(h, x, a, W_p, slab5,
                                         g.band_w) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(lf, argnums=(0, 1, 2, 3))(h, x, a, W_p)
    gb = jax.grad(lb, argnums=(0, 1, 2, 3))(h, x, a, W_p)
    for got, want, name in zip(gf, gb, ("h", "x", "a", "W")):
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3,
                                   err_msg=name)


def test_flash_evgf_matches_band():
    rng = np.random.default_rng(7)
    S, g, slab5, x, _, _ = _setup(seed=7)
    P, K, E, F, G = 1, 2, 1, 3, 2
    a = jnp.asarray(rng.standard_normal((P, K, E, 2 * F)) * .3, jnp.float32)
    W_p = jnp.asarray(rng.standard_normal((P, K, E, F, G)) * .3, jnp.float32)
    want = ab.gat_evgf_band(x, a, W_p, slab5, g.band_w)
    with pltpu.force_tpu_interpret_mode():
        got = af.gat_evgf_band_flash(x, a, W_p, slab5, g.band_w,
                                     interpret=True)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
