"""Pallas Gram kernel (interpret mode on CPU) + dense Newton-Cholesky solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlease_tpu.ops import objective as obj
from mlease_tpu.ops.newton import newton_cholesky
from mlease_tpu.ops.pallas.gram import gram_batched, gram_matrix
from mlease_tpu.ops.tron import tron

from test_tron import make_problem


def test_gram_matches_einsum():
    rng = np.random.default_rng(0)
    R, F = 300, 24
    x = jnp.asarray(rng.normal(size=(R, F)).astype(np.float32))
    d = jnp.asarray(rng.uniform(0.1, 1.0, size=R).astype(np.float32))
    pvi = jnp.asarray(rng.uniform(0.5, 2.0, size=F).astype(np.float32))
    got = gram_matrix(x, d, pvi, tile_r=64, interpret=True)
    want = np.einsum("rm,r,rn->mn", np.asarray(x), np.asarray(d),
                     np.asarray(x)) + np.diag(np.asarray(pvi))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)


def test_gram_batched_and_padding():
    rng = np.random.default_rng(1)
    B, R, F = 3, 100, 16   # R not a tile multiple -> padding path
    x = jnp.asarray(rng.normal(size=(B, R, F)).astype(np.float32))
    d = jnp.asarray(rng.uniform(0.1, 1.0, size=(B, R)).astype(np.float32))
    pvi = jnp.ones((B, F), jnp.float32)
    got = gram_batched(x, d, pvi, tile_r=32, interpret=True)
    for b in range(B):
        want = (np.einsum("rm,r,rn->mn", np.asarray(x[b]), np.asarray(d[b]),
                          np.asarray(x[b])) + np.eye(F))
        np.testing.assert_allclose(np.asarray(got[b]), want, rtol=1e-5,
                                   atol=1e-4)


def test_newton_cholesky_matches_tron():
    prob, _ = make_problem()
    res_t = tron(prob, jnp.zeros(prob.dim, jnp.float64), eps=1e-6)
    res_n = newton_cholesky(prob, jnp.zeros(prob.dim, jnp.float64), eps=1e-6)
    assert bool(res_n.converged)
    np.testing.assert_allclose(np.asarray(res_n.w), np.asarray(res_t.w),
                               rtol=1e-5, atol=1e-6)
    assert int(res_n.iterations) <= 15


def test_newton_cholesky_warm_start():
    prob, _ = make_problem()
    cold = newton_cholesky(prob, jnp.zeros(prob.dim, jnp.float64), eps=1e-6)
    warm = newton_cholesky(prob, cold.w, eps=1e-6)
    assert int(warm.iterations) == 0


def test_newton_cholesky_vmap():
    probs = [make_problem(seed=s)[0] for s in range(3)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *probs)
    n = probs[0].dim
    res = jax.vmap(lambda p, w, e: newton_cholesky(p, w, e))(
        batch, jnp.zeros((3, n), jnp.float64), jnp.full(3, 1e-6))
    for i, p in enumerate(probs):
        single = newton_cholesky(p, jnp.zeros(n, jnp.float64), 1e-6)
        np.testing.assert_allclose(np.asarray(res.w[i]),
                                   np.asarray(single.w), rtol=1e-6, atol=1e-8)


def test_tile_segment_sum_interpret():
    """Scatter-free tail X'd (experimental): layout + kernel end-to-end."""
    from mlease_tpu.ops.pallas.tile_sum import (TILE_C, segment_layout,
                                                tile_segment_sum)

    rng = np.random.default_rng(0)
    T, R, n, L = 3000, 128, 900, 3
    rows = rng.integers(0, R, T).astype(np.int32)
    cols = rng.integers(0, n, T).astype(np.int32)
    vals = rng.normal(size=T).astype(np.float32)
    d = rng.normal(size=(R, L)).astype(np.float32)

    order, slot, local, C, P = segment_layout(cols, n)
    # runtime side: pure gather into the pre-permuted slab positions
    contrib = np.zeros((C * P, L), np.float32)
    contrib[slot] = (vals[:, None] * d[rows])[order]
    out = tile_segment_sum(jnp.asarray(contrib.reshape(C, P, L)),
                           jnp.asarray(local), C, P, interpret=True)
    want = np.zeros((C * TILE_C, L), np.float32)
    np.add.at(want, cols, vals[:, None] * d[rows])
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)
