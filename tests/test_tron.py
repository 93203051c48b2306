"""TRON solver tests: optimality vs scipy, warm start, prior fixed points,
batched (vmapped) solving."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize

from mlease_tpu.core import build_vocab, pack_rows
from mlease_tpu.ops import objective as obj
from mlease_tpu.ops.tron import tron, tron_batched


def make_problem(seed=0, n_rows=60, n_feat=10, dtype=jnp.float64,
                 prior_var=2.0, prior_mean_val=0.1):
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(n_rows):
        nnz = int(rng.integers(1, 6))
        feats = [(f"f{j}", float(rng.normal()))
                 for j in rng.choice(n_feat, size=nnz, replace=False)]
        rows.append({"response": int(rng.integers(0, 2)), "features": feats,
                     "weight": float(rng.uniform(0.5, 2.0)),
                     "offset": float(rng.normal() * 0.1)})
    for j in range(n_feat):
        rows[j]["features"] = [(f"f{j}", 1.0)]
    vocab = build_vocab(rows)
    blk = pack_rows(rows, vocab)
    n = vocab.size
    prior_mean = np.full(n, prior_mean_val)
    prior_var_inv = np.full(n, 1.0 / prior_var)
    prob = obj.make_problem(blk, prior_mean, prior_var_inv, dtype=dtype)
    return prob, vocab


def scipy_solution(prob):
    def f(w):
        return float(obj.fun(prob, jnp.asarray(w)))

    def g(w):
        return np.asarray(obj.grad(prob, jnp.asarray(w)))

    n = prob.dim
    res = minimize(f, np.zeros(n), jac=g, method="L-BFGS-B",
                   options={"maxiter": 2000, "ftol": 1e-15, "gtol": 1e-12})
    return res.x


def test_tron_matches_scipy():
    prob, _ = make_problem()
    res = tron(prob, jnp.zeros(prob.dim, jnp.float64), eps=1e-6)
    w_ref = scipy_solution(prob)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.w), w_ref, rtol=1e-5, atol=1e-6)
    # gradient near zero at solution
    assert float(res.gnorm) < 1e-6 * max(1.0, float(res.f))


def test_tron_warm_start_converges_fast():
    prob, _ = make_problem()
    cold = tron(prob, jnp.zeros(prob.dim, jnp.float64), eps=1e-6)
    warm = tron(prob, cold.w, eps=1e-6)
    # warm start from the solution: ||g|| <= eps*||g(0)|| immediately
    assert int(warm.iterations) == 0
    np.testing.assert_allclose(np.asarray(warm.w), np.asarray(cold.w))


def test_no_data_features_go_to_prior_mean():
    """Features with no data converge to the prior mean — the dense analogue
    of LibLinear.java:373-397 (absent-feature fallback)."""
    prob, vocab = make_problem()
    # zero out feature column f3's values: it no longer appears in data
    col = vocab["f3"]
    values = jnp.where(prob.indices == col, 0.0, prob.values)
    prob2 = prob._replace(values=values)
    res = tron(prob2, jnp.zeros(prob.dim, jnp.float64), eps=1e-10)
    # Truncated CG leaves ~1e-8 residual; the ADMM driver pins absent
    # features *exactly* to the prior mean via the block presence mask.
    assert float(res.w[col]) == pytest.approx(float(prob.prior_mean[col]),
                                              abs=1e-6)


def test_quadratic_exact_in_one_iteration():
    """With zero data weight the objective is the pure Gaussian prior; TRON
    must land exactly on the prior mean."""
    prob, _ = make_problem()
    prob = prob._replace(weight=jnp.zeros_like(prob.weight))
    res = tron(prob, jnp.zeros(prob.dim, jnp.float64), eps=1e-6)
    np.testing.assert_allclose(np.asarray(res.w), np.asarray(prob.prior_mean),
                               atol=1e-10)


def test_tron_batched_matches_single():
    probs = []
    for seed in range(3):
        p, _ = make_problem(seed=seed)
        probs.append(p)
    # problems share shapes -> stack into leading axis
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *probs)
    n = probs[0].dim
    w0 = jnp.zeros((3, n), jnp.float64)
    eps = jnp.full(3, 1e-8, jnp.float64)
    res_b = tron_batched(batched, w0, eps)
    for i, p in enumerate(probs):
        res_i = tron(p, w0[i], eps[i])
        np.testing.assert_allclose(np.asarray(res_b.w[i]),
                                   np.asarray(res_i.w), rtol=1e-6, atol=1e-8)


def test_tron_float32_reaches_outer_tolerance():
    prob64, _ = make_problem(dtype=jnp.float64)
    prob32 = jax.tree.map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.float64 else x, prob64)
    res32 = tron(prob32, jnp.zeros(prob32.dim, jnp.float32), eps=1e-4)
    w_ref = scipy_solution(prob64)
    np.testing.assert_allclose(np.asarray(res32.w), w_ref, rtol=2e-3, atol=2e-3)


def test_class_weight_positive():
    prob, _ = make_problem()
    blk_weight_doubled = prob._replace(
        weight=jnp.where(prob.y == 1, 2.0 * prob.weight, prob.weight))
    res_cp = tron(blk_weight_doubled, jnp.zeros(prob.dim, jnp.float64), eps=1e-8)
    res_plain = tron(prob, jnp.zeros(prob.dim, jnp.float64), eps=1e-8)
    # doubling positive weights must move the solution
    assert not np.allclose(np.asarray(res_cp.w), np.asarray(res_plain.w),
                           atol=1e-3)
