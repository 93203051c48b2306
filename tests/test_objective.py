"""Objective math vs autodiff and dense numpy reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlease_tpu.core import build_vocab, pack_rows
from mlease_tpu.ops import objective as obj


def random_rows(rng, n_rows=40, n_feat=12):
    rows = []
    for _ in range(n_rows):
        nnz = rng.integers(1, 6)
        feats = [(f"f{j}", float(rng.normal()))
                 for j in rng.choice(n_feat, size=nnz, replace=False)]
        rows.append({
            "response": int(rng.integers(0, 2)),
            "features": feats,
            "weight": float(rng.uniform(0.5, 2.0)),
            "offset": float(rng.normal() * 0.1),
        })
    return rows


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    rows = random_rows(rng)
    # make sure every feature exists
    for j in range(12):
        rows[j]["features"].append((f"f{j}", 1.0))
    vocab = build_vocab(rows)
    blk = pack_rows(rows, vocab)
    n = vocab.size
    prior_mean = rng.normal(size=n) * 0.1
    prior_var_inv = rng.uniform(0.5, 3.0, size=n)
    prob = obj.make_problem(blk, prior_mean, prior_var_inv, dtype=jnp.float64)
    return prob, rng.normal(size=n) * 0.3


def dense_matrices(prob):
    X = np.asarray(obj.densify(prob))
    return X


def test_fun_matches_dense(problem):
    prob, w = problem
    w = jnp.asarray(w)
    X = dense_matrices(prob)
    score = X @ np.asarray(w) + np.asarray(prob.offset)
    yz = np.asarray(prob.y) * score
    loss = np.sum(np.asarray(prob.weight) * np.log1p(np.exp(-yz)))
    dw = np.asarray(w) - np.asarray(prob.prior_mean)
    loss += 0.5 * np.sum(dw * dw * np.asarray(prob.prior_var_inv))
    assert float(obj.fun(prob, w)) == pytest.approx(loss, rel=1e-10)


def test_grad_matches_autodiff(problem):
    prob, w = problem
    w = jnp.asarray(w)
    g, D = obj.grad_and_curvature(prob, w)
    g_auto = jax.grad(lambda w_: obj.fun(prob, w_))(w)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_auto),
                               rtol=1e-9, atol=1e-9)
    # D = weight * p * (1-p)
    assert np.all(np.asarray(D) >= 0)


def test_hv_matches_autodiff_hvp(problem):
    prob, w = problem
    w = jnp.asarray(w)
    _, D = obj.grad_and_curvature(prob, w)
    s = jnp.asarray(np.random.default_rng(1).normal(size=w.shape))
    hv = obj.hv(prob, D, s)
    hvp_auto = jax.jvp(lambda w_: obj.grad(prob, w_), (w,), (s,))[1]
    np.testing.assert_allclose(np.asarray(hv), np.asarray(hvp_auto),
                               rtol=1e-8, atol=1e-8)


def test_hessian_diagonal_and_dense(problem):
    prob, w = problem
    w = jnp.asarray(w)
    H = np.asarray(obj.dense_hessian(prob, w))
    # symmetric PD
    np.testing.assert_allclose(H, H.T, atol=1e-10)
    assert np.all(np.linalg.eigvalsh(H) > 0)
    # diagonal path agrees with dense diagonal
    diag = np.asarray(obj.hessian_diagonal(prob, w))
    np.testing.assert_allclose(diag, np.diag(H), rtol=1e-8, atol=1e-10)
    # dense H matches autodiff hessian
    H_auto = np.asarray(jax.hessian(lambda w_: obj.fun(prob, w_))(w))
    np.testing.assert_allclose(H, H_auto, rtol=1e-7, atol=1e-8)


def test_padding_is_noop(problem):
    prob, w = problem
    w = jnp.asarray(w)
    f1 = float(obj.fun(prob, w))
    # append 5 pure-padding rows: weight 0, value 0
    def pad(a, rows=5):
        pad_shape = (rows,) + a.shape[1:]
        return jnp.concatenate([a, jnp.zeros(pad_shape, a.dtype)], axis=0)
    prob2 = prob._replace(
        indices=pad(prob.indices), values=pad(prob.values),
        y=jnp.concatenate([prob.y, jnp.ones(5, prob.y.dtype)]),
        weight=pad(prob.weight), offset=pad(prob.offset))
    assert float(obj.fun(prob2, w)) == pytest.approx(f1, rel=1e-12)
    np.testing.assert_allclose(np.asarray(obj.grad(prob2, w)),
                               np.asarray(obj.grad(prob, w)), rtol=1e-10)


def test_class_balance_eps_scale():
    y = np.array([[1, 1, -1, -1, 1, 1, 1, 1]], dtype=np.float32)
    nrows = np.array([6])  # last two +1s are padding
    scale = obj.class_balance_eps_scale(y, nrows)
    # pos=3 (within first 6: rows 0,1,4,5 are +1 -> pos=4? recount below)
    mask_pos = int(np.sum(y[0, :6] == 1))
    expected = min(mask_pos, 6 - mask_pos) / 6
    assert scale[0] == pytest.approx(expected)
