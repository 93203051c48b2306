"""CSC dual layout: gather-based X'v must match the scatter path exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlease_tpu.core import build_vocab, pack_blocks
from mlease_tpu.core.dataset import csc_arrays
from mlease_tpu.ops import objective as obj
from mlease_tpu.train.admm import AdmmConfig, AdmmTrainer

from test_admm import synth_rows


def test_csc_arrays_sorted_and_complete():
    rng = np.random.default_rng(0)
    rows = synth_rows(rng, 50)
    vocab = build_vocab(rows)
    data = pack_blocks([rows[:25], rows[25:]], vocab)
    cols, rws, vals = csc_arrays(data)
    B, R, K = data.indices.shape
    assert cols.shape == (B, R * K)
    for b in range(B):
        assert np.all(np.diff(cols[b]) >= 0)
        # same multiset of (col, val) pairs as the ELL layout
        ell = sorted(zip(data.indices[b].ravel(), data.values[b].ravel()))
        dual = sorted(zip(cols[b], vals[b]))
        assert ell == dual


def test_xtv_dual_matches_scatter():
    rng = np.random.default_rng(1)
    rows = synth_rows(rng, 80)
    vocab = build_vocab(rows)
    data = pack_blocks([rows], vocab)
    cols, rws, vals = csc_arrays(data)
    prob = obj.LRProblem(
        indices=jnp.asarray(data.indices[0]),
        values=jnp.asarray(data.values[0], jnp.float64),
        y=jnp.asarray(data.y[0], jnp.float64),
        weight=jnp.asarray(data.weight[0], jnp.float64),
        offset=jnp.asarray(data.offset[0], jnp.float64),
        prior_mean=jnp.zeros(vocab.size, jnp.float64),
        prior_var_inv=jnp.ones(vocab.size, jnp.float64))
    prob_dual = prob._replace(csc_cols=jnp.asarray(cols[0]),
                              csc_rows=jnp.asarray(rws[0]),
                              csc_vals=jnp.asarray(vals[0], jnp.float64))
    d = jnp.asarray(rng.normal(size=data.y.shape[1]))
    np.testing.assert_allclose(np.asarray(obj.xtv(prob_dual, d)),
                               np.asarray(obj.xtv(prob, d)),
                               rtol=1e-12, atol=1e-12)
    w = jnp.asarray(rng.normal(size=vocab.size) * 0.1)
    np.testing.assert_allclose(np.asarray(obj.grad(prob_dual, w)),
                               np.asarray(obj.grad(prob, w)),
                               rtol=1e-10, atol=1e-12)


def test_admm_dual_layout_matches_default():
    rng = np.random.default_rng(2)
    rows = synth_rows(rng, 200)
    vocab = build_vocab(rows)
    data = pack_blocks([rows[i::3] for i in range(3)], vocab)
    base = dict(lambdas=[1.0, 10.0], num_iters=5, dtype=jnp.float64,
                multi_rhs=False)  # dual layout rides the vmapped solver
    res_scatter = AdmmTrainer(data, vocab, AdmmConfig(**base)).run()
    res_dual = AdmmTrainer(data, vocab,
                           AdmmConfig(dual_layout=True, **base)).run()
    np.testing.assert_allclose(res_dual.z, res_scatter.z,
                               rtol=1e-9, atol=1e-11)
