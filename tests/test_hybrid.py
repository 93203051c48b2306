"""Dense-head hybrid layout: exactness vs the pure-sparse path."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlease_tpu.core import build_vocab, pack_blocks
from mlease_tpu.core.dataset import to_hybrid
from mlease_tpu.ops import objective as obj
from mlease_tpu.train.admm import AdmmConfig, AdmmTrainer

from test_admm import synth_rows


def test_to_hybrid_preserves_nonzeros():
    rng = np.random.default_rng(0)
    rows = synth_rows(rng, 100)
    vocab = build_vocab(rows)
    data = pack_blocks([rows[:50], rows[50:]], vocab)
    hyb = to_hybrid(data, head_size=3)
    assert hyb.head.shape == (2, data.padded_rows, 3)
    assert hyb.indices.shape[2] == 0  # ELL emptied; tail is flat COO
    # intercept column (in every row) must be in the head
    assert vocab.intercept_index in hyb.head_ids
    # per-row reconstruction: head + COO tail == original multiset
    for b in range(2):
        tails: dict[tuple[int, int], float] = {}
        for t in range(hyb.tail_vals.shape[1]):
            v = hyb.tail_vals[b, t]
            if v != 0:
                key = (int(hyb.tail_rows[b, t]), int(hyb.tail_cols[b, t]))
                tails[key] = tails.get(key, 0.0) + v
        for r in range(data.nrows[b]):
            orig = {}
            for k in range(data.max_nnz):
                v = data.values[b, r, k]
                if v != 0:
                    orig[data.indices[b, r, k]] = orig.get(
                        data.indices[b, r, k], 0.0) + v
            recon = {}
            for h, col in enumerate(hyb.head_ids):
                v = hyb.head[b, r, h]
                if v != 0:
                    recon[col] = recon.get(col, 0.0) + v
            for (rr, cc), v in tails.items():
                if rr == r:
                    recon[cc] = recon.get(cc, 0.0) + v
            assert set(orig) == set(recon)
            for c in orig:
                assert orig[c] == pytest.approx(recon[c], abs=1e-6)


def test_hybrid_objective_matches_sparse():
    rng = np.random.default_rng(1)
    rows = synth_rows(rng, 120)
    vocab = build_vocab(rows)
    data = pack_blocks([rows], vocab)
    hyb = to_hybrid(data, head_size=4)
    n = vocab.size

    def mkprob(d, hybrid):
        kw = {}
        if hybrid:
            kw = dict(head_x=jnp.asarray(d.head[0], jnp.float64),
                      head_ids=jnp.asarray(d.head_ids),
                      tail_rows=jnp.asarray(d.tail_rows[0]),
                      tail_cols=jnp.asarray(d.tail_cols[0]),
                      tail_vals=jnp.asarray(d.tail_vals[0], jnp.float64))
        return obj.LRProblem(
            indices=jnp.asarray(d.indices[0]),
            values=jnp.asarray(d.values[0], jnp.float64),
            y=jnp.asarray(d.y[0], jnp.float64),
            weight=jnp.asarray(d.weight[0], jnp.float64),
            offset=jnp.asarray(d.offset[0], jnp.float64),
            prior_mean=jnp.zeros(n, jnp.float64),
            prior_var_inv=jnp.ones(n, jnp.float64), **kw)

    p_sparse = mkprob(data, False)
    p_hyb = mkprob(hyb, True)
    w = jnp.asarray(rng.normal(size=n) * 0.2)
    d_vec = jnp.asarray(rng.normal(size=data.y.shape[1]))

    np.testing.assert_allclose(np.asarray(obj.xv(p_hyb, w)),
                               np.asarray(obj.xv(p_sparse, w)),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(obj.xtv(p_hyb, d_vec)),
                               np.asarray(obj.xtv(p_sparse, d_vec)),
                               rtol=1e-12, atol=1e-12)
    assert float(obj.fun(p_hyb, w)) == pytest.approx(
        float(obj.fun(p_sparse, w)), rel=1e-12)
    np.testing.assert_allclose(np.asarray(obj.grad(p_hyb, w)),
                               np.asarray(obj.grad(p_sparse, w)),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(obj.hessian_diagonal(p_hyb, w)),
                               np.asarray(obj.hessian_diagonal(p_sparse, w)),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(obj.densify(p_hyb)),
                               np.asarray(obj.densify(p_sparse)),
                               rtol=1e-12, atol=1e-12)


def test_admm_hybrid_matches_sparse():
    rng = np.random.default_rng(2)
    rows = synth_rows(rng, 300)
    vocab = build_vocab(rows)
    data = pack_blocks([rows[i::3] for i in range(3)], vocab)
    base = dict(lambdas=[1.0, 10.0], num_iters=5, dtype=jnp.float64)
    res_sparse = AdmmTrainer(data, vocab, AdmmConfig(**base)).run()
    res_hyb = AdmmTrainer(data, vocab,
                          AdmmConfig(head_size=4, **base)).run()
    np.testing.assert_allclose(res_hyb.z, res_sparse.z, rtol=1e-8, atol=1e-10)


def test_admm_hybrid_on_mesh():
    from mlease_tpu.parallel import cpu_devices, make_mesh

    rng = np.random.default_rng(3)
    rows = synth_rows(rng, 200)
    vocab = build_vocab(rows)
    data = pack_blocks([rows[i::4] for i in range(4)], vocab)
    # flat_blocks=False: the mesh path keeps the block batch axis, so the
    # single-device side must run the identical vmapped trajectory
    base = dict(lambdas=[1.0], num_iters=4, dtype=jnp.float64, head_size=4,
                flat_blocks=False)
    res_single = AdmmTrainer(data, vocab, AdmmConfig(**base)).run()
    mesh = make_mesh(cpu_devices())
    res_mesh = AdmmTrainer(data, vocab, AdmmConfig(**base), mesh=mesh).run()
    np.testing.assert_allclose(res_mesh.z, res_single.z, rtol=1e-12, atol=1e-12)


def test_bf16_head_close_to_f32():
    rng = np.random.default_rng(9)
    rows = synth_rows(rng, 300)
    vocab = build_vocab(rows)
    data = pack_blocks([rows[i::2] for i in range(2)], vocab)
    base = dict(lambdas=[1.0], num_iters=5, dtype=jnp.float32, head_size=4)
    res_f32 = AdmmTrainer(data, vocab, AdmmConfig(**base)).run()
    res_bf16 = AdmmTrainer(data, vocab,
                           AdmmConfig(head_dtype=jnp.bfloat16, **base)).run()
    assert np.all(np.isfinite(res_bf16.z))
    np.testing.assert_allclose(res_bf16.z, res_f32.z, atol=2e-2)


def test_to_hybrid_duplicate_feature_sums():
    """A feature repeated within one row (legal in the ELL layout, summed by
    the reference's sparse dot) must still SUM into the head — the r5
    scatter fast path may only fire when every (row, head-col) pair is
    unique."""
    from mlease_tpu.core.dataset import BlockedData

    # one block, two rows; feature 1 appears TWICE in row 0
    indices = np.array([[[1, 1, 2], [1, 2, 0]]], np.int32)
    values = np.array([[[2.0, 3.0, 4.0], [5.0, 6.0, 0.0]]], np.float32)
    present = np.zeros((1, 4), bool)
    present[0, [0, 1, 2]] = True
    data = BlockedData(
        indices=indices, values=values,
        y=np.ones((1, 2), np.float32), weight=np.ones((1, 2), np.float32),
        offset=np.zeros((1, 2), np.float32), present=present,
        nrows=np.array([2], np.int32), nblocks=1, dim=4,
        head=None, head_ids=None, tail_rows=None, tail_cols=None,
        tail_vals=None, tail_c_rows=None, tail_c_cols=None,
        tail_c_vals=None)
    hyb = to_hybrid(data, head_size=2, nnz_multiple=1)
    h1 = list(hyb.head_ids).index(1)
    assert hyb.head[0, 0, h1] == pytest.approx(5.0)   # 2.0 + 3.0 summed
    assert hyb.head[0, 1, h1] == pytest.approx(5.0)

    # and the unique case in a target dtype builds directly in that dtype
    uniq = data._replace(
        indices=np.array([[[1, 2, 0], [1, 2, 0]]], np.int32),
        values=np.array([[[2.0, 4.0, 0.0], [5.0, 6.0, 0.0]]], np.float32))
    import ml_dtypes
    hyb2 = to_hybrid(uniq, head_size=2, nnz_multiple=1,
                     head_dtype=np.dtype(ml_dtypes.bfloat16))
    assert hyb2.head.dtype == np.dtype(ml_dtypes.bfloat16)
    h1 = list(hyb2.head_ids).index(1)
    assert float(hyb2.head[0, 0, h1]) == pytest.approx(2.0)
