"""Multi-RHS TRON: must match the vmapped single-lambda solver lane-by-lane."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlease_tpu.core import build_vocab, pack_blocks, pack_rows
from mlease_tpu.core.dataset import to_hybrid
from mlease_tpu.ops import objective as obj
from mlease_tpu.ops.tron import tron
from mlease_tpu.ops.tron_multi import MultiProblem, tron_multi
from mlease_tpu.train.admm import AdmmConfig, AdmmTrainer

from test_admm import synth_rows


def make_multi(rows, vocab, pvis, pms, hybrid=False, col_tails=False):
    data = pack_blocks([rows], vocab)
    if hybrid:
        data = to_hybrid(data, head_size=4)
    kw = {}
    if hybrid:
        kw = dict(head_x=jnp.asarray(data.head[0], jnp.float64),
                  head_ids=jnp.asarray(data.head_ids),
                  tail_rows=jnp.asarray(data.tail_rows[0]),
                  tail_cols=jnp.asarray(data.tail_cols[0]),
                  tail_vals=jnp.asarray(data.tail_vals[0], jnp.float64))
        if col_tails:
            kw.update(tail_c_rows=jnp.asarray(data.tail_c_rows[0]),
                      tail_c_cols=jnp.asarray(data.tail_c_cols[0]),
                      tail_c_vals=jnp.asarray(data.tail_c_vals[0],
                                              jnp.float64))
    mp = MultiProblem(
        indices=jnp.asarray(data.indices[0]),
        values=jnp.asarray(data.values[0], jnp.float64),
        y=jnp.asarray(data.y[0], jnp.float64),
        weight=jnp.asarray(data.weight[0], jnp.float64),
        offset=jnp.asarray(data.offset[0], jnp.float64),
        prior_mean=jnp.asarray(pms.T),            # (n, L)
        prior_var_inv=jnp.asarray(pvis.T), **kw)
    return data, mp


@pytest.mark.parametrize("hybrid", [False, True])
def test_multi_matches_single_lanes(hybrid):
    rng = np.random.default_rng(0)
    rows = synth_rows(rng, 150)
    vocab = build_vocab(rows)
    n = vocab.size
    L = 3
    pvis = np.stack([np.full(n, lam) for lam in (0.5, 2.0, 8.0)])
    pms = np.stack([np.full(n, m) for m in (0.0, 0.05, -0.05)])
    data, mp = make_multi(rows, vocab, pvis, pms, hybrid=hybrid)
    W0 = jnp.zeros((n, L), jnp.float64)
    eps = 1e-5
    res_m = tron_multi(mp, W0, eps)

    blk = pack_rows(rows, vocab)
    for i in range(L):
        prob = obj.make_problem(blk, pms[i], pvis[i], dtype=jnp.float64)
        res_s = tron(prob, jnp.zeros(n, jnp.float64), eps)
        np.testing.assert_allclose(np.asarray(res_m.w[:, i]),
                                   np.asarray(res_s.w), rtol=1e-9, atol=1e-10)
        assert int(res_m.iterations[i]) == int(res_s.iterations)
    assert bool(res_m.converged.all())


def test_multi_objective_consistency():
    rng = np.random.default_rng(1)
    rows = synth_rows(rng, 80)
    vocab = build_vocab(rows)
    n = vocab.size
    pvis = np.stack([np.full(n, 1.0), np.full(n, 4.0)])
    pms = np.zeros((2, n))
    _data, mp = make_multi(rows, vocab, pvis, pms)
    import mlease_tpu.ops.tron_multi as tm

    W = jnp.asarray(rng.normal(size=(n, 2)) * 0.2)
    blk = pack_rows(rows, vocab)
    for i in range(2):
        prob = obj.make_problem(blk, pms[i], pvis[i], dtype=jnp.float64)
        assert float(tm.fun(mp, W)[i]) == pytest.approx(
            float(obj.fun(prob, W[:, i])), rel=1e-12)
        g_m, d_m = tm.grad_and_curvature(mp, W)
        g_s, d_s = obj.grad_and_curvature(prob, W[:, i])
        np.testing.assert_allclose(np.asarray(g_m[:, i]), np.asarray(g_s),
                                   rtol=1e-11, atol=1e-12)
        np.testing.assert_allclose(np.asarray(d_m[:, i]), np.asarray(d_s),
                                   rtol=1e-11, atol=1e-12)


@pytest.mark.parametrize("layout", ["ell", "hybrid", "hybrid_col"])
def test_fused_grad_diag_exact(layout):
    """fun_grad_curvature(with_diag=True) ≡ (fun, grad, curv, hessian_diag)
    on every tail layout — the combined (n, 2L) scatter must be bitwise-
    equivalent lane sums."""
    import mlease_tpu.ops.tron_multi as tm

    rng = np.random.default_rng(6)
    rows = synth_rows(rng, 120)
    vocab = build_vocab(rows)
    n = vocab.size
    pvis = np.stack([np.full(n, lam) for lam in (0.5, 2.0, 8.0)])
    pms = np.stack([np.full(n, m) for m in (0.0, 0.05, -0.05)])
    _data, mp = make_multi(rows, vocab, pvis, pms,
                           hybrid=layout != "ell",
                           col_tails=layout == "hybrid_col")
    W = jnp.asarray(rng.normal(size=(n, 3)) * 0.3)

    F, G, Dm = tm.fun_grad_curvature(mp, W)
    F2, G2, Dm2, Hd = tm.fun_grad_curvature(mp, W, with_diag=True)
    np.testing.assert_allclose(np.asarray(F2), np.asarray(F), rtol=1e-14)
    np.testing.assert_allclose(np.asarray(G2), np.asarray(G),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_array_equal(np.asarray(Dm2), np.asarray(Dm))
    np.testing.assert_allclose(np.asarray(Hd),
                               np.asarray(tm.hessian_diagonal(mp, Dm)),
                               rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("layout", ["ell", "hybrid_col"])
def test_grad_norm_at_zero_exact(layout):
    """grad_norm_at_zero ≡ ||grad_and_curvature(prob, 0)[0]|| (Xv(0)=0, so
    the Xv pass is skippable without any numeric change)."""
    import mlease_tpu.ops.tron_multi as tm

    rng = np.random.default_rng(7)
    rows = synth_rows(rng, 90)
    for r in rows:
        r["offset"] = float(rng.normal() * 0.5)
    vocab = build_vocab(rows)
    n = vocab.size
    pvis = np.stack([np.full(n, lam) for lam in (0.5, 2.0)])
    pms = np.stack([np.full(n, m) for m in (0.1, -0.2)])
    _data, mp = make_multi(rows, vocab, pvis, pms,
                           hybrid=layout != "ell",
                           col_tails=layout == "hybrid_col")
    G0, _ = tm.grad_and_curvature(mp, jnp.zeros((n, 2), jnp.float64))
    np.testing.assert_allclose(
        np.asarray(tm.grad_norm_at_zero(mp, 2)),
        np.asarray(tm._norm(G0)), rtol=1e-14)


@pytest.mark.parametrize("head_size", [0, 4])
def test_admm_multi_rhs_matches_vmapped(head_size):
    rng = np.random.default_rng(2)
    rows = synth_rows(rng, 300)
    vocab = build_vocab(rows)
    data = pack_blocks([rows[i::3] for i in range(3)], vocab)
    # pcg=False + flat_blocks=False: this test checks layout equivalence
    # against the vmapped plain-CG solver, so both sides must follow the
    # same lock-step per-block CG trajectory
    base = dict(lambdas=[1.0, 10.0], num_iters=5, dtype=jnp.float64,
                head_size=head_size, pcg=False, flat_blocks=False)
    res_vmap = AdmmTrainer(data, vocab,
                           AdmmConfig(multi_rhs=False, **base)).run()
    res_multi = AdmmTrainer(data, vocab,
                            AdmmConfig(multi_rhs=True, **base)).run()
    np.testing.assert_allclose(res_multi.z, res_vmap.z, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(res_multi.u, res_vmap.u, rtol=1e-7, atol=1e-9)


def test_admm_multi_rhs_on_mesh():
    from mlease_tpu.parallel import cpu_devices, make_mesh

    rng = np.random.default_rng(3)
    rows = synth_rows(rng, 200)
    vocab = build_vocab(rows)
    data = pack_blocks([rows[i::4] for i in range(4)], vocab)
    # flat_blocks=False: the mesh path keeps the block batch axis, so the
    # single-device side must run the identical vmapped trajectory
    base = dict(lambdas=[1.0, 10.0], num_iters=4, dtype=jnp.float64,
                head_size=4, multi_rhs=True, flat_blocks=False)
    res_single = AdmmTrainer(data, vocab, AdmmConfig(**base)).run()
    mesh = make_mesh(cpu_devices())
    res_mesh = AdmmTrainer(data, vocab, AdmmConfig(**base), mesh=mesh).run()
    np.testing.assert_allclose(res_mesh.z, res_single.z, rtol=1e-12,
                               atol=1e-12)


@pytest.mark.parametrize("hybrid", [False, True])
def test_pcg_reaches_same_solution(hybrid):
    rng = np.random.default_rng(4)
    rows = synth_rows(rng, 200)
    vocab = build_vocab(rows)
    n = vocab.size
    pvis = np.stack([np.full(n, lam) for lam in (0.5, 4.0)])
    pms = np.zeros((2, n))
    _data, mp = make_multi(rows, vocab, pvis, pms, hybrid=hybrid)
    W0 = jnp.zeros((n, 2), jnp.float64)
    res_plain = tron_multi(mp, W0, 1e-6)
    res_pcg = tron_multi(mp, W0, 1e-6, precondition=True)
    assert bool(res_pcg.converged.all())
    np.testing.assert_allclose(np.asarray(res_pcg.w), np.asarray(res_plain.w),
                               rtol=1e-5, atol=1e-6)


def test_head_block_pcg_reaches_same_solution():
    """head_block preconditioning: same converged W as plain CG, never more
    CG trips than Jacobi (the head block is solved exactly)."""
    rng = np.random.default_rng(8)
    rows = synth_rows(rng, 200)
    vocab = build_vocab(rows)
    n = vocab.size
    pvis = np.stack([np.full(n, lam) for lam in (0.5, 4.0)])
    pms = np.zeros((2, n))
    _data, mp = make_multi(rows, vocab, pvis, pms, hybrid=True,
                           col_tails=True)
    W0 = jnp.zeros((n, 2), jnp.float64)
    res_plain = tron_multi(mp, W0, 1e-6)
    res_jac = tron_multi(mp, W0, 1e-6, precondition=True)
    res_blk = tron_multi(mp, W0, 1e-6, precondition="head_block")
    assert bool(res_blk.converged.all())
    np.testing.assert_allclose(np.asarray(res_blk.w), np.asarray(res_plain.w),
                               rtol=1e-5, atol=1e-6)
    assert int(res_blk.cg_trips) <= int(res_jac.cg_trips)


def test_unknown_precondition_rejected():
    """A typo'd precondition string must raise, not silently no-op the
    solver (the placeholder M would zero every CG step)."""
    rng = np.random.default_rng(14)
    rows = synth_rows(rng, 40)
    vocab = build_vocab(rows)
    n = vocab.size
    pvis = np.stack([np.full(n, 1.0)])
    pms = np.zeros((1, n))
    _data, mp = make_multi(rows, vocab, pvis, pms)
    for bad in ("1", "yes", "Jacobi ", "head-block"):
        with pytest.raises(ValueError, match="precondition"):
            tron_multi(mp, jnp.zeros((n, 1), jnp.float64), 1e-6,
                       precondition=bad)

    from mlease_tpu.train.pipeline import _parse_pcg
    assert _parse_pcg("TRUE") is True and _parse_pcg("false") is False
    assert _parse_pcg("jacobi") == "jacobi"
    with pytest.raises(ValueError, match="pcg"):
        _parse_pcg("1")


def test_head_block_requires_hybrid():
    rng = np.random.default_rng(9)
    rows = synth_rows(rng, 40)
    vocab = build_vocab(rows)
    n = vocab.size
    pvis = np.stack([np.full(n, 1.0)])
    pms = np.zeros((1, n))
    _data, mp = make_multi(rows, vocab, pvis, pms, hybrid=False)
    with pytest.raises(ValueError, match="head_block"):
        tron_multi(mp, jnp.zeros((n, 1), jnp.float64), 1e-6,
                   precondition="head_block")


def test_admm_head_block_matches_plain():
    rng = np.random.default_rng(10)
    rows = synth_rows(rng, 300)
    vocab = build_vocab(rows)
    data = pack_blocks([rows[i::3] for i in range(3)], vocab)
    base = dict(lambdas=[1.0, 10.0], num_iters=6, dtype=jnp.float64,
                head_size=4, liblinear_epsilon=1e-4)
    res_plain = AdmmTrainer(data, vocab, AdmmConfig(pcg=False, **base)).run()
    res_blk = AdmmTrainer(data, vocab,
                          AdmmConfig(pcg="head_block", **base)).run()
    np.testing.assert_allclose(res_blk.z, res_plain.z, rtol=1e-4, atol=2e-5)


def test_admm_pcg_matches_plain():
    rng = np.random.default_rng(5)
    rows = synth_rows(rng, 300)
    vocab = build_vocab(rows)
    data = pack_blocks([rows[i::3] for i in range(3)], vocab)
    base = dict(lambdas=[1.0, 10.0], num_iters=6, dtype=jnp.float64,
                head_size=4, liblinear_epsilon=1e-4)
    res_plain = AdmmTrainer(data, vocab, AdmmConfig(pcg=False, **base)).run()
    res_pcg = AdmmTrainer(data, vocab, AdmmConfig(pcg=True, **base)).run()
    # inner trajectories differ slightly (different CG paths at finite
    # tolerance) but consensus agrees to solver tolerance
    np.testing.assert_allclose(res_pcg.z, res_plain.z, rtol=1e-4, atol=2e-5)


@pytest.mark.parametrize("head_size", [0, 4])
def test_admm_flat_blocks_matches_vmapped(head_size):
    """flat_blocks folds B blocks into one (B*n, L) solve: joint trust
    region, same converged consensus to solver tolerance."""
    rng = np.random.default_rng(11)
    rows = synth_rows(rng, 300)
    vocab = build_vocab(rows)
    data = pack_blocks([rows[i::3] for i in range(3)], vocab)
    base = dict(lambdas=[1.0, 10.0], num_iters=6, dtype=jnp.float64,
                head_size=head_size, liblinear_epsilon=1e-4)
    res_vmap = AdmmTrainer(data, vocab,
                           AdmmConfig(flat_blocks=False, **base)).run()
    res_flat = AdmmTrainer(data, vocab,
                           AdmmConfig(flat_blocks=True, **base)).run()
    np.testing.assert_allclose(res_flat.z, res_vmap.z, rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(res_flat.u, res_vmap.u, rtol=1e-3, atol=1e-4)
