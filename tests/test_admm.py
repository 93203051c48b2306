"""ADMM algebra unit tests + golden consensus tests:
N-block consensus ~= single-machine solution (SURVEY.md section 4 test plan)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlease_tpu.core import build_vocab, pack_blocks, pack_rows
from mlease_tpu.io.records import INTERCEPT_NAME
from mlease_tpu.ops import admm_math, objective as obj
from mlease_tpu.ops.tron import tron
from mlease_tpu.train.admm import AdmmConfig, AdmmTrainer


# ---------------------------------------------------------------------------
# pure algebra
# ---------------------------------------------------------------------------

def test_default_rho():
    assert admm_math.default_rho(1) == 1.0
    assert admm_math.default_rho(100) == 1.0
    assert admm_math.default_rho(101) == 10.0


def test_rho_effective():
    assert admm_math.rho_effective(2.0, 1) == 2.0
    assert admm_math.rho_effective(2.0, 1, initialize_boost_rate=1.5) == 3.0
    # boost applies only on iteration 1
    assert admm_math.rho_effective(2.0, 3, initialize_boost_rate=1.5) == 2.0
    r3 = admm_math.rho_effective(2.0, 3, rho_adapt_coefficient=0.3)
    assert r3 == pytest.approx(2.0 * np.exp(-2 * 0.3))


def test_inner_eps_schedule():
    # no decay on iter 1
    assert admm_math.inner_eps_schedule(0.01, 1, 1e-9) == 0.01
    # decay when previous mindiff < 0.001
    assert admm_math.inner_eps_schedule(0.01, 2, 1e-4) == pytest.approx(0.001)
    assert admm_math.inner_eps_schedule(0.01, 2, 0.5) == 0.01
    # aggressive: decay every iter > 5 regardless of mindiff
    assert admm_math.inner_eps_schedule(0.01, 6, 0.5, aggressive=True) == pytest.approx(0.001)
    assert admm_math.inner_eps_schedule(0.01, 5, 1e-9, aggressive=True) == 0.01


def test_z_update_l2():
    v = jnp.asarray([1.0, 2.0, 4.0])
    lam_vec = jnp.asarray([3.0, 3.0, 3.0])
    # kappa = N*rho/(lam+N*rho) = 2*1.5/(3+3) = 0.5
    z = admm_math.z_update_l2(v, lam_vec, rho=1.5, nblocks=2,
                              intercept_index=2)
    np.testing.assert_allclose(np.asarray(z), [0.5, 1.0, 4.0])
    z_pen = admm_math.z_update_l2(v, lam_vec, rho=1.5, nblocks=2,
                                  intercept_index=2, penalize_intercept=True)
    np.testing.assert_allclose(np.asarray(z_pen), [0.5, 1.0, 2.0])


def test_z_update_l1_soft_threshold_vs_reference():
    v = jnp.asarray([0.05, 0.5, -0.5, -0.05, 1.0])
    lam_vec = jnp.full(5, 2.0)
    # t = lam/(rho*N) = 2/(1*20) = 0.1
    z = admm_math.z_update_l1(v, lam_vec, rho=1.0, nblocks=20,
                              intercept_index=4)
    np.testing.assert_allclose(np.asarray(z), [0.0, 0.4, -0.4, 0.0, 1.0],
                               atol=1e-12)
    # reference leaves the middle band unchanged (RegressionAdmmTrain.java:420-437)
    z_ref = admm_math.z_update_l1(v, lam_vec, rho=1.0, nblocks=20,
                                  intercept_index=4, reference_compat=True)
    np.testing.assert_allclose(np.asarray(z_ref), [0.05, 0.4, -0.4, -0.05, 1.0],
                               atol=1e-12)


def test_per_feature_lambda():
    rows = [{"response": 1, "features": [("a", 1.0), ("b", 1.0)],
             "weight": 1.0, "offset": 0.0}]
    vocab = build_vocab(rows)
    vec = admm_math.per_feature_lambda(2.0, vocab.size, {"b": 7.0}, vocab)
    assert vec[vocab["a"]] == 2.0
    assert vec[vocab["b"]] == 7.0
    assert vec[vocab.intercept_index] == 2.0


def test_should_stop():
    assert admm_math.should_stop(1e-5, 1e-5)
    assert not admm_math.should_stop(1e-5, 1e-3)   # inner eps not decayed yet
    assert not admm_math.should_stop(1e-3, 1e-6)


# ---------------------------------------------------------------------------
# golden consensus tests
# ---------------------------------------------------------------------------

def synth_rows(rng, n_rows, n_feat=8, seed_w=None):
    w_true = seed_w if seed_w is not None else rng.normal(size=n_feat)
    rows = []
    for _ in range(n_rows):
        nnz = int(rng.integers(2, n_feat))
        js = rng.choice(n_feat, size=nnz, replace=False)
        vals = rng.normal(size=nnz)
        score = float(sum(w_true[j] * v for j, v in zip(js, vals))) - 0.2
        p = 1.0 / (1.0 + np.exp(-score))
        rows.append({
            "response": int(rng.random() < p),
            "features": [(f"f{j}", float(v)) for j, v in zip(js, vals)],
            "weight": 1.0, "offset": 0.0})
    return rows


def global_solution(rows, vocab, lam, dtype=jnp.float64):
    """Single-machine reference: full dataset, priorVar=1/lambda, intercept
    effectively unpenalized (var 1e5 as in RegressionNaiveTrain.java:342)."""
    blk = pack_rows(rows, vocab)
    pvi = np.full(vocab.size, lam, dtype=np.float64)
    pvi[vocab.intercept_index] = 1e-5
    prob = obj.make_problem(blk, np.zeros(vocab.size), pvi, dtype=dtype)
    res = tron(prob, jnp.zeros(vocab.size, dtype), eps=1e-8)
    return np.asarray(res.w)


@pytest.mark.parametrize("nblocks", [1, 4])
def test_admm_l2_matches_global(nblocks):
    rng = np.random.default_rng(42)
    rows = synth_rows(rng, 400)
    vocab = build_vocab(rows)
    blocks = [rows[i::nblocks] for i in range(nblocks)]
    data = pack_blocks(blocks, vocab)
    cfg = AdmmConfig(lambdas=[1.0], num_iters=60, regularizer=2,
                     dtype=jnp.float64, epsilon=1e-4)
    trainer = AdmmTrainer(data, vocab, cfg)
    result = trainer.run()
    assert result.converged
    w_admm = result.z[0]
    w_global = global_solution(rows, vocab, lam=1.0)
    np.testing.assert_allclose(w_admm, w_global, atol=5e-3, rtol=5e-3)


def test_admm_multi_lambda_matches_single():
    rng = np.random.default_rng(3)
    rows = synth_rows(rng, 300)
    vocab = build_vocab(rows)
    data = pack_blocks([rows[i::2] for i in range(2)], vocab)
    cfg_multi = AdmmConfig(lambdas=[0.5, 5.0], num_iters=15,
                           dtype=jnp.float64)
    res_multi = AdmmTrainer(data, vocab, cfg_multi).run()
    for i, lam in enumerate([0.5, 5.0]):
        cfg_one = AdmmConfig(lambdas=[lam], num_iters=15, dtype=jnp.float64)
        res_one = AdmmTrainer(data, vocab, cfg_one).run()
        np.testing.assert_allclose(res_multi.z[i], res_one.z[0],
                                   atol=1e-10, rtol=1e-10)
    # stronger regularization shrinks coefficients
    icpt = vocab.intercept_index
    coef = np.delete(res_multi.z, icpt, axis=1)
    assert np.linalg.norm(coef[1]) < np.linalg.norm(coef[0])


def test_admm_l1_sparsifies_and_matches_ista():
    rng = np.random.default_rng(7)
    w_true = np.zeros(10)
    w_true[:3] = [2.0, -2.0, 1.5]
    rows = synth_rows(rng, 500, n_feat=10, seed_w=w_true)
    vocab = build_vocab(rows)
    data = pack_blocks([rows[i::4] for i in range(4)], vocab)
    lam = 6.0
    cfg = AdmmConfig(lambdas=[lam], num_iters=60, regularizer=1,
                     reference_l1_compat=False,  # textbook soft-threshold
                     dtype=jnp.float64, epsilon=1e-6)
    result = AdmmTrainer(data, vocab, cfg).run()
    z = result.z[0]
    icpt = vocab.intercept_index

    # ISTA reference on the global L1 problem
    blk = pack_rows(rows, vocab)
    prob = obj.make_problem(blk, np.zeros(vocab.size),
                            np.zeros(vocab.size), dtype=jnp.float64)

    def grad_smooth(w):
        return np.asarray(obj.grad(prob, jnp.asarray(w)))

    w = np.zeros(vocab.size)
    step = 1.0 / 500
    for _ in range(6000):
        g = grad_smooth(w)
        w1 = w - step * g
        thr = np.full(vocab.size, step * lam)
        thr[icpt] = 0.0
        w = np.sign(w1) * np.maximum(np.abs(w1) - thr, 0.0)

    np.testing.assert_allclose(z, w, atol=2e-2)
    # true zeros recovered as (near-)zeros by the soft-threshold z-update
    zero_feats = [vocab[f"f{j}"] for j in range(3, 10)]
    assert np.abs(z[zero_feats]).max() < np.abs(z[vocab["f0"]])


def test_admm_loglik_tracking_and_best_model():
    rng = np.random.default_rng(11)
    rows = synth_rows(rng, 300)
    test_rows = synth_rows(rng, 100)
    vocab = build_vocab(rows)
    data = pack_blocks([rows[i::2] for i in range(2)], vocab)
    cfg = AdmmConfig(lambdas=[1.0, 10.0], num_iters=8, dtype=jnp.float64,
                     test_loglik_per_iter=True)
    result = AdmmTrainer(data, vocab, cfg, test_rows=test_rows).run()
    assert result.best_model is not None
    assert result.best_lambda in ("1.0", "10.0")
    assert len(result.sample_loglik_history) == 2 * result.iterations
    # history matches host-side LinearModel evaluation
    last = result.sample_loglik_history[-2:]
    for entry in last:
        model = result.models[entry["lambda"]]
        ll = sum(model.eval_instance(r, loglik=True) for r in test_rows)
        ll /= sum(r["weight"] for r in test_rows)
        assert entry["testLoglik"] == pytest.approx(ll, rel=1e-6)


def test_admm_empty_block_is_benign():
    rng = np.random.default_rng(5)
    rows = synth_rows(rng, 120)
    vocab = build_vocab(rows)
    blocks = [rows, []]  # second block empty
    data = pack_blocks(blocks, vocab)
    cfg = AdmmConfig(lambdas=[1.0], num_iters=10, dtype=jnp.float64)
    result = AdmmTrainer(data, vocab, cfg).run()
    assert np.all(np.isfinite(result.z))


def test_rho_adaptation_only_affects_x_subproblem():
    """The z-update shrinkage uses the BASE rho even when rho adaptation /
    boost changes the x-solve prior (RegressionAdmmTrain.java:368-380 reads
    the unadapted lambdaRho map; :648-658 adapts only in the reducer)."""
    rows = [{"response": 1, "features": [("a", 1.0)], "weight": 0.0,
             "offset": 0.0}] * 8  # zero weight: x == prior mean exactly
    vocab = build_vocab(rows)
    data = pack_blocks([rows], vocab)
    # absent from data entirely -> present mask pins x = z - u
    data = data._replace(present=np.zeros_like(data.present))
    lam, rho, boost = 2.0, 1.0, 5.0
    cfg = AdmmConfig(lambdas=[lam], rhos=[rho], num_iters=1, regularizer=2,
                     initialize_boost_rate=boost, dtype=jnp.float64)
    z0 = np.full(vocab.size, 3.0)
    trainer = AdmmTrainer(data, vocab, cfg)
    result = trainer.run(z0=z0)
    # x = z0 (u=0), so v = z0 and z1 = kappa_base * z0 with
    # kappa = N*rho/(lam + N*rho) using the UNboosted rho
    kappa = 1 * rho / (lam + 1 * rho)
    expected = np.full(vocab.size, 3.0 * kappa)
    expected[vocab.intercept_index] = 3.0  # unpenalized intercept
    np.testing.assert_allclose(result.z[0], expected, rtol=1e-10)


def test_fused_run_matches_host_loop():
    """run_fused (one on-device lax.while_loop for the whole driver) must
    reproduce run() exactly: same z/u, same diff history, same loglik/best
    tracking, same stopping behavior."""
    rng = np.random.default_rng(11)
    rows = synth_rows(rng, 400)
    test_rows = synth_rows(rng, 150)
    vocab = build_vocab(rows)
    blocks = [rows[i::4] for i in range(4)]
    data = pack_blocks(blocks, vocab)
    cfg = AdmmConfig(lambdas=[1.0, 10.0], num_iters=6, dtype=jnp.float64,
                     test_loglik_per_iter=True, multi_rhs=True, pcg=True,
                     head_size=4)
    tr1 = AdmmTrainer(data, vocab, cfg, test_rows=test_rows)
    res_host = tr1.run()
    tr2 = AdmmTrainer(data, vocab, cfg, test_rows=test_rows)
    res_fused = tr2.run_fused()

    assert res_fused.iterations == res_host.iterations
    assert res_fused.converged == res_host.converged
    np.testing.assert_allclose(res_fused.z, res_host.z, rtol=1e-12)
    np.testing.assert_allclose(res_fused.u, res_host.u, rtol=1e-12)
    assert len(res_fused.diff_history) == len(res_host.diff_history)
    for a, b in zip(res_fused.diff_history, res_host.diff_history):
        for k in a:
            assert np.isclose(a[k], b[k], rtol=1e-12)
    assert len(res_fused.sample_loglik_history) == \
        len(res_host.sample_loglik_history)
    for a, b in zip(res_fused.sample_loglik_history,
                    res_host.sample_loglik_history):
        assert a["lambda"] == b["lambda"] and a["iter"] == b["iter"]
        assert np.isclose(a["testLoglik"], b["testLoglik"], rtol=1e-12)
    assert res_fused.best_lambda == res_host.best_lambda
    assert np.isclose(res_fused.best_loglik, res_host.best_loglik,
                      rtol=1e-12)


def test_fused_run_warm_start_and_stop():
    """Fused loop honors z0 warm start + boost and the early-stop rule."""
    rng = np.random.default_rng(12)
    rows = synth_rows(rng, 300)
    vocab = build_vocab(rows)
    blocks = [rows[i::2] for i in range(2)]
    data = pack_blocks(blocks, vocab)
    z0 = rng.normal(size=vocab.size) * 0.05
    cfg = AdmmConfig(lambdas=[5.0], num_iters=60, dtype=jnp.float64,
                     initialize_boost_rate=4.0, multi_rhs=False)
    res_host = AdmmTrainer(data, vocab, cfg).run(z0=z0)
    res_fused = AdmmTrainer(data, vocab, cfg).run_fused(z0=z0)
    assert res_fused.iterations == res_host.iterations
    assert res_fused.converged == res_host.converged
    np.testing.assert_allclose(res_fused.z, res_host.z, rtol=1e-12)


def test_fused_run_chunked_matches_single_chunk():
    """Chunked fused execution (checkpoint_every=2) must be bit-identical to
    the single-dispatch fused run and fire the callback per chunk."""
    rng = np.random.default_rng(14)
    rows = synth_rows(rng, 300)
    vocab = build_vocab(rows)
    blocks = [rows[i::3] for i in range(3)]
    data = pack_blocks(blocks, vocab)
    test_rows = synth_rows(rng, 80)
    cfg = AdmmConfig(lambdas=[1.0, 10.0], num_iters=7, dtype=jnp.float64,
                     test_loglik_per_iter=True, multi_rhs=True, pcg=True)
    res_one = AdmmTrainer(data, vocab, cfg, test_rows=test_rows).run_fused()

    calls = []

    def cb(iteration, z, u, diffs, inner_eps, logliks=None):
        calls.append((iteration, len(logliks or []), float(np.min(diffs))))

    res_chunk = AdmmTrainer(data, vocab, cfg, test_rows=test_rows).run_fused(
        checkpoint_every=2, callback=cb)
    np.testing.assert_array_equal(res_chunk.z, res_one.z)
    np.testing.assert_array_equal(res_chunk.u, res_one.u)
    assert res_chunk.iterations == res_one.iterations
    assert res_chunk.sample_loglik_history == res_one.sample_loglik_history
    # 7 iterations at chunk=2 -> callbacks at it 2,4,6,7 (or fewer if early
    # stop); every loglik entry delivered exactly once
    assert [c[0] for c in calls][-1] == res_chunk.iterations
    assert sum(c[1] for c in calls) == len(res_chunk.sample_loglik_history)


def test_fused_rho_schedule_matches_host_loop():
    """run_fused's precomputed rho_eff table (boost/adapt — the r5
    workaround for the TPU worker fault the in-loop exp variant hit) must
    reproduce the host driver loop's rho_effective() trajectory exactly."""
    rng = np.random.default_rng(17)
    rows = synth_rows(rng, 300)
    vocab = build_vocab(rows)
    data = pack_blocks([rows[i::3] for i in range(3)], vocab)
    for kw in ({"rho_adapt_coefficient": 0.05},
               {"initialize_boost_rate": 2.5},
               {"rho_adapt_coefficient": 0.05,
                "initialize_boost_rate": 2.5}):
        cfg = AdmmConfig(lambdas=[1.0, 10.0], num_iters=6, regularizer=2,
                         dtype=jnp.float64, multi_rhs=True, **kw)
        z0 = (np.full(vocab.size, 0.1)
              if kw.get("initialize_boost_rate") else None)
        res_host = AdmmTrainer(data, vocab, cfg).run(z0=z0)
        res_fused = AdmmTrainer(data, vocab, cfg).run_fused(z0=z0)
        np.testing.assert_allclose(res_fused.z, res_host.z, rtol=1e-9,
                                   atol=1e-11)
