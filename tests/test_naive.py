"""Naive trainer: per-key independent fits, mean model, thresholds."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlease_tpu.core import build_vocab, pack_rows
from mlease_tpu.ops import objective as obj
from mlease_tpu.ops.tron import tron
from mlease_tpu.train.naive import NaiveConfig, NaiveResult, train_naive

from test_admm import synth_rows


def single_fit_reference(rows, lam, vocab, prior_mean=0.0,
                         intercept_var=100000.0):
    """Direct single-problem TRON fit with the naive trainer's prior setup."""
    blk = pack_rows(rows, vocab)
    pvi = np.full(vocab.size, lam)
    pvi[vocab.intercept_index] = 1.0 / intercept_var
    prob = obj.make_problem(blk, np.full(vocab.size, prior_mean), pvi,
                            dtype=jnp.float64)
    scale = float(obj.class_balance_eps_scale(
        blk.y[None], np.array([blk.nrows]))[0])
    res = tron(prob, jnp.zeros(vocab.size, jnp.float64), eps=1e-5 * scale)
    return np.asarray(res.w)


def test_naive_matches_independent_fits():
    rng = np.random.default_rng(0)
    keyed = {"0": synth_rows(rng, 120), "1": synth_rows(rng, 150)}
    all_rows = keyed["0"] + keyed["1"]
    vocab = build_vocab(all_rows)
    cfg = NaiveConfig(lambdas=[1.0, 4.0], dtype=jnp.float64,
                      liblinear_epsilon=1e-5)
    result = train_naive(keyed, cfg, vocab=vocab)
    assert set(result.models) == {"1.0#0", "1.0#1", "4.0#0", "4.0#1"}
    for lam, lam_key in ((1.0, "1.0"), (4.0, "4.0")):
        for key in ("0", "1"):
            w_ref = single_fit_reference(keyed[key], lam, vocab)
            model = result.models[f"{lam_key}#{key}"]
            dense = model.to_dense(vocab)
            present_cols = np.nonzero(dense)[0]
            np.testing.assert_allclose(dense[present_cols],
                                       w_ref[present_cols],
                                       rtol=1e-4, atol=1e-5)


def test_naive_mean_model():
    rng = np.random.default_rng(1)
    keyed = {str(i): synth_rows(rng, 80) for i in range(3)}
    vocab = build_vocab([r for rows in keyed.values() for r in rows])
    cfg = NaiveConfig(lambdas=[2.0], compute_model_mean=True,
                      dtype=jnp.float64)
    result = train_naive(keyed, cfg, vocab=vocab)
    assert result.mean_models is not None
    mean = result.mean_models["2.0"]
    # mean of per-key models, coordinate-wise /nkeys
    manual_icpt = sum(result.models[f"2.0#{k}"].intercept
                      for k in keyed) / 3
    assert mean.intercept == pytest.approx(manual_icpt)


def test_naive_data_size_threshold():
    rng = np.random.default_rng(2)
    keyed = {"big": synth_rows(rng, 100), "small": synth_rows(rng, 3)}
    cfg = NaiveConfig(lambdas=[1.0], data_size_threshold=10,
                      dtype=jnp.float64)
    result = train_naive(keyed, cfg)
    assert result.skipped_keys == ["small"]
    assert set(result.models) == {"1.0#big"}


def test_naive_lambda_map_and_prior_mean():
    rng = np.random.default_rng(3)
    rows = synth_rows(rng, 200)
    vocab = build_vocab(rows)
    cfg = NaiveConfig(lambdas=[1.0], lambda_map={"f0": 1000.0},
                      dtype=jnp.float64)
    result = train_naive({"0": rows}, cfg, vocab=vocab)
    w = result.models["1.0#0"].to_dense(vocab)
    cfg2 = NaiveConfig(lambdas=[1.0], dtype=jnp.float64)
    w2 = train_naive({"0": rows}, cfg2, vocab=vocab).models["1.0#0"].to_dense(vocab)
    # heavily regularized f0 shrinks toward 0 relative to the default fit
    assert abs(w[vocab["f0"]]) < abs(w2[vocab["f0"]]) * 0.5


def test_naive_no_intercept_mode():
    rng = np.random.default_rng(4)
    rows = synth_rows(rng, 100)
    cfg = NaiveConfig(lambdas=[1.0], has_intercept=False, dtype=jnp.float64)
    result = train_naive({"0": rows}, cfg)
    model = result.models["1.0#0"]
    assert model.intercept == 0.0


def test_naive_flat_matches_vmapped():
    """flat_blocks folds keys into one (K*n, L) solve: same converged
    models to solver tolerance."""
    rng = np.random.default_rng(12)
    keyed = {str(i): synth_rows(rng, 60 + 10 * i) for i in range(3)}
    vocab = build_vocab([r for rows in keyed.values() for r in rows])
    # very tight inner eps: both sides then sit at the same minimizer and
    # the comparison checks layout correctness, not stop-rule granularity
    base = dict(lambdas=[1.0, 4.0], dtype=jnp.float64,
                liblinear_epsilon=1e-9)
    res_v = train_naive(keyed, NaiveConfig(flat_blocks=False, **base),
                        vocab=vocab)
    res_f = train_naive(keyed, NaiveConfig(flat_blocks=True, **base),
                        vocab=vocab)
    assert set(res_f.models) == set(res_v.models)
    for k in res_v.models:
        np.testing.assert_allclose(res_f.models[k].to_dense(vocab),
                                   res_v.models[k].to_dense(vocab),
                                   rtol=1e-3, atol=1e-6)


def test_naive_on_mesh_matches_single():
    from mlease_tpu.parallel import cpu_devices, make_mesh

    rng = np.random.default_rng(5)
    keyed = {str(i): synth_rows(rng, 60 + 10 * i) for i in range(3)}
    vocab = build_vocab([r for rows in keyed.values() for r in rows])
    # flat_blocks=False: the mesh path keeps the key batch axis, so the
    # single-device side must run the identical vmapped trajectory
    cfg = NaiveConfig(lambdas=[1.0, 4.0], dtype=jnp.float64,
                      flat_blocks=False)
    res_single = train_naive(keyed, cfg, vocab=vocab)
    mesh = make_mesh(cpu_devices())
    res_mesh = train_naive(keyed, cfg, vocab=vocab, mesh=mesh)
    assert set(res_mesh.models) == set(res_single.models)
    for k in res_single.models:
        np.testing.assert_allclose(res_mesh.models[k].to_dense(vocab),
                                   res_single.models[k].to_dense(vocab),
                                   rtol=1e-10, atol=1e-12)


def test_naive_intercept_key_redirects_unpenalized_variance():
    """intercept.key names WHICH feature gets the 1e5 prior variance
    (RegressionNaiveTrain.java:146,342): with a custom key, that feature is
    effectively unpenalized and the bias column is penalized at 1/lambda."""
    rng = np.random.default_rng(3)
    rows = []
    for _ in range(300):
        x = rng.normal(size=2)
        p = 1 / (1 + np.exp(-(2.0 * x[0] + 3.0)))  # strong f0 + intercept
        rows.append({"response": int(rng.random() < p),
                     "features": [("f0", float(x[0])), ("f1", float(x[1]))],
                     "weight": 1.0, "offset": 0.0})
    keyed = {"0": rows}
    lam = 50.0  # heavy shrinkage so the penalized/unpenalized gap is visible

    base = train_naive(keyed, NaiveConfig(lambdas=[lam], dtype=jnp.float64))
    redir = train_naive(keyed, NaiveConfig(lambdas=[lam], dtype=jnp.float64,
                                           intercept_key="f0"))
    mb = base.models["50.0#0"]
    mr = redir.models["50.0#0"]
    # base: bias unpenalized -> large intercept; redirected: f0 unpenalized
    # -> |f0 coef| grows, intercept shrinks toward the 1/lambda prior
    assert abs(mr.coefficients["f0"]) > abs(mb.coefficients["f0"])
    assert abs(mr.intercept) < abs(mb.intercept)
