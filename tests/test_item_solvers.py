"""Per-item solver equivalence: dense Newton-Cholesky vs TRON."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlease_tpu.train.item import ItemConfig, train_item_models

from test_admm import synth_rows


def test_item_solvers_agree():
    rng = np.random.default_rng(0)
    keyed = {f"it{i}": synth_rows(rng, 60 + 10 * i, n_feat=6)
             for i in range(4)}
    base = dict(intercept_lambdas=[1.0, 3.0], default_lambdas=[2.0],
                compute_var=True, dtype=jnp.float64,
                liblinear_epsilon=1e-5)
    r_chol = train_item_models(keyed, ItemConfig(solver="cholesky", **base))
    r_tron = train_item_models(keyed, ItemConfig(solver="tron", **base))
    assert set(r_chol.models) == set(r_tron.models)
    for key in r_chol.models:
        mc, mt = r_chol.models[key], r_tron.models[key]
        assert mc.intercept == pytest.approx(mt.intercept, abs=2e-4)
        for k in mt.coefficients:
            assert mc.coefficients[k] == pytest.approx(
                mt.coefficients[k], abs=2e-4)
        pc = r_chol.posterior_var[key]
        pt = r_tron.posterior_var[key]
        for k in pt.coefficients:
            assert pc.coefficients[k] == pytest.approx(
                pt.coefficients[k], rel=2e-3)


def test_unknown_solver_raises():
    with pytest.raises(ValueError, match="unknown solver"):
        train_item_models({"a": synth_rows(np.random.default_rng(0), 10)},
                          ItemConfig(solver="bogus"))
