"""Production-dtype (float32) end-to-end quality: the TPU default path must
converge to the same solution quality as the f64 reference math."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlease_tpu.core import build_vocab, pack_blocks, pack_rows
from mlease_tpu.ops import objective as obj
from mlease_tpu.ops.tron import tron
from mlease_tpu.train.admm import AdmmConfig, AdmmTrainer

from test_admm import synth_rows


def test_admm_f32_matches_f64():
    rng = np.random.default_rng(0)
    rows = synth_rows(rng, 500)
    test_rows = synth_rows(rng, 200)
    vocab = build_vocab(rows + test_rows)
    data = pack_blocks([rows[i::4] for i in range(4)], vocab)
    base = dict(lambdas=[1.0, 10.0], num_iters=15, regularizer=2,
                test_loglik_per_iter=True)
    r64 = AdmmTrainer(data, vocab, AdmmConfig(dtype=jnp.float64, **base),
                      test_rows=test_rows).run()
    r32 = AdmmTrainer(data, vocab, AdmmConfig(dtype=jnp.float32, **base),
                      test_rows=test_rows).run()
    # consensus coefficients agree to f32-appropriate tolerance
    np.testing.assert_allclose(r32.z, r64.z, atol=5e-4, rtol=5e-3)
    # held-out loglik trajectories agree closely
    for e32, e64 in zip(r32.sample_loglik_history, r64.sample_loglik_history):
        assert e32["testLoglik"] == pytest.approx(e64["testLoglik"], abs=2e-4)


def test_admm_bf16_data_runs():
    """bf16 data arrays with f32 state: must run and stay finite (perf mode
    for bandwidth-bound datasets; accuracy is dataset-dependent)."""
    rng = np.random.default_rng(1)
    rows = synth_rows(rng, 200)
    vocab = build_vocab(rows)
    data = pack_blocks([rows[i::2] for i in range(2)], vocab)
    cfg = AdmmConfig(lambdas=[1.0], num_iters=3, dtype=jnp.float32)
    r32 = AdmmTrainer(data, vocab, cfg).run()
    assert np.all(np.isfinite(r32.z))
