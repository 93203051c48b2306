"""Feature-sharded (model-parallel) consensus ADMM: must match the plain
trainer, which itself matches the reference semantics (tests/test_admm.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mlease_tpu.core import build_vocab, pack_blocks
from mlease_tpu.core.feature_shard import (shard_feature_vector,
                                           shard_features,
                                           unshard_feature_vector)
from mlease_tpu.parallel import cpu_devices
from mlease_tpu.parallel.mesh import make_mesh_2d
from mlease_tpu.train.admm import AdmmConfig, AdmmTrainer
from mlease_tpu.train.feature_sharded import FeatureShardedAdmmTrainer

from test_admm import synth_rows


def test_shard_roundtrip_vectors():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(3, 11))
    for S in (1, 2, 4, 5):
        nl = (11 + S - 1) // S
        fs = shard_feature_vector(v, S, nl)
        assert fs.shape == (S, 3, nl)
        # round-robin placement: global g lives at (g % S, g // S)
        for g in range(11):
            np.testing.assert_array_equal(fs[g % S, :, g // S], v[:, g])
        np.testing.assert_array_equal(unshard_feature_vector(fs, 11), v)


def test_shard_features_matvec_identity():
    """Sharded partial Xv summed over shards == dense Xv with global ids."""
    rng = np.random.default_rng(1)
    rows = synth_rows(rng, 60)
    vocab = build_vocab(rows)
    data = pack_blocks([rows[:30], rows[30:]], vocab)
    n = data.dim
    w = rng.normal(size=n)

    dense = np.zeros((data.nblocks, data.indices.shape[1]))
    for b in range(data.nblocks):
        dense[b] = (data.values[b] * w[data.indices[b]]).sum(axis=-1)

    for S in (2, 3):
        fs = shard_features(data, S)
        w_fs = shard_feature_vector(w, S, fs.n_local)
        acc = np.zeros_like(dense)
        for s in range(S):
            acc += (fs.values[s] * w_fs[s][fs.indices[s]]).sum(axis=-1)
        np.testing.assert_allclose(acc, dense, rtol=1e-12, atol=1e-12)
        # presence mask survives the shuffle
        np.testing.assert_array_equal(
            unshard_feature_vector(fs.present, n), data.present)


@pytest.mark.parametrize("grid", [(2, 4), (4, 2), (1, 8), (8, 1)])
def test_feature_sharded_matches_plain(grid):
    db, df = grid
    rng = np.random.default_rng(2)
    rows = synth_rows(rng, 240)
    vocab = build_vocab(rows)
    data = pack_blocks([rows[i::3] for i in range(3)], vocab)
    # flat_blocks=False: the FS trainer runs block-batched shard_map solves;
    # the plain side must follow the identical vmapped trajectory
    base = dict(lambdas=[1.0, 10.0], num_iters=5, dtype=jnp.float64,
                multi_rhs=True, pcg=True, flat_blocks=False)
    res_plain = AdmmTrainer(data, vocab, AdmmConfig(**base)).run()

    mesh = make_mesh_2d(cpu_devices(), block=db, feat=df)
    res_fs = FeatureShardedAdmmTrainer(
        data, vocab, AdmmConfig(**base), mesh=mesh).run()

    np.testing.assert_allclose(res_fs.z, res_plain.z, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(res_fs.u, res_plain.u, rtol=1e-8, atol=1e-10)
    assert res_fs.iterations == res_plain.iterations
    for d_fs, d_pl in zip(res_fs.diff_history, res_plain.diff_history):
        for k in d_pl:
            assert d_fs[k] == pytest.approx(d_pl[k], rel=1e-8, abs=1e-12)


def test_feature_sharded_l1_and_lambda_map():
    rng = np.random.default_rng(3)
    rows = synth_rows(rng, 200)
    vocab = build_vocab(rows)
    data = pack_blocks([rows[:100], rows[100:]], vocab)
    some_key = next(k for k in vocab.names if k != "(INTERCEPT)")
    base = dict(lambdas=[0.5, 4.0], num_iters=4, dtype=jnp.float64,
                regularizer=1, lambda_map={some_key: 25.0},
                multi_rhs=True, pcg=True, flat_blocks=False)
    res_plain = AdmmTrainer(data, vocab, AdmmConfig(**base)).run()
    mesh = make_mesh_2d(cpu_devices(), block=2, feat=4)
    res_fs = FeatureShardedAdmmTrainer(
        data, vocab, AdmmConfig(**base), mesh=mesh).run()
    np.testing.assert_allclose(res_fs.z, res_plain.z, rtol=1e-9, atol=1e-11)


def test_pipeline_feature_shards_key(tmp_path):
    """mesh.feature.shards job key: pipeline output parity with the plain
    single-mesh run on the reference sample fixture."""
    import os

    from mlease_tpu.core.linear_model import read_model_file
    from mlease_tpu.train.pipeline import run_regression_pipeline
    from mlease_tpu.utils.config import JobConfig

    path = "/root/reference/examples/sample-data.avro"
    if not os.path.exists(path):
        pytest.skip("reference sample data not available")
    base = {
        "input.paths": path, "num.blocks": "4", "lambda": "1,10",
        "num.iters": "4", "regularizer": "2", "dtype": "float64",
        "force.output.overwrite": "true", "flat.blocks": "false",
    }
    out_a = str(tmp_path / "plain")
    out_b = str(tmp_path / "fs")
    run_regression_pipeline(JobConfig(base | {"output.base.path": out_a}))
    run_regression_pipeline(JobConfig(
        base | {"output.base.path": out_b, "mesh.feature.shards": "4"}))
    m_a = read_model_file(os.path.join(out_a, "final-model"))
    m_b = read_model_file(os.path.join(out_b, "final-model"))
    assert set(m_a) == set(m_b)
    for k in m_a:
        assert m_b[k].intercept == pytest.approx(m_a[k].intercept, rel=1e-8)
        for feat, w in m_a[k].coefficients.items():
            assert m_b[k].coefficients[feat] == pytest.approx(
                w, rel=1e-7, abs=1e-10)


def test_feature_sharded_loglik_and_best_model():
    rng = np.random.default_rng(4)
    rows = synth_rows(rng, 260)
    train_rows, test_rows = rows[:200], rows[200:]
    vocab = build_vocab(train_rows)
    data = pack_blocks([train_rows[:100], train_rows[100:]], vocab)
    base = dict(lambdas=[1.0, 100.0], num_iters=4, dtype=jnp.float64,
                test_loglik_per_iter=True, multi_rhs=True, pcg=True,
                flat_blocks=False)
    res_plain = AdmmTrainer(data, vocab, AdmmConfig(**base),
                            test_rows=test_rows).run()
    mesh = make_mesh_2d(cpu_devices(), block=2, feat=4)
    res_fs = FeatureShardedAdmmTrainer(
        data, vocab, AdmmConfig(**base), test_rows=test_rows,
        mesh=mesh).run()
    assert res_fs.best_lambda == res_plain.best_lambda
    assert res_fs.best_loglik == pytest.approx(res_plain.best_loglik,
                                               rel=1e-9)
    assert len(res_fs.sample_loglik_history) == \
        len(res_plain.sample_loglik_history)
    for a, b in zip(res_fs.sample_loglik_history,
                    res_plain.sample_loglik_history):
        assert a["lambda"] == b["lambda"] and a["iter"] == b["iter"]
        assert a["testLoglik"] == pytest.approx(b["testLoglik"], rel=1e-9)
