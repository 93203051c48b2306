"""Per-item trainer: grid training, posterior variance, bucketing."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlease_tpu.core import build_vocab, pack_rows, read_model_file
from mlease_tpu.io import avro
from mlease_tpu.io.records import INTERCEPT_NAME
from mlease_tpu.ops import objective as obj
from mlease_tpu.ops.tron import tron
from mlease_tpu.train.item import (ItemConfig, train_item_models,
                                   write_item_models)

from test_admm import synth_rows


def reference_fit(rows, il, dl, pm_intercept=0.0, lambda_map=None):
    """Direct fit replicating the per-item prior setup on a local problem."""
    vocab = build_vocab(rows)
    blk = pack_rows(rows, vocab)
    n = vocab.size
    pvi = np.full(n, dl)
    if lambda_map:
        for k, v in lambda_map.items():
            if k in vocab:
                pvi[vocab[k]] = v
    pvi[vocab.intercept_index] = il
    pm = np.zeros(n)
    pm[vocab.intercept_index] = pm_intercept
    prob = obj.make_problem(blk, pm, pvi, dtype=jnp.float64)
    scale = float(obj.class_balance_eps_scale(blk.y[None],
                                              np.array([blk.nrows]))[0])
    res = tron(prob, jnp.zeros(n, jnp.float64), eps=1e-5 * scale)
    w = np.asarray(res.w)
    hd = np.asarray(obj.hessian_diagonal(prob, jnp.asarray(w)))
    return vocab, w, 1.0 / hd


def test_item_grid_keys_and_values():
    rng = np.random.default_rng(0)
    keyed = {"itemA": synth_rows(rng, 60, n_feat=5),
             "itemB": synth_rows(rng, 200, n_feat=9)}  # different bucket
    cfg = ItemConfig(intercept_lambdas=[1.0, 5.0], default_lambdas=[2.0],
                     compute_var=True, dtype=jnp.float64,
                     liblinear_epsilon=1e-5)
    result = train_item_models(keyed, cfg)
    assert set(result.models) == {
        "1.0:2.0#itemA", "5.0:2.0#itemA", "1.0:2.0#itemB", "5.0:2.0#itemB"}

    for item in ("itemA", "itemB"):
        for il in (1.0, 5.0):
            vocab, w_ref, pvar_ref = reference_fit(keyed[item], il, 2.0)
            m = result.models[f"{il:.1f}:2.0#{item}"]
            got = m.to_dense(vocab)
            np.testing.assert_allclose(got, w_ref, rtol=1e-4, atol=1e-5)
            pv = result.posterior_var[f"{il:.1f}:2.0#{item}"]
            pv_dense = pv.to_dense(vocab)
            np.testing.assert_allclose(pv_dense, pvar_ref, rtol=1e-3,
                                       atol=1e-6)


def test_item_intercept_prior_mean_map():
    rng = np.random.default_rng(1)
    rows = [{"response": 1, "features": [], "weight": 0.0, "offset": 0.0}
            for _ in range(8)]  # zero-weight rows: posterior = prior
    keyed = {"camp1": rows, "camp2": rows}
    cfg = ItemConfig(intercept_lambdas=[2.0], default_lambdas=[2.0],
                     intercept_default_prior_mean=-1.0,
                     intercept_prior_mean_map={"camp2": 3.0},
                     dtype=jnp.float64)
    result = train_item_models(keyed, cfg)
    assert result.models["2.0:2.0#camp1"].intercept == pytest.approx(-1.0, abs=1e-8)
    assert result.models["2.0:2.0#camp2"].intercept == pytest.approx(3.0, abs=1e-8)


def test_item_lambda_map_absent_feature_prior_var():
    rng = np.random.default_rng(2)
    keyed = {"i": synth_rows(rng, 50, n_feat=4)}
    cfg = ItemConfig(intercept_lambdas=[1.0], default_lambdas=[1.0],
                     lambda_map={"not_in_data": 4.0}, compute_var=True,
                     dtype=jnp.float64)
    result = train_item_models(keyed, cfg)
    pv = result.posterior_var["1.0:1.0#i"]
    assert pv.coefficients["not_in_data"] == pytest.approx(0.25)


def test_item_full_cov_matches_diag():
    rng = np.random.default_rng(3)
    keyed = {"i": synth_rows(rng, 120, n_feat=6)}
    cfg_d = ItemConfig(intercept_lambdas=[1.0], default_lambdas=[2.0],
                       compute_var=True, dtype=jnp.float64)
    cfg_f = ItemConfig(intercept_lambdas=[1.0], default_lambdas=[2.0],
                       compute_var=True, full_cov=True, dtype=jnp.float64)
    r_d = train_item_models(keyed, cfg_d)
    r_f = train_item_models(keyed, cfg_f)
    key = "1.0:2.0#i"
    # full covariance diagonal >= 1/H_kk (Schur); same order of magnitude
    for name, v_diag in r_d.posterior_var[key].coefficients.items():
        v_full = r_f.posterior_var[key].coefficients[name]
        assert v_full >= v_diag * 0.999
    # covariance is symmetric
    cov = r_f.covariances[key]
    names = list(r_f.models[key].coefficients)[:3]
    for a in names:
        for b in names:
            assert cov[(a, b)] == pytest.approx(cov[(b, a)], rel=1e-8)


def test_item_write_avro(tmp_path):
    rng = np.random.default_rng(4)
    keyed = {"x": synth_rows(rng, 30, n_feat=3)}
    cfg = ItemConfig(intercept_lambdas=[1.0], default_lambdas=[1.0],
                     compute_var=True, dtype=jnp.float64)
    result = train_item_models(keyed, cfg)
    path = str(tmp_path / "item-models.avro")
    write_item_models(path, result)
    recs = avro.read_records(path)
    assert len(recs) == 1
    assert recs[0]["key"] == "1.0:1.0#x"
    assert any(f["name"] == INTERCEPT_NAME for f in recs[0]["model"])
    assert recs[0]["posteriorVar"]


def test_item_covariance_persistence(tmp_path):
    from mlease_tpu.train.item import (read_item_covariances,
                                       write_item_covariances)

    rng = np.random.default_rng(6)
    keyed = {"i": synth_rows(rng, 100, n_feat=5)}
    cfg = ItemConfig(intercept_lambdas=[1.0], default_lambdas=[2.0],
                     compute_var=True, full_cov=True, dtype=jnp.float64)
    result = train_item_models(keyed, cfg)
    path = str(tmp_path / "cov.avro")
    write_item_covariances(path, result)
    back = read_item_covariances(path)
    names, cov = back["1.0:2.0#i"]
    assert names[0] == INTERCEPT_NAME
    # symmetric PSD, diagonal matches the reported posterior variances
    np.testing.assert_allclose(cov, cov.T, atol=1e-6)
    assert np.all(np.linalg.eigvalsh(cov) > -1e-6)
    pv = result.posterior_var["1.0:2.0#i"]
    assert cov[0, 0] == pytest.approx(pv.intercept, rel=1e-4)
    for i, name in enumerate(names[1:], start=1):
        assert cov[i, i] == pytest.approx(pv.coefficients[name], rel=1e-4)


# ---------------------------------------------------------------------------
# columnar packing parity: pack_buckets_columnar must produce models identical
# to the per-record row-dict path for the same logical dataset
def _decoded_from_keyed(keyed):
    from mlease_tpu.io.fast_decode import DecodedRows

    names, index = [], {}
    response, weight, offset, keys = [], [], [], []
    row_start = [0]
    feat_id, feat_val = [], []
    for key in keyed:
        for row in keyed[key]:
            keys.append(key)
            response.append(row["response"])
            weight.append(row.get("weight", 1.0))
            offset.append(row.get("offset", 0.0))
            for name, v in row["features"]:
                gid = index.get(name)
                if gid is None:
                    gid = len(names)
                    index[name] = gid
                    names.append(name)
                feat_id.append(gid)
                feat_val.append(v)
            row_start.append(len(feat_id))
    return DecodedRows(
        response=np.asarray(response, np.int32),
        weight=np.asarray(weight, np.float32),
        offset=np.asarray(offset, np.float32),
        row_start=np.asarray(row_start, np.int64),
        feat_id=np.asarray(feat_id, np.int32),
        feat_val=np.asarray(feat_val, np.float32),
        vocab_names=names, keys=keys)


def test_item_columnar_parity():
    from mlease_tpu.train.item import train_item_models_columnar

    rng = np.random.default_rng(7)
    keyed = {"a": synth_rows(rng, 60, n_feat=5),
             "b": synth_rows(rng, 200, n_feat=9),
             "c": synth_rows(rng, 17, n_feat=3),
             "d": synth_rows(rng, 60, n_feat=5)}
    # exercise in-row duplicate combining + weights/offsets + empty rows
    keyed["a"][0]["features"].append(keyed["a"][0]["features"][0])
    keyed["b"][3]["weight"] = 2.5
    keyed["b"][4]["offset"] = -0.7
    keyed["c"][2]["features"] = []

    # tight inner tolerance: the two packings place features in different
    # k-slots (same math, different fp summation order), so loosely-converged
    # solves would differ by the convergence slack, not packing correctness
    cfg = ItemConfig(intercept_lambdas=[0.5, 2.0], default_lambdas=[1.0],
                     compute_var=True, lambda_map={"f1": 25.0},
                     intercept_prior_mean_map={"b": 0.3},
                     intercept_default_prior_mean=-0.1,
                     positive_weight=1.5, liblinear_epsilon=1e-10,
                     dtype=jnp.float64)
    r_rows = train_item_models(keyed, cfg)
    r_col = train_item_models_columnar(_decoded_from_keyed(keyed), cfg)

    assert set(r_rows.models) == set(r_col.models)
    for key, m in r_rows.models.items():
        mc = r_col.models[key]
        assert set(m.coefficients) == set(mc.coefficients)
        assert np.isclose(m.intercept, mc.intercept, rtol=1e-7, atol=1e-10)
        for name, v in m.coefficients.items():
            assert np.isclose(v, mc.coefficients[name], rtol=1e-7,
                              atol=1e-10), (key, name)
        pv, pvc = r_rows.posterior_var[key], r_col.posterior_var[key]
        assert np.isclose(pv.intercept, pvc.intercept, rtol=1e-6)
        for name, v in pv.coefficients.items():
            assert np.isclose(v, pvc.coefficients[name], rtol=1e-6), (key, name)


def test_item_mesh_parity():
    """Per-item solves sharded over the mesh item axis match single-device."""
    import jax

    from mlease_tpu.parallel import make_mesh
    from mlease_tpu.train.item import train_item_models

    rng = np.random.default_rng(13)
    keyed = {f"k{i}": synth_rows(rng, 40, n_feat=5) for i in range(10)}
    cfg = ItemConfig(intercept_lambdas=[1.0], default_lambdas=[1.0, 4.0],
                     compute_var=True, dtype=jnp.float64)
    r_plain = train_item_models(keyed, cfg)
    mesh = make_mesh(jax.devices("cpu"), n=4)
    r_mesh = train_item_models(keyed, cfg, mesh=mesh)
    assert set(r_plain.models) == set(r_mesh.models)
    for key, m in r_plain.models.items():
        mm = r_mesh.models[key]
        assert np.isclose(m.intercept, mm.intercept, rtol=1e-10)
        for name, v in m.coefficients.items():
            assert np.isclose(v, mm.coefficients[name], rtol=1e-10)
