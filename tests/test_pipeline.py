"""End-to-end pipeline on the reference's own example fixture
(examples/sample-data.avro + sample-config.job semantics) — the de-facto
smoke test of the reference (README.md:44-50, SURVEY.md section 4)."""

import json
import os

import numpy as np
import pytest

from mlease_tpu.core.linear_model import read_model_file
from mlease_tpu.io import avro
from mlease_tpu.utils.config import JobConfig


@pytest.fixture(scope="module")
def pipeline_result(tmp_path_factory):
    path = "/root/reference/examples/sample-data.avro"
    if not os.path.exists(path):
        pytest.skip("reference sample data not available")
    out = str(tmp_path_factory.mktemp("sample-out"))
    config = JobConfig({
        "input.paths": path,
        "output.base.path": out,
        "test.path": path,          # self-test, as the sample config reuses data
        "num.blocks": "5",
        "lambda": "1,10",
        "num.iters": "30",
        "regularizer": "2",
        "test.loglik.per.iter": "true",
        "force.output.overwrite": "true",
        "relaxation": "1.8",     # over-relaxed ADMM (framework extension)
        "dtype": "float64",
    })
    from mlease_tpu.train.pipeline import run_regression_pipeline

    result = run_regression_pipeline(config)
    return config, out, result


def test_pipeline_outputs_layout(pipeline_result):
    _config, out, result = pipeline_result
    assert os.path.exists(os.path.join(out, "tmp-data", "part-m-00000.avro"))
    assert os.path.exists(os.path.join(out, "lambda-rho", "part-r-00000.avro"))
    assert os.path.exists(os.path.join(out, "final-model", "part-r-00000.avro"))
    assert os.path.exists(os.path.join(out, "model-vocab.json"))
    assert os.path.isdir(os.path.join(out, "sample-test-loglik"))
    assert os.path.isdir(os.path.join(out, "checkpoint"))
    # best model written
    best_files = os.listdir(os.path.join(out, "best-model"))
    assert any(f.startswith("best-iteration-") for f in best_files)
    # test outputs per lambda + loglik
    for lam in ("1.0", "10.0"):
        assert os.path.exists(os.path.join(out, "test", f"lambda-{lam}",
                                           "part-r-00000.avro"))
        assert os.path.exists(os.path.join(out, "test", f"lambda-{lam}",
                                           "_loglik", "part-r-00000.avro"))


def test_pipeline_models_and_loglik_quality(pipeline_result):
    _config, out, result = pipeline_result
    models = read_model_file(os.path.join(out, "final-model"))
    assert set(models) == {"1.0", "10.0"}
    # loglik must beat the base-rate (intercept-only) model
    records = avro.read_records("/root/reference/examples/sample-data.avro")
    from mlease_tpu.io.records import normalize_row

    rows = [normalize_row(r) for r in records]
    p = np.mean([1 if r["response"] == 1 else 0 for r in rows])
    base_ll = p * np.log(p) + (1 - p) * np.log(1 - p)
    for lam in ("1.0", "10.0"):
        ll_rec = avro.read_records(
            os.path.join(out, "test", f"lambda-{lam}", "_loglik"))[0]
        assert ll_rec["key"] == "averageTestLoglik"
        assert ll_rec["testLoglik"] > base_ll
        assert ll_rec["count"] == pytest.approx(len(rows))
    # per-iteration loglik improved over iterations for lambda=1
    ll1 = [e["testLoglik"] for e in result.sample_loglik_history
           if e["lambda"] == "1.0"]
    assert ll1[-1] >= ll1[0]


def test_pipeline_scored_output_sorted_with_pred(pipeline_result):
    _config, out, _result = pipeline_result
    recs = avro.read_records(os.path.join(out, "test", "lambda-1.0",
                                          "part-r-00000.avro"))
    preds = [r["pred"] for r in recs]
    assert preds == sorted(preds)
    assert len(recs) == 1000
    # passthrough fields intact
    assert "features" in recs[0] and "response" in recs[0]


def test_pipeline_matches_global_fit(pipeline_result):
    """5-block consensus ~= single-machine fit on the same objective."""
    import jax.numpy as jnp

    from mlease_tpu.core import build_vocab, pack_rows
    from mlease_tpu.core.vocab import FeatureVocab
    from mlease_tpu.io.records import normalize_row
    from mlease_tpu.ops import objective as obj
    from mlease_tpu.ops.tron import tron

    _config, out, result = pipeline_result
    records = avro.read_records("/root/reference/examples/sample-data.avro")
    rows = [normalize_row(r) for r in records]
    vocab = FeatureVocab.load(os.path.join(out, "model-vocab.json"))
    blk = pack_rows(rows, vocab)
    lam = 1.0
    pvi = np.full(vocab.size, lam)
    pvi[vocab.intercept_index] = 1e-6  # unpenalized intercept
    prob = obj.make_problem(blk, np.zeros(vocab.size), pvi, dtype=jnp.float64)
    w_global = np.asarray(
        tron(prob, jnp.zeros(vocab.size, jnp.float64), eps=1e-8).w)
    w_admm = result.models["1.0"].to_dense(vocab)
    # "theoretically close to what you would have obtained ... on a single
    # machine" (README.md:42) — with over-relaxation (alpha=1.8) the
    # coefficients are close after 30 iterations on this 5-block split
    err = np.abs(w_admm - w_global).max()
    assert err < 0.05, err
    # and the held-out (self) loglik matches the global fit tightly

    def loglik(w):
        s = np.asarray(obj.scores(prob, jnp.asarray(w)))
        y = np.asarray(prob.y)
        wt = np.asarray(prob.weight)
        return float(np.sum(-np.logaddexp(0, -y * s) * wt) / np.sum(wt))

    assert abs(loglik(w_admm) - loglik(w_global)) < 2e-3


def test_pipeline_resume(pipeline_result, tmp_path):
    """Crash-resume from checkpoints continues without redoing iterations."""
    config, out, result = pipeline_result
    cfg2 = JobConfig(config)
    cfg2["force.output.overwrite"] = "false"
    cfg2["resume"] = "true"
    cfg2["num.iters"] = str(result.iterations + 2)
    from mlease_tpu.train.pipeline import run_regression_pipeline

    result2 = run_regression_pipeline(cfg2)
    # resumed run starts after the checkpointed iteration
    assert result2.iterations >= result.iterations
    assert np.all(np.isfinite(result2.z))


def test_pipeline_click_replication_e2e(tmp_path):
    """num.click.replicates end-to-end: positives replicated across
    consecutive blocks with weight/n, total positive weight preserved, and
    the trained model close to the unreplicated one (replication only
    redistributes positives across blocks)."""
    import jax.numpy as jnp

    from mlease_tpu.io import avro as avro_mod, schemas
    from mlease_tpu.train.pipeline import run_regression_pipeline

    rng = np.random.default_rng(0)
    recs = []
    for _ in range(300):
        nnz = int(rng.integers(1, 4))
        feats = [{"name": f"f{int(j)}", "term": "", "value": float(rng.normal())}
                 for j in rng.choice(8, nnz, replace=False)]
        score = sum(f["value"] for f in feats)
        recs.append({"key": "", "response": int(rng.random() < 1 / (1 + np.exp(-score))),
                     "features": feats, "weight": 1.0, "offset": 0.0})
    data = str(tmp_path / "cr.avro")
    avro_mod.write_records(data, schemas.REGRESSION_PREPARE_OUTPUT, recs)

    def run(replicates, out):
        cfg = JobConfig({
            "input.paths": data, "output.base.path": str(tmp_path / out),
            "num.blocks": "4", "lambda": "1", "num.iters": "25",
            "regularizer": "2", "num.click.replicates": str(replicates),
            "force.output.overwrite": "true", "dtype": "float64",
            "relaxation": "1.7",
        })
        return run_regression_pipeline(cfg)

    res1 = run(1, "o1")
    res2 = run(2, "o2")
    # prepared rows: replicated positives at weight 1/2
    prep = avro.read_records(str(tmp_path / "o2" / "tmp-data"))
    pos = [r for r in prep if r["response"] == 1]
    assert pos and all(abs(r["weight"] - 0.5) < 1e-6 for r in pos)
    n_pos_orig = sum(1 for r in recs if r["response"] == 1)
    assert len(pos) == 2 * n_pos_orig
    # consensus solutions close (same global objective, different partition)
    np.testing.assert_allclose(res2.z, res1.z, atol=0.06)


def test_pipeline_use_mesh_config(tmp_path):
    """use.mesh=true shards over all (virtual CPU) devices; same results."""
    from mlease_tpu.io import avro as avro_mod, schemas
    from mlease_tpu.train.pipeline import run_regression_pipeline

    rng = np.random.default_rng(4)
    recs = []
    for _ in range(160):
        feats = [{"name": f"f{int(j)}", "term": "", "value": 1.0}
                 for j in rng.choice(6, 2, replace=False)]
        recs.append({"key": "", "response": int(rng.integers(0, 2)),
                     "features": feats, "weight": 1.0, "offset": 0.0})
    data = str(tmp_path / "m.avro")
    avro_mod.write_records(data, schemas.REGRESSION_PREPARE_OUTPUT, recs)

    def cfg(out, use_mesh):
        # flat.blocks=false: the mesh path keeps the block batch axis, so
        # the single-device side must run the identical vmapped trajectory
        return JobConfig({
            "input.paths": data, "output.base.path": str(tmp_path / out),
            "num.blocks": "4", "lambda": "1", "num.iters": "4",
            "regularizer": "2", "force.output.overwrite": "true",
            "use.mesh": str(use_mesh).lower(), "dtype": "float64",
            "flat.blocks": "false"})

    res_plain = run_regression_pipeline(cfg("p", False))
    res_mesh = run_regression_pipeline(cfg("m", True))
    np.testing.assert_allclose(res_mesh.z, res_plain.z, rtol=1e-12,
                               atol=1e-12)


def test_pipeline_streaming_groups(tmp_path):
    """streaming.groups=2 (the >HBM mode) through the pipeline CLI surface:
    same final models as the in-memory run, same output layout."""
    path = "/root/reference/examples/sample-data.avro"
    if not os.path.exists(path):
        pytest.skip("reference sample data not available")
    from mlease_tpu.train.pipeline import run_regression_pipeline

    base = {
        "input.paths": path,
        "test.path": path,
        "num.blocks": "4",
        "lambda": "1,10",
        "num.iters": "4",
        "regularizer": "2",
        "test.loglik.per.iter": "true",
        "force.output.overwrite": "true",
        "dtype": "float64",
        "multi.rhs": "false",
        "prepare.seed": "7",
    }
    out_mem = str(tmp_path / "mem")
    out_str = str(tmp_path / "stream")
    res_mem = run_regression_pipeline(
        JobConfig({**base, "output.base.path": out_mem}))
    res_str = run_regression_pipeline(
        JobConfig({**base, "output.base.path": out_str,
                   "streaming.groups": "2"}))

    np.testing.assert_allclose(res_str.z, res_mem.z, rtol=1e-9, atol=1e-11)
    assert res_str.best_lambda == res_mem.best_lambda
    assert np.isclose(res_str.best_loglik, res_mem.best_loglik, rtol=1e-9)
    m_mem = read_model_file(os.path.join(out_mem, "final-model"))
    m_str = read_model_file(os.path.join(out_str, "final-model"))
    assert set(m_mem) == set(m_str)
    assert os.path.isdir(os.path.join(out_str, "sample-test-loglik"))
    best_files = os.listdir(os.path.join(out_str, "best-model"))
    assert any(f.startswith("best-iteration-") for f in best_files)


def test_pipeline_write_train_output(tmp_path):
    """write.train.output=true dumps iter-i/model in the reference's
    RegressionTrainOutput wire format (RegressionAdmmTrain.java:707-711):
    key="lambda#part", model=x_b, uplusx=u_b+x_b — verified by recomputing
    the consensus z-update from the dumped uplusx vectors."""
    path = "/root/reference/examples/sample-data.avro"
    if not os.path.exists(path):
        pytest.skip("reference sample data not available")
    import jax.numpy as jnp

    from mlease_tpu.core.linear_model import LinearModel
    from mlease_tpu.core.vocab import FeatureVocab
    from mlease_tpu.ops import admm_math
    from mlease_tpu.train.pipeline import run_regression_pipeline

    out = str(tmp_path / "dump")
    nblocks, lam = 3, 1.0
    cfg = JobConfig({
        "input.paths": path, "output.base.path": out,
        "num.blocks": str(nblocks), "lambda": "1", "num.iters": "3",
        "regularizer": "2", "force.output.overwrite": "true",
        "write.train.output": "true", "remove.tmp.dir": "false",
        "dtype": "float64",
    })
    result = run_regression_pipeline(cfg)
    vocab = FeatureVocab.load(os.path.join(out, "model-vocab.json"))

    last = result.iterations
    recs = list(avro.read_records(
        os.path.join(out, f"iter-{last}", "model", "part-r-00000.avro")))
    assert len(recs) == nblocks
    assert {r["key"] for r in recs} == {f"1.0#{b}" for b in range(nblocks)}

    # z_last = kappa * mean_b(uplusx) with kappa = N*rho/(lambda + N*rho)
    v = np.zeros(vocab.size)
    for r in recs:
        v += LinearModel.from_avro(r["uplusx"]).to_dense(vocab)
    v /= nblocks
    lam_vec = np.full(vocab.size, lam)
    z_ref = np.asarray(admm_math.z_update_l2(
        jnp.asarray(v), jnp.asarray(lam_vec), 1.0, nblocks,
        vocab.intercept_index, False))
    # tolerance set by the wire format: feature values are Avro float (f32),
    # same as the reference's feature.avsc
    np.testing.assert_allclose(z_ref, result.z[0], rtol=1e-5, atol=1e-7)
    # remove.tmp.dir=false keeps every iteration dir
    for it in range(1, last + 1):
        assert os.path.isdir(os.path.join(out, f"iter-{it}"))


def test_lambda_path_extension_warm_start(tmp_path):
    """init.model.path warm-starts a widened lambda path from a previous
    run's final-model: each new lambda inits from the nearest log-lambda
    model (exact-key match wins), measurably closer to the solution than a
    zero init on iteration 1."""
    from mlease_tpu.train.pipeline import (_nearest_lambda_model,
                                           run_regression_pipeline)

    path = "/root/reference/examples/sample-data.avro"
    if not os.path.exists(path):
        pytest.skip("reference sample data not available")

    def cfg(out, lambdas, iters, **extra):
        base = {
            "input.paths": path, "output.base.path": str(tmp_path / out),
            "num.blocks": "4", "lambda": lambdas, "num.iters": str(iters),
            "regularizer": "2",
            "force.output.overwrite": "true", "dtype": "float64"}
        base.update(extra)
        return JobConfig(base)

    run_regression_pipeline(cfg("a", "1,100", 20))
    warm = run_regression_pipeline(cfg(
        "b", "1,10,100", 5,
        **{"init.model.path": str(tmp_path / "a" / "final-model")}))
    cold = run_regression_pipeline(cfg("c", "1,10,100", 5))
    # iteration-1 movement from a warm init is far smaller than from zero
    # for every lambda (exact matches 1/100 and the log-nearest init for 10)
    w1 = np.array(list(warm.diff_history[0].values()))
    c1 = np.array(list(cold.diff_history[0].values()))
    assert (w1 < 0.75 * c1).all(), (w1, c1)

    # helper semantics: exact match beats log-nearest; non-float keys skipped
    models = {"1.0": "m1", "10.0": "m10", "junk#key": "bad"}
    assert _nearest_lambda_model(1.0, models) == "m1"
    assert _nearest_lambda_model(3.0, models) == "m1"     # log-nearer to 1
    assert _nearest_lambda_model(4.0, models) == "m10"    # log-nearer to 10


def test_pipeline_write_train_output_streaming(tmp_path):
    """write.train.output in STREAMING mode (streaming.groups=2) dumps the
    same RegressionTrainOutput wire format as the in-memory path, verified
    by recomputing the consensus z-update from the dumped uplusx vectors
    (RegressionAdmmTrain.java:707-711 writes this state per iteration from
    precisely the >HBM-scale runs streaming mode serves)."""
    path = "/root/reference/examples/sample-data.avro"
    if not os.path.exists(path):
        pytest.skip("reference sample data not available")
    import jax.numpy as jnp

    from mlease_tpu.core.linear_model import LinearModel
    from mlease_tpu.core.vocab import FeatureVocab
    from mlease_tpu.ops import admm_math
    from mlease_tpu.train.pipeline import run_regression_pipeline

    out = str(tmp_path / "sdump")
    nblocks, lam = 4, 1.0
    cfg = JobConfig({
        "input.paths": path, "output.base.path": out,
        "num.blocks": str(nblocks), "lambda": "1", "num.iters": "3",
        "regularizer": "2", "force.output.overwrite": "true",
        "write.train.output": "true", "remove.tmp.dir": "false",
        "streaming.groups": "2", "dtype": "float64",
    })
    result = run_regression_pipeline(cfg)
    vocab = FeatureVocab.load(os.path.join(out, "model-vocab.json"))

    last = result.iterations
    recs = list(avro.read_records(
        os.path.join(out, f"iter-{last}", "model", "part-r-00000.avro")))
    assert len(recs) == nblocks
    assert {r["key"] for r in recs} == {f"1.0#{b}" for b in range(nblocks)}

    v = np.zeros(vocab.size)
    for r in recs:
        v += LinearModel.from_avro(r["uplusx"]).to_dense(vocab)
    v /= nblocks
    lam_vec = np.full(vocab.size, lam)
    z_ref = np.asarray(admm_math.z_update_l2(
        jnp.asarray(v), jnp.asarray(lam_vec), 1.0, nblocks,
        vocab.intercept_index, False))
    np.testing.assert_allclose(z_ref, result.z[0], rtol=1e-5, atol=1e-7)
    # checkpoints exist too (streaming resume state)
    assert os.path.isdir(os.path.join(out, "checkpoint"))


def test_pipeline_pack_cache_roundtrip(tmp_path, caplog):
    """pack.cache.dir: the second run loads the cached hybrid groups
    (ingest/pack skipped) and produces a bit-identical result; a changed
    layout knob invalidates the manifest."""
    path = "/root/reference/examples/sample-data.avro"
    if not os.path.exists(path):
        pytest.skip("reference sample data not available")
    import logging

    from mlease_tpu.train.pipeline import run_regression_pipeline

    cache = str(tmp_path / "pcache")
    base = {
        "input.paths": path,
        "test.path": path,
        "num.blocks": "4",
        "streaming.groups": "2",
        "head.size": "8",
        "head.dtype": "bfloat16",
        "lambda": "1,10",
        "num.iters": "3",
        "regularizer": "2",
        "force.output.overwrite": "true",
        "dtype": "float64",
        "prepare.seed": "7",
        "pack.cache.dir": cache,
    }
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    res1 = run_regression_pipeline(
        JobConfig({**base, "output.base.path": out1}))
    assert os.path.exists(os.path.join(cache, "manifest.json"))

    with caplog.at_level(logging.INFO, logger="mlease_tpu.train.pipeline"):
        res2 = run_regression_pipeline(
            JobConfig({**base, "output.base.path": out2}))
    assert any("pack cache hit" in r.message for r in caplog.records)
    np.testing.assert_array_equal(np.asarray(res1.z), np.asarray(res2.z))
    assert res1.best_loglik == res2.best_loglik

    # a layout knob change must invalidate (head size shapes the cache)
    from mlease_tpu.io import pack_cache
    man = pack_cache.build_manifest(
        [path], nblocks=4, n_groups=2, head_size=16, head_dtype="bfloat16",
        num_click_replicates=1, seed=7, binary_feature=False)
    assert pack_cache.load_groups(cache, man) is None


def test_pack_cache_bf16_roundtrip(tmp_path):
    """bfloat16 arrays survive the uint16-view npz round trip exactly."""
    import jax.numpy as jnp

    from mlease_tpu.core import build_vocab, pack_blocks
    from mlease_tpu.core.dataset import to_hybrid
    from mlease_tpu.io import pack_cache
    from test_admm import synth_rows

    rng = np.random.default_rng(31)
    rows = synth_rows(rng, 120)
    vocab = build_vocab(rows)
    g = to_hybrid(pack_blocks([rows[:60], rows[60:]], vocab), 4,
                  head_dtype=jnp.bfloat16)
    man = pack_cache.build_manifest([], nblocks=2, n_groups=1, head_size=4,
                                    head_dtype="bfloat16",
                                    num_click_replicates=1, seed=0,
                                    binary_feature=False)
    pack_cache.save_groups(str(tmp_path), man, [g], vocab)
    loaded = pack_cache.load_groups(str(tmp_path), man)
    assert loaded is not None
    g2 = loaded[0][0]
    assert g2.head.dtype == g.head.dtype
    np.testing.assert_array_equal(np.asarray(g2.head, np.float32),
                                  np.asarray(g.head, np.float32))
    for f in ("indices", "values", "y", "tail_rows", "tail_c_vals"):
        np.testing.assert_array_equal(getattr(g2, f), getattr(g, f))


def test_pack_cache_map_key_invalidates_and_corruption_rebuilds(tmp_path):
    """map.key shapes row-to-block assignment, so it must key the manifest
    (ADVICE r4 medium); a truncated/garbage group npz or vocab must return
    None (rebuild), never crash the job."""
    import jax.numpy as jnp

    from mlease_tpu.core import build_vocab, pack_blocks
    from mlease_tpu.core.dataset import to_hybrid
    from mlease_tpu.io import pack_cache
    from test_admm import synth_rows

    rng = np.random.default_rng(5)
    rows = synth_rows(rng, 80)
    vocab = build_vocab(rows)
    g = to_hybrid(pack_blocks([rows[:40], rows[40:]], vocab), 4,
                  head_dtype=jnp.bfloat16)

    def man(mk):
        return pack_cache.build_manifest(
            [], nblocks=2, n_groups=1, head_size=4, head_dtype="bfloat16",
            num_click_replicates=1, seed=0, binary_feature=False,
            map_key=mk)

    cache = str(tmp_path / "c")
    pack_cache.save_groups(cache, man("memberId"), [g], vocab)
    assert pack_cache.load_groups(cache, man("memberId")) is not None
    # different (or absent) map.key over identical inputs must MISS
    assert pack_cache.load_groups(cache, man("")) is None
    assert pack_cache.load_groups(cache, man("itemId")) is None

    # corrupt group file: truncate mid-archive
    gpath = os.path.join(cache, "group-0.npz")
    blob = open(gpath, "rb").read()
    open(gpath, "wb").write(blob[: len(blob) // 3])
    assert pack_cache.load_groups(cache, man("memberId")) is None
    # restore group, corrupt vocab instead
    open(gpath, "wb").write(blob)
    assert pack_cache.load_groups(cache, man("memberId")) is not None
    open(os.path.join(cache, "vocab.json"), "w").write("{not json")
    assert pack_cache.load_groups(cache, man("memberId")) is None
    # missing __meta key in an otherwise-valid npz
    np.savez(gpath, indices=np.zeros((1, 2, 2), np.int32))
    assert pack_cache.load_groups(cache, man("memberId")) is None
