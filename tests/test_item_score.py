"""Per-item scoring: vectorized batch scorer + hash-sharded model loading
(reference: ItemModelTest.java:136-212, ReadLinearModelConsumer.java:56-82)."""

import numpy as np
import pytest

from mlease_tpu.core.linear_model import LinearModel, write_model_file
from mlease_tpu.eval.item_score import (
    aggregate_item_loglik, item_shard, java_string_hash,
    read_model_file_sharded, run_item_model_test,
    run_item_model_test_sharded, score_item_batch, score_item_records)
from mlease_tpu.io import avro
from mlease_tpu.io.records import normalize_row


def test_java_string_hash_known_values():
    # values computed by Java String.hashCode
    assert java_string_hash("") == 0
    assert java_string_hash("a") == 97
    assert java_string_hash("abc") == 96354
    assert java_string_hash("hello") == 99162322
    assert java_string_hash("Aa") == java_string_hash("BB") == 2112
    # int32 wraparound to negative
    assert java_string_hash("polygenelubricants") == -2147483648


def test_item_shard_range():
    for item in ["item0", "item1", "x", "polygenelubricants", "日本語"]:
        s = item_shard(item, 7)
        assert 0 <= s < 7


def _mk_models():
    return {
        "1.0#itemA": LinearModel({"f1": 0.5, "f2": -1.0}, intercept=0.3),
        "1.0#itemB": LinearModel({"f1": 2.0}, intercept=-0.7),
        "2.0#itemA": LinearModel({"f2": 1.5}, intercept=0.0),
        # itemC intentionally has no model for prefix 1.0
        "2.0#itemC": LinearModel({"f3": 4.0}, intercept=1.0),
    }


def _mk_records():
    return [
        {"itemId": "itemA", "response": 1, "weight": 1.0, "offset": 0.1,
         "features": [{"name": "f1", "term": "", "value": 2.0},
                      {"name": "f2", "term": "", "value": 1.0}]},
        {"itemId": "itemB", "response": 0, "weight": 2.0, "offset": 0.0,
         "features": [{"name": "f1", "term": "", "value": -1.0}]},
        {"itemId": "itemC", "response": 1, "weight": 1.0, "offset": -0.2,
         "features": [{"name": "f3", "term": "", "value": 0.5},
                      {"name": "f9", "term": "", "value": 9.0}]},  # unknown feat
        {"itemId": "itemA", "response": 0, "weight": 1.0, "offset": 0.0,
         "features": []},
    ]


def test_vectorized_matches_scalar_eval():
    """score_item_batch == the scalar LinearModel.eval_instance path."""
    models = _mk_models()
    records = _mk_records()
    prefixes = ["1.0", "2.0"]
    rows = [normalize_row(r) for r in records]
    items = [r["itemId"] for r in records]

    preds = score_item_batch(models, rows, items, prefixes)
    empty = LinearModel()
    for i, row in enumerate(rows):
        for p, prefix in enumerate(prefixes):
            m = models.get(f"{prefix}#{items[i]}", empty)
            expect = m.eval_instance(row, loglik=False)
            assert preds[i, p] == pytest.approx(expect, abs=1e-12)


def test_score_item_records_output_shape():
    scored = score_item_records(_mk_models(), _mk_records(),
                                item_key="itemId",
                                model_prefixes=["1.0", "2.0"])
    assert len(scored) == 4
    assert set(scored[0]["pred"]) == {"1.0", "2.0"}
    # missing model for (1.0, itemC): pred = offset
    assert scored[2]["pred"]["1.0"] == pytest.approx(-0.2, abs=1e-6)


def test_sharded_loading_partition_is_exact(tmp_path):
    models = _mk_models()
    path = str(tmp_path / "models.avro")
    write_model_file(path, models)

    nshards = 3
    seen = {}
    for k in range(nshards):
        shard = read_model_file_sharded(path, shard=k, nshards=nshards)
        for key, model in shard.items():
            assert key not in seen, "model in two shards"
            seen[key] = model
            item = key.split("#")[1]
            assert item_shard(item, nshards) == k
    assert set(seen) == set(models)

    # lambda_prefix filter (ReadLinearModelConsumer lambdaStr contains-check)
    only1 = read_model_file_sharded(path, lambda_prefix="1.0#")
    assert set(only1) == {"1.0#itemA", "1.0#itemB"}


def test_sharded_run_matches_unsharded(tmp_path):
    models = _mk_models()
    mpath = str(tmp_path / "models.avro")
    write_model_file(mpath, models)
    records = _mk_records()
    schema = {
        "type": "record", "name": "row", "fields": [
            {"name": "itemId", "type": "string"},
            {"name": "response", "type": "int"},
            {"name": "weight", "type": "float"},
            {"name": "offset", "type": "float"},
            {"name": "features", "type": {"type": "array", "items": {
                "type": "record", "name": "feature", "fields": [
                    {"name": "name", "type": "string"},
                    {"name": "term", "type": "string"},
                    {"name": "value", "type": "float"}]}}},
        ]}

    base = run_item_model_test(records, schema, models,
                               str(tmp_path / "pred0.avro"),
                               item_key="itemId",
                               model_prefixes=["1.0", "2.0"])
    shd = run_item_model_test_sharded(records, schema, mpath,
                                      str(tmp_path / "pred1.avro"),
                                      item_key="itemId",
                                      model_prefixes=["1.0", "2.0"],
                                      nshards=3)
    assert len(base) == len(shd)
    for a, b in zip(base, shd):
        assert a["pred"] == b["pred"]

    # prefix auto-discovery from the model file
    auto = run_item_model_test_sharded(records, schema, mpath,
                                       str(tmp_path / "pred2.avro"),
                                       item_key="itemId", nshards=2)
    assert set(auto[0]["pred"]) == {"1.0", "2.0"}

    # output files decode and carry pred maps
    recs = avro.read_records(str(tmp_path / "pred1.avro"))
    assert len(recs) == len(records)
    assert set(recs[0]["pred"]) == {"1.0", "2.0"}


def test_aggregate_item_loglik_extreme_preds_no_overflow():
    """|pred| ~ 1000 must not overflow to inf (np.exp overflow guard)."""
    recs = [
        {"response": 1, "weight": 1.0, "pred": {"1.0": -1000.0}},
        {"response": 0, "weight": 1.0, "pred": {"1.0": 1000.0}},
    ]
    agg = aggregate_item_loglik(recs)
    assert len(agg) == 1
    assert np.isfinite(agg[0]["testLoglik"])
    assert agg[0]["testLoglik"] == pytest.approx(-1000.0, rel=1e-6)


def test_large_batch_no_per_record_python(monkeypatch):
    """10K records x 2 prefixes scores through the vectorized path; guard
    that eval_instance is NOT called per record."""
    calls = {"n": 0}
    orig = LinearModel.eval_instance

    def counting(self, *a, **k):
        calls["n"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(LinearModel, "eval_instance", counting)

    rng = np.random.default_rng(0)
    models = {}
    for i in range(200):
        models[f"1.0#it{i}"] = LinearModel(
            {f"f{j}": float(rng.normal()) for j in range(5)},
            intercept=float(rng.normal()))
    records = []
    for r in range(10_000):
        it = f"it{int(rng.integers(0, 250))}"   # some items modelless
        records.append({
            "itemId": it, "response": int(rng.integers(0, 2)),
            "weight": 1.0, "offset": 0.0,
            "features": [{"name": f"f{int(j)}", "term": "",
                          "value": float(rng.normal())}
                         for j in rng.choice(5, size=3, replace=False)]})
    scored = score_item_records(models, records, item_key="itemId",
                                model_prefixes=["1.0"])
    assert len(scored) == 10_000
    assert calls["n"] == 0
