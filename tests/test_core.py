"""Vocab / LinearModel / dataset packing / prepare tests."""

import math

import numpy as np
import pytest

from mlease_tpu.core import (
    FeatureVocab, LinearModel, build_vocab, mean_model, pack_blocks,
    prepare_to_blocks, read_model_file, write_model_file,
)
from mlease_tpu.io.records import INTERCEPT_NAME


def rows_fixture():
    return [
        {"response": 1, "features": [("a", 1.0), ("b\x01t", 2.0)],
         "weight": 1.0, "offset": 0.0},
        {"response": 0, "features": [("a", -1.0)], "weight": 2.0, "offset": 0.5},
        {"response": 0, "features": [("c", 3.0)], "weight": 1.0, "offset": 0.0},
    ]


def test_vocab_intercept_last():
    v = build_vocab(rows_fixture())
    assert v.size == 4
    assert v.num_features == 3
    assert v.intercept_index == 3
    assert v.name(3) == INTERCEPT_NAME
    assert v["a"] == 0
    with pytest.raises(ValueError):
        v.add("new-feature")


def test_vocab_rejects_intercept_name():
    v = FeatureVocab()
    with pytest.raises(ValueError):
        v.add(INTERCEPT_NAME)


def test_vocab_save_load(tmp_path):
    v = build_vocab(rows_fixture())
    p = str(tmp_path / "vocab.json")
    v.save(p)
    v2 = FeatureVocab.load(p)
    assert v2.names == v.names
    assert v2.intercept_index == v.intercept_index


def test_pack_blocks_layout():
    v = build_vocab(rows_fixture())
    data = pack_blocks([rows_fixture()[:2], rows_fixture()[2:]], v)
    assert data.nblocks == 2
    assert data.dim == 4
    # y: 0 -> -1; padding rows have weight 0
    assert data.y[0, 0] == 1.0 and data.y[0, 1] == -1.0
    assert data.weight[0, 0] == 1.0 and data.weight[0, 1] == 2.0
    assert data.weight[0, 2] == 0.0  # padding
    # intercept column appended with bias value 1
    nz = data.values[0, 0] != 0
    row0 = dict(zip(data.indices[0, 0][nz], data.values[0, 0][nz]))
    assert row0[v.intercept_index] == 1.0
    assert row0[v["a"]] == 1.0
    # presence mask: block 0 has a, b#t, intercept; block 1 has c, intercept
    assert data.present[0, v["a"]] and data.present[0, v["b\x01t"]]
    assert not data.present[0, v["c"]]
    assert data.present[1, v["c"]] and not data.present[1, v["a"]]
    assert data.present[:, v.intercept_index].all()


def test_linear_model_eval_and_combine():
    m = LinearModel({"a": 2.0}, intercept=0.5)
    # plain eval: intercept + sum coef*x
    assert m.eval_features([("a", 3.0), ("zzz", 9.0)]) == pytest.approx(6.5)
    # click-replicate correction: c=2 -> -log(1 + 2exp(-b))
    expected = -math.log(1 + 2 * math.exp(-0.5)) + 6.0
    assert m.eval_features([("a", 3.0)], num_click_replicates=2) == pytest.approx(expected)
    # linear combine with per-key override
    other = LinearModel({"a": 1.0, "b": 4.0}, intercept=1.0)
    m.linear_combine(1.0, 0.5, other, bmap={"b": 0.25})
    assert m.coefficients["a"] == pytest.approx(2.5)
    assert m.coefficients["b"] == pytest.approx(1.0)
    assert m.intercept == pytest.approx(1.0)
    assert m.max_abs_value() == pytest.approx(2.5)


def test_model_avro_roundtrip(tmp_path):
    m = LinearModel({"a": 1.5, "b\x01t": -2.0}, intercept=0.25)
    path = str(tmp_path / "model.avro")
    write_model_file(path, {"1.0": m})
    back = read_model_file(path)["1.0"]
    assert back.coefficients == m.coefficients
    assert back.intercept == m.intercept


def test_model_dense_roundtrip():
    v = build_vocab(rows_fixture())
    m = LinearModel({"a": 1.5, "c": -2.0}, intercept=0.25)
    vec = m.to_dense(v)
    assert vec[v["a"]] == 1.5 and vec[v.intercept_index] == 0.25
    back = LinearModel.from_dense(vec, v)
    assert back.coefficients == {"a": 1.5, "c": -2.0}
    assert back.intercept == 0.25


def test_mean_model():
    models = {
        "1.0#0": LinearModel({"a": 2.0}, 1.0),
        "1.0#1": LinearModel({"a": 4.0, "b": 2.0}, 3.0),
    }
    mean = mean_model(models, nblocks=2, nlambdas=1)
    assert mean["1.0"].coefficients["a"] == pytest.approx(3.0)
    assert mean["1.0"].coefficients["b"] == pytest.approx(1.0)
    assert mean["1.0"].intercept == pytest.approx(2.0)
    with pytest.raises(ValueError, match="Some models failed"):
        mean_model(models, nblocks=3, nlambdas=1)


def test_prepare_click_replication():
    records = [
        {"response": 1, "features": [{"name": "a", "term": "", "value": 1.0}],
         "weight": 1.0},
        {"response": 0, "features": [{"name": "a", "term": "", "value": 1.0}]},
    ] * 50
    blocks = prepare_to_blocks(records, nblocks=4, num_click_replicates=2, seed=1)
    rows = [r for b in blocks for r in b]
    pos = [r for r in rows if r["response"] == 1]
    neg = [r for r in rows if r["response"] != 1]
    assert len(pos) == 100  # 50 positives replicated x2
    assert len(neg) == 50
    # positive weight divided by replicates
    assert all(r["weight"] == pytest.approx(0.5) for r in pos)
    assert all(r["weight"] == pytest.approx(1.0) for r in neg)
    # total positive weight preserved
    assert sum(r["weight"] for r in pos) == pytest.approx(50.0)


def test_prepare_map_key_mode():
    records = [{"response": 0, "key_col": i % 3,
                "features": [{"name": "a", "term": "", "value": 1.0}]}
               for i in range(9)]
    blocks = prepare_to_blocks(records, nblocks=3, map_key="key_col")
    assert [len(b) for b in blocks] == [3, 3, 3]
