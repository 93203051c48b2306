"""Prepared-data Avro round trip + LinearModel odds and ends."""

import numpy as np
import pytest

from mlease_tpu.core.linear_model import LinearModel
from mlease_tpu.core.prepare import (prepare_rows, read_prepared,
                                     write_prepared)
from mlease_tpu.eval.score import remove_union


def test_write_read_prepared_roundtrip(tmp_path):
    records = [
        {"response": 1, "features": [{"name": "a", "term": "t", "value": 2.0}],
         "weight": 2.0, "offset": 0.5},
        {"response": 0, "features": [{"name": "b", "term": "", "value": 1.0}]},
    ] * 10
    prepared = list(prepare_rows(records, nblocks=3, seed=1))
    path = str(tmp_path / "prep.avro")
    write_prepared(path, prepared)
    blocks = read_prepared(path, nblocks=3)
    assert sum(len(b) for b in blocks) == len(prepared)
    all_rows = [r for b in blocks for r in b]
    pos = [r for r in all_rows if r["response"] == 1]
    assert pos and all(r["features"] == [("a\x01t", 2.0)] for r in pos)
    assert all(r["weight"] == pytest.approx(2.0) for r in pos)
    assert all(r["offset"] == pytest.approx(0.5) for r in pos)


def test_remove_union_nested():
    schema = {
        "type": "record", "name": "R", "fields": [
            {"name": "a", "type": ["null", "int"]},
            {"name": "b", "type": ["null", {
                "type": "array", "items": ["null", "float"]}]},
            {"name": "c", "type": ["null", "string", "int"]},  # multi-branch
        ]}
    out = remove_union(schema)
    assert out["fields"][0]["type"] == "int"
    assert out["fields"][1]["type"] == {"type": "array", "items": "float"}
    # first non-null branch wins (Util.java:343-350)
    assert out["fields"][2]["type"] == "string"


def test_linear_model_rescale_filterout():
    m = LinearModel({"a\x01x": 2.0, "b": -4.0}, intercept=1.0)
    m.rescale(0.5)
    assert m.coefficients["b"] == -2.0 and m.intercept == 0.5
    m.filterout("\x01")
    assert set(m.coefficients) == {"b"}
    m.clear()
    assert len(m) == 0 and m.intercept == 0.0


def test_prepare_rejects_bad_partition():
    from mlease_tpu.core.dataset import partition_rows

    with pytest.raises(ValueError, match="Map key is wrong"):
        partition_rows([{"features": []}], ["5"], nblocks=3)
