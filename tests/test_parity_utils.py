"""Small parity utilities: partition ids, lambda-rho reader, model text
format, JSON rows, multi-host helpers."""

import json

import numpy as np
import pytest

from mlease_tpu.core.linear_model import LinearModel
from mlease_tpu.core.partition_ids import (assign_partition_ids,
                                           read_partition_ids,
                                           write_partition_ids)
from mlease_tpu.io.records import read_json_rows
from mlease_tpu.train.pipeline import read_lambda_rho
from mlease_tpu.io import avro, schemas


def test_partition_ids_roundtrip(tmp_path):
    ids = assign_partition_ids(["b", "a", "a"], lambdas=[1.0, 10.0])
    assert ids == {"1.0#a": 0, "1.0#b": 1, "10.0#a": 2, "10.0#b": 3}
    p = str(tmp_path / "ids.avro")
    write_partition_ids(p, ids)
    assert read_partition_ids(p) == ids


def test_read_lambda_rho(tmp_path):
    p = str(tmp_path / "lr.avro")
    avro.write_records(p, schemas.LAMBDA_RHO_MAP,
                       [{"lambda": 1.0, "rho": 2.0},
                        {"lambda": 10.0, "rho": 1.0}])
    assert read_lambda_rho(p) == {1.0: 2.0, 10.0: 1.0}


def test_model_text_roundtrip():
    m = LinearModel({"a": 1.5, "b\x01t": -0.25}, intercept=0.75)
    text = m.to_string()
    back = LinearModel.from_string(text)
    assert back.intercept == m.intercept
    assert back.coefficients == m.coefficients


def test_read_json_rows(tmp_path):
    p = str(tmp_path / "rows.json")
    with open(p, "w") as f:
        f.write(json.dumps({"response": 1,
                            "features": [{"name": "a", "term": "t",
                                          "value": 2.0}],
                            "weight": 0.5}) + "\n")
        f.write(json.dumps({"click": True, "features": []}) + "\n")
    rows = read_json_rows(p)
    assert rows[0]["features"] == [("a\x01t", 2.0)]
    assert rows[0]["weight"] == 0.5
    assert rows[1]["response"] == 1
    with open(p, "a") as f:
        f.write(json.dumps({"features": []}) + "\n")
    with pytest.raises(ValueError, match="rows.json:3"):
        read_json_rows(p)


def test_host_block_range_single_process():
    from mlease_tpu.parallel.distributed import host_block_range

    assert host_block_range(10) == (0, 10)


# ---------------------------------------------------------------------------
# Java Float.toString lambda keys (RegressionAdmmTrain.java:561 via
# String.valueOf(float); ADVICE round-1 item 1)
# ---------------------------------------------------------------------------

def test_lambda_key_java_float_tostring():
    from mlease_tpu.train.admm import _lambda_key

    # plain decimal range [1e-3, 1e7)
    assert _lambda_key(1) == "1.0"
    assert _lambda_key(10) == "10.0"
    assert _lambda_key(100) == "100.0"
    assert _lambda_key(0.5) == "0.5"
    assert _lambda_key(0.001) == "0.001"
    assert _lambda_key(9999999) == "9999999.0"
    assert _lambda_key(1234.5) == "1234.5"
    # scientific below 1e-3 and at/above 1e7 (Java style, no '+')
    assert _lambda_key(1e-4) == "1.0E-4"
    assert _lambda_key(2.5e-4) == "2.5E-4"
    assert _lambda_key(1e7) == "1.0E7"
    assert _lambda_key(12345678) == "1.2345678E7"
    assert _lambda_key(1e10) == "1.0E10"
    assert _lambda_key(0.0) == "0.0"
