"""Avro codec tests: round-trips of every wire schema + reading the
reference's Pig-generated sample data fixture."""

import io
import math

import pytest

from mlease_tpu.io import avro, schemas
from mlease_tpu.io.records import get_response, normalize_row


def roundtrip(schema, records, codec="deflate"):
    buf = io.BytesIO()
    with avro.AvroFileWriter(buf, schema, codec=codec, block_records=3) as w:
        w.extend(records)
    buf.seek(0)
    with avro.AvroFileReader(buf) as r:
        assert r.codec == codec
        return list(r)


def test_roundtrip_prepare_output():
    recs = [
        {"key": str(i), "response": i % 2,
         "features": [{"name": "f", "term": str(j), "value": 0.5 * j}
                      for j in range(i % 4)],
         "weight": 1.0, "offset": 0.25}
        for i in range(10)
    ]
    out = roundtrip(schemas.REGRESSION_PREPARE_OUTPUT, recs)
    assert len(out) == 10
    assert out[3]["key"] == "3"
    assert out[3]["features"][1]["term"] == "1"
    assert out[3]["features"][1]["value"] == pytest.approx(0.5)


def test_roundtrip_null_codec():
    recs = [{"lambda": 1.0, "rho": 2.5}]
    out = roundtrip(schemas.LAMBDA_RHO_MAP, recs, codec="null")
    assert out[0]["rho"] == 2.5


def test_roundtrip_all_schemas():
    cases = [
        (schemas.LINEAR_MODEL,
         [{"key": "1.0", "model": [{"name": "a", "term": "", "value": -1.5}]}]),
        (schemas.LINEAR_MODEL_WITH_VAR,
         [{"key": "1:2#item", "model": [{"name": "a", "term": "b", "value": 2.0}],
           "posteriorVar": [{"name": "a", "term": "b", "value": 0.1}]}]),
        (schemas.REGRESSION_TRAIN_OUTPUT,
         [{"key": "1.0#0", "model": [], "uplusx": []}]),
        (schemas.SAMPLE_TEST_LOGLIK,
         [{"lambda": "1.0", "iter": 3, "testLoglik": -0.3}]),
        (schemas.REGRESSION_TEST_LOGLIK_OUTPUT,
         [{"key": "all", "testLoglik": -0.25, "count": 100.0}]),
    ]
    for schema, recs in cases:
        out = roundtrip(schema, recs)
        assert len(out) == len(recs)
        for got, want in zip(out, recs):
            assert set(got) == set(want)


def test_union_and_map_types():
    schema = {
        "type": "record", "name": "U", "fields": [
            {"name": "x", "type": ["null", "double"]},
            {"name": "m", "type": {"type": "map", "values": "long"}},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "flag", "type": "boolean"},
        ]}
    recs = [
        {"x": None, "m": {"a": 1, "b": -7}, "tags": ["p", "q"], "flag": True},
        {"x": 3.25, "m": {}, "tags": [], "flag": False},
    ]
    out = roundtrip(schema, recs)
    assert out == recs


def test_varint_extremes():
    schema = {"type": "record", "name": "V",
              "fields": [{"name": "v", "type": "long"}]}
    vals = [0, -1, 1, 63, -64, 64, 2**31 - 1, -(2**31), 2**62, -(2**62)]
    out = roundtrip(schema, [{"v": v} for v in vals])
    assert [r["v"] for r in out] == vals


def test_read_reference_sample_data(sample_data_path):
    with avro.AvroFileReader(sample_data_path) as r:
        records = list(r)
    assert len(records) == 1000
    n_pos = 0
    for rec in records:
        row = normalize_row(rec)
        assert row["response"] in (0, 1, -1)
        assert row["weight"] >= 0
        assert math.isfinite(row["offset"])
        for k, v in row["features"]:
            assert isinstance(k, str) and k
            assert math.isfinite(v)
        n_pos += 1 if row["response"] == 1 else 0
    assert 0 < n_pos < len(records)


def test_response_aliasing():
    assert get_response({"click": True}) == 1
    assert get_response({"label": 0}) == 0
    assert get_response({"click": 0, "response": 1}) == 1  # later alias wins
    with pytest.raises(ValueError):
        get_response({"foo": 1})
    with pytest.raises(ValueError):
        get_response({"response": "yes"})


def test_enumerate_comma_separated_paths(tmp_path):
    """input.paths accepts comma-separated entries (the reference calls
    AvroUtils.addAllSubPaths once per comma-split entry); whitespace and
    empty segments are tolerated, a nonexistent listed entry raises (the
    reference fails the job on a bad path rather than training on less
    data than the config names)."""
    d1 = tmp_path / "a"
    d2 = tmp_path / "b"
    d1.mkdir()
    d2.mkdir()
    recs = [{"lambda": 1.0, "rho": 2.5}]
    avro.write_records(str(d1 / "part-0.avro"), schemas.LAMBDA_RHO_MAP, recs)
    avro.write_records(str(d2 / "part-0.avro"), schemas.LAMBDA_RHO_MAP, recs)
    f3 = tmp_path / "single.avro"
    avro.write_records(str(f3), schemas.LAMBDA_RHO_MAP, recs)

    got = avro.enumerate_avro_files(f" {d1} , {d2},, {f3} ,")
    assert got == [str(d1 / "part-0.avro"), str(d2 / "part-0.avro"), str(f3)]

    with pytest.raises(FileNotFoundError, match="does-not-exist"):
        avro.enumerate_avro_files(f"{d1},{tmp_path}/does-not-exist")

    # a SINGLE nonexistent path is the same error, not an empty list
    with pytest.raises(FileNotFoundError, match="no-such-dir"):
        avro.enumerate_avro_files(f"{tmp_path}/no-such-dir")
