"""Writer->reader Avro schema resolution (Avro spec "Schema Resolution").

The reference's avro-mapred stack resolves the file's writer schema against
the job's declared input schema (AvroUtils.getAvroInputSchema,
src/main/java/com/linkedin/mapred/AvroUtils.java:197-215, applied through
AbstractAvroJob.java:283): field matching by name, defaults for reader-only
fields, writer-only fields skipped, numeric promotions, union re-matching.
These tests pin the same rules onto the from-scratch codec
(mlease_tpu.io.avro.decode_resolved) and the native columnar decoder's
reader-fields slice (mlease_tpu.io.fast_decode)."""

import io
import random

import pytest

from mlease_tpu.io import avro
from mlease_tpu.io.avro import (AvroFileReader, AvroFileWriter,
                                SchemaResolutionError)

from tests.test_avro_fuzz import approx_equal, rand_type, rand_value


def _roundtrip(writer_schema, records, reader_schema, codec="null"):
    buf = io.BytesIO()
    with AvroFileWriter(buf, writer_schema, codec=codec,
                        block_records=3) as w:
        w.extend(records)
    buf.seek(0)
    with AvroFileReader(buf, reader_schema=reader_schema) as r:
        return list(r)


def _rec(fields):
    return {"type": "record", "name": "Top", "fields": fields}


def test_field_reorder_and_projection():
    w = _rec([{"name": "a", "type": "int"},
              {"name": "b", "type": "string"},
              {"name": "c", "type": "double"}])
    # reader reorders and drops b — writer-only b is skipped on the wire
    r = _rec([{"name": "c", "type": "double"}, {"name": "a", "type": "int"}])
    recs = [{"a": i, "b": "x" * i, "c": i * 0.5} for i in range(5)]
    back = _roundtrip(w, recs, r)
    assert back == [{"c": i * 0.5, "a": i} for i in range(5)]


def test_reader_only_field_defaults():
    w = _rec([{"name": "a", "type": "int"}])
    r = _rec([{"name": "a", "type": "int"},
              {"name": "s", "type": "string", "default": "dflt"},
              {"name": "f", "type": "float", "default": 1.5},
              {"name": "u", "type": ["null", "int"], "default": None},
              {"name": "by", "type": "bytes", "default": "\u00ff\u0000"},
              {"name": "arr", "type": {"type": "array", "items": "int"},
               "default": [1, 2]}])
    back = _roundtrip(w, [{"a": 7}], r)
    assert back == [{"a": 7, "s": "dflt", "f": 1.5, "u": None,
                     "by": b"\xff\x00", "arr": [1, 2]}]


def test_missing_field_without_default_raises():
    w = _rec([{"name": "a", "type": "int"}])
    r = _rec([{"name": "a", "type": "int"}, {"name": "zz", "type": "int"}])
    with pytest.raises(SchemaResolutionError, match="zz"):
        _roundtrip(w, [{"a": 1}], r)


@pytest.mark.parametrize("wt,rt,val,want", [
    ("int", "long", 5, 5),
    ("int", "float", 5, 5.0),
    ("int", "double", 5, 5.0),
    ("long", "double", 2 ** 40, float(2 ** 40)),
    ("float", "double", 1.5, 1.5),
    ("string", "bytes", "héllo", "héllo".encode()),
    ("bytes", "string", "héllo".encode(), "héllo"),
])
def test_numeric_and_string_promotions(wt, rt, val, want):
    w = _rec([{"name": "v", "type": wt}])
    r = _rec([{"name": "v", "type": rt}])
    assert _roundtrip(w, [{"v": val}], r) == [{"v": want}]


def test_illegal_promotion_raises():
    w = _rec([{"name": "v", "type": "double"}])
    r = _rec([{"name": "v", "type": "int"}])
    with pytest.raises(SchemaResolutionError):
        _roundtrip(w, [{"v": 1.0}], r)


def test_union_rematching():
    # writer union -> reader non-union: branch must resolve
    w = _rec([{"name": "v", "type": ["null", "int"]}])
    r = _rec([{"name": "v", "type": "long"}])
    assert _roundtrip(w, [{"v": 3}], r) == [{"v": 3}]
    with pytest.raises(SchemaResolutionError):
        _roundtrip(w, [{"v": None}], r)
    # writer non-union -> reader union: first matching branch
    w2 = _rec([{"name": "v", "type": "int"}])
    r2 = _rec([{"name": "v", "type": ["null", "long"]}])
    assert _roundtrip(w2, [{"v": 3}], r2) == [{"v": 3}]
    # writer union -> reader union with different branch order
    w3 = _rec([{"name": "v", "type": ["int", "string"]}])
    r3 = _rec([{"name": "v", "type": ["string", "double"]}])
    assert _roundtrip(w3, [{"v": "x"}, {"v": 2}], r3) == [{"v": "x"},
                                                          {"v": 2.0}]


def test_nested_record_evolution_and_skip():
    item_w = {"type": "record", "name": "Feat", "fields": [
        {"name": "name", "type": "string"},
        {"name": "term", "type": "string"},
        {"name": "value", "type": "float"}]}
    item_r = {"type": "record", "name": "Feat", "fields": [
        {"name": "value", "type": "double"},
        {"name": "name", "type": "string"},
        {"name": "source", "type": "string", "default": ""}]}
    w = _rec([{"name": "features", "type": {"type": "array",
                                            "items": item_w}},
              {"name": "meta", "type": {"type": "map", "values": "string"}},
              {"name": "response", "type": "int"}])
    r = _rec([{"name": "response", "type": "int"},
              {"name": "features", "type": {"type": "array",
                                            "items": item_r}}])
    recs = [{"features": [{"name": "f1", "term": "t", "value": 2.0}],
             "meta": {"k": "v"}, "response": 1}]
    back = _roundtrip(w, recs, r)
    assert back == [{"response": 1,
                     "features": [{"value": 2.0, "name": "f1",
                                   "source": ""}]}]


def test_enum_and_fixed():
    w = _rec([{"name": "e", "type": {"type": "enum", "name": "E",
                                     "symbols": ["A", "B"]}},
              {"name": "x", "type": {"type": "fixed", "name": "X",
                                     "size": 2}}])
    r = _rec([{"name": "e", "type": {"type": "enum", "name": "E",
                                     "symbols": ["B", "A", "C"]}},
              {"name": "x", "type": {"type": "fixed", "name": "X",
                                     "size": 2}}])
    back = _roundtrip(w, [{"e": "B", "x": b"ab"}], r)
    assert back == [{"e": "B", "x": b"ab"}]
    # reader enum missing the writer symbol and no default -> error
    r_bad = _rec([{"name": "e", "type": {"type": "enum", "name": "E",
                                         "symbols": ["C"]}},
                  {"name": "x", "type": {"type": "fixed", "name": "X",
                                         "size": 2}}])
    with pytest.raises(SchemaResolutionError):
        _roundtrip(w, [{"e": "B", "x": b"ab"}], r_bad)


def test_record_name_mismatch_raises():
    w = _rec([{"name": "r", "type": {"type": "record", "name": "Inner",
                                     "fields": [{"name": "v",
                                                 "type": "int"}]}}])
    r = _rec([{"name": "r", "type": {"type": "record", "name": "Other",
                                     "fields": [{"name": "v",
                                                 "type": "int"}]}}])
    with pytest.raises(SchemaResolutionError):
        _roundtrip(w, [{"r": {"v": 1}}], r)


def test_no_reader_schema_is_identity():
    w = _rec([{"name": "a", "type": "int"}])
    buf = io.BytesIO()
    with AvroFileWriter(buf, w) as wr:
        wr.append({"a": 1})
    buf.seek(0)
    with AvroFileReader(buf, reader_schema=w) as r:
        assert list(r) == [{"a": 1}]


# ---------------------------------------------------------------------------
# fuzz: random writer schema, mechanically evolved reader schema
# ---------------------------------------------------------------------------

_PROMOTE = {"int": ["long", "float", "double"], "long": ["float", "double"],
            "float": ["double"]}


def _evolve(rng, writer_fields, records):
    """Derive (reader_fields, expected_records): drop ~1/3 of the writer's
    fields, promote promotable primitives, shuffle order, append a defaulted
    reader-only field."""
    keep = [f for f in writer_fields if rng.random() > 0.33]
    if not keep:
        keep = [writer_fields[0]]
    reader_fields, expected_tpl = [], {}
    for f in keep:
        t = f["type"]
        if isinstance(t, str) and t in _PROMOTE and rng.random() < 0.5:
            t = rng.choice(_PROMOTE[t])
        reader_fields.append({"name": f["name"], "type": t})
    rng.shuffle(reader_fields)
    reader_fields.append({"name": "added_f", "type": "string",
                          "default": "D"})
    float_names = {f["name"] for f in reader_fields
                   if f["type"] in ("float", "double")}
    expected = []
    for rec in records:
        out = {}
        for f in reader_fields:
            if f["name"] == "added_f":
                out["added_f"] = "D"
            else:
                v = rec[f["name"]]
                out[f["name"]] = (float(v) if f["name"] in float_names
                                  and isinstance(v, int) else v)
        expected.append(out)
    return reader_fields, expected


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_evolved_reader_schema(seed):
    rng = random.Random(1000 + seed)
    writer = {"type": "record", "name": "Top",
              "fields": [{"name": f"f{i}", "type": rand_type(rng)}
                         for i in range(rng.randint(2, 6))]}
    records = [rand_value(rng, writer) for _ in range(rng.randint(1, 20))]
    reader_fields, expected = _evolve(rng, writer["fields"], records)
    reader = {"type": "record", "name": "Top", "fields": reader_fields}
    for codec in ("null", "deflate"):
        back = _roundtrip(writer, records, reader, codec=codec)
        assert len(back) == len(expected)
        for got, want in zip(back, expected):
            assert list(got) == list(want), (seed, codec)   # field order too
            assert approx_equal(got, want), (seed, codec)


# ---------------------------------------------------------------------------
# native decoder: reader-fields slice agrees with the resolved Python path
# ---------------------------------------------------------------------------

def test_native_reader_schema_slice(tmp_path):
    fast = pytest.importorskip("mlease_tpu.io.fast_decode")
    if not fast.is_available():
        pytest.skip("native decoder unavailable")
    import numpy as np

    item = {"type": "record", "name": "Feat", "fields": [
        {"name": "name", "type": "string"},
        {"name": "term", "type": "string"},
        {"name": "value", "type": "float"}]}
    writer = {"type": "record", "name": "Row", "fields": [
        {"name": "response", "type": "int"},
        {"name": "weight", "type": "float"},
        {"name": "debug_tag", "type": "string"},      # writer-only noise
        {"name": "features", "type": {"type": "array", "items": item}}]}
    rng = random.Random(3)
    recs = [{"response": rng.randint(0, 1),
             "weight": round(rng.uniform(0.5, 2.0), 3),
             "debug_tag": "x" * rng.randint(0, 5),
             "features": [{"name": f"f{rng.randint(0, 9)}", "term": "",
                           "value": round(rng.uniform(-1, 1), 3)}
                          for _ in range(rng.randint(1, 4))]}
            for _ in range(40)]
    path = str(tmp_path / "rows.avro")
    avro.write_records(path, writer, recs)

    # reader drops debug_tag AND weight: weight must fall back to 1.0
    reader = {"type": "record", "name": "Row", "fields": [
        {"name": "response", "type": "int"},
        {"name": "features", "type": {"type": "array", "items": item}}]}
    dec = fast.decode_file(path, reader_schema=reader)
    assert dec.num_rows == len(recs)
    assert np.all(dec.weight == 1.0)
    assert list(dec.response) == [r["response"] for r in recs]
    # feature payload untouched by the projection
    want_vals = [f["value"] for r in recs for f in r["features"]]
    assert np.allclose(dec.feat_val, want_vals, atol=1e-6)
    # python resolved path agrees on the surviving columns
    py = avro.read_records(path, reader_schema=reader)
    assert [r["response"] for r in py] == list(dec.response)
    assert all("debug_tag" not in r and "weight" not in r for r in py)


def test_native_reader_schema_must_keep_response(tmp_path):
    fast = pytest.importorskip("mlease_tpu.io.fast_decode")
    if not fast.is_available():
        pytest.skip("native decoder unavailable")
    item = {"type": "record", "name": "Feat", "fields": [
        {"name": "name", "type": "string"},
        {"name": "term", "type": "string"},
        {"name": "value", "type": "float"}]}
    writer = {"type": "record", "name": "Row", "fields": [
        {"name": "response", "type": "int"},
        {"name": "features", "type": {"type": "array", "items": item}}]}
    path = str(tmp_path / "rows.avro")
    avro.write_records(path, writer, [{"response": 1, "features": []}])
    reader = {"type": "record", "name": "Row", "fields": [
        {"name": "features", "type": {"type": "array", "items": item}}]}
    with pytest.raises(fast.DescriptorError):
        fast.decode_file(path, reader_schema=reader)
