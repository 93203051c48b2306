"""Randomized Avro codec round-trips: random schemas, random values."""

import io
import random

import numpy as np
import pytest

from mlease_tpu.io import avro

PRIMS = ["boolean", "int", "long", "float", "double", "string", "bytes"]


def rand_type(rng, depth=0):
    choices = PRIMS + (["record", "array", "map", "union", "enum", "fixed"]
                       if depth < 2 else [])
    t = rng.choice(choices)
    if t in PRIMS:
        return t
    if t == "record":
        n = rng.randint(1, 4)
        return {"type": "record",
                "name": f"Rec{rng.randint(0, 10 ** 6)}",
                "fields": [{"name": f"f{i}",
                            "type": rand_type(rng, depth + 1)}
                           for i in range(n)]}
    if t == "array":
        return {"type": "array", "items": rand_type(rng, depth + 1)}
    if t == "map":
        return {"type": "map", "values": rand_type(rng, depth + 1)}
    if t == "union":
        branches = ["null", rng.choice(["int", "string", "double"])]
        return branches
    if t == "enum":
        return {"type": "enum", "name": f"E{rng.randint(0, 10 ** 6)}",
                "symbols": ["A", "B", "C"]}
    if t == "fixed":
        return {"type": "fixed", "name": f"X{rng.randint(0, 10 ** 6)}",
                "size": 4}


def rand_value(rng, schema):
    if isinstance(schema, list):
        branch = rng.choice(schema)
        return None if branch == "null" else rand_value(rng, branch)
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "boolean":
        return rng.random() < 0.5
    if t in ("int", "long"):
        return rng.randint(-2 ** 40, 2 ** 40)
    if t in ("float", "double"):
        return round(rng.uniform(-1e6, 1e6), 3)
    if t == "string":
        return "".join(rng.choice("abcéxyz") for _ in range(rng.randint(0, 8)))
    if t == "bytes":
        return bytes(rng.randint(0, 255) for _ in range(rng.randint(0, 6)))
    if t == "record":
        return {f["name"]: rand_value(rng, f["type"]) for f in schema["fields"]}
    if t == "array":
        return [rand_value(rng, schema["items"]) for _ in range(rng.randint(0, 4))]
    if t == "map":
        return {f"k{i}": rand_value(rng, schema["values"])
                for i in range(rng.randint(0, 4))}
    if t == "enum":
        return rng.choice(schema["symbols"])
    if t == "fixed":
        return bytes(rng.randint(0, 255) for _ in range(schema["size"]))
    raise AssertionError(t)


def approx_equal(a, b):
    if isinstance(a, float) or isinstance(b, float):
        return a == pytest.approx(b, rel=1e-6, abs=1e-6)
    if isinstance(a, dict):
        return set(a) == set(b) and all(approx_equal(a[k], b[k]) for k in a)
    if isinstance(a, list):
        return len(a) == len(b) and all(approx_equal(x, y)
                                        for x, y in zip(a, b))
    return a == b


@pytest.mark.parametrize("seed", range(20))
def test_random_schema_roundtrip(seed):
    rng = random.Random(seed)
    schema = {"type": "record", "name": "Top",
              "fields": [{"name": f"f{i}", "type": rand_type(rng)}
                         for i in range(rng.randint(1, 5))]}
    records = [rand_value(rng, schema) for _ in range(rng.randint(1, 30))]
    for codec in ("null", "deflate"):
        buf = io.BytesIO()
        with avro.AvroFileWriter(buf, schema, codec=codec,
                                 block_records=7) as w:
            w.extend(records)
        buf.seek(0)
        with avro.AvroFileReader(buf) as r:
            back = list(r)
        assert len(back) == len(records)
        for got, want in zip(back, records):
            assert approx_equal(got, want), (seed, codec)
