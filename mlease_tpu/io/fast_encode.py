"""ctypes binding for the native Avro row encoder (native/avro_encode.cpp).

Encodes vectorized numpy chunks of reference-schema rows
({response, features[{name,term,value}], weight, offset} —
RegressionPrepare.java:73-192 input contract) into Avro binary block
payloads, ~2 orders of magnitude faster than the per-row Python encoder.
Used by examples/make_scale_dataset.py to stage the BASELINE-scale corpus;
files are written through AvroFileWriter.append_raw_block so the container
framing (and therefore both decoders) is unchanged.
"""

from __future__ import annotations

import ctypes

import numpy as np

from mlease_tpu.io.fast_decode import _load


def is_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "mlease_encode_ctr_block")


def encode_ctr_block(cols: np.ndarray, vals: np.ndarray, y: np.ndarray,
                     weight: np.ndarray | None = None,
                     offset: np.ndarray | None = None) -> bytes:
    """Encode (m, k) rows into one Avro binary block payload.

    cols int32 (m, k) feature ids (rendered as names "f<id>", term "");
    vals float32 (m, k); y int32 (m,) responses; weight/offset float32 (m,)
    or None for the defaults 1.0 / 0.0."""
    lib = _load()
    if lib is None or not hasattr(lib, "mlease_encode_ctr_block"):
        raise RuntimeError("native encoder unavailable")
    if not hasattr(lib.mlease_encode_ctr_block, "_configured"):
        lib.mlease_encode_ctr_block.restype = ctypes.c_int64
        lib.mlease_encode_ctr_block.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64]
        lib.mlease_encode_ctr_block._configured = True

    cols = np.ascontiguousarray(cols, np.int32)
    vals = np.ascontiguousarray(vals, np.float32)
    y = np.ascontiguousarray(y, np.int32)
    m, k = cols.shape
    assert vals.shape == (m, k) and y.shape == (m,)
    wp = op = None
    if weight is not None:
        weight = np.ascontiguousarray(weight, np.float32)
        assert weight.shape == (m,)
        wp = weight.ctypes.data_as(ctypes.c_void_p)
    if offset is not None:
        offset = np.ascontiguousarray(offset, np.float32)
        assert offset.shape == (m,)
        op = offset.ctypes.data_as(ctypes.c_void_p)

    cap = m * (24 + k * 24) + 64
    while True:
        buf = ctypes.create_string_buffer(cap)
        n = lib.mlease_encode_ctr_block(
            cols.ctypes.data_as(ctypes.c_void_p),
            vals.ctypes.data_as(ctypes.c_void_p),
            y.ctypes.data_as(ctypes.c_void_p), wp, op,
            m, k, ctypes.cast(buf, ctypes.c_void_p), cap)
        if n >= 0:
            return buf.raw[:n]
        cap *= 2
