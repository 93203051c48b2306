"""Sorted segment-sum via two-level prefix + boundary diff (ops/segsum.py).

Validates against jax.ops.segment_sum / a float64 reference: random sorted
streams (incl. empty segments, unaligned tile boundaries, single-segment
and every-entry-own-segment extremes), 1-D and (T, L) values, both the
MXU-triangular-matmul and cumsum prefix methods, and the offsets table
itself. Tolerances are set by the two-level error model (~eps * sqrt(K)):
see the module docstring.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mlease_tpu.ops.segsum import (segment_offsets,  # noqa: E402
                                   sorted_segment_sum_2level)


def _ref(vals, segs, S):
    out = np.zeros((S,) + vals.shape[1:], np.float64)
    np.add.at(out, segs, vals.astype(np.float64))
    return out


@pytest.mark.parametrize("method", ["matmul", "cumsum"])
@pytest.mark.parametrize("T,S,L,tile", [
    (1000, 300, 3, 64),      # generic, unaligned
    (1000, 300, 3, 128),
    (4096, 4096, 1, 256),    # ~every entry its own segment
    (513, 1, 2, 512),        # single segment, one-past-tile stream
    (511, 100, 3, 512),      # stream shorter than one tile
])
def test_matches_reference(method, T, S, L, tile):
    rng = np.random.default_rng(T + S + L)
    vals_np = rng.normal(size=(T, L)).astype(np.float32)
    segs_np = np.sort(rng.integers(0, S, size=T)).astype(np.int32)
    if L == 1:
        vals_np = vals_np[:, 0]
    bounds = segment_offsets(jnp.asarray(segs_np), S)
    got = np.asarray(sorted_segment_sum_2level(
        jnp.asarray(vals_np), bounds, tile=tile, method=method))
    ref = _ref(vals_np, segs_np, S)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-5 * np.sqrt(tile), rtol=0)


def test_empty_segments_exact_zero():
    # ids jump 0 -> 5: segments 1..4 are empty and must be EXACT zeros
    vals = jnp.ones((4, 2), jnp.float32)
    segs = jnp.asarray([0, 0, 5, 5], jnp.int32)
    bounds = segment_offsets(segs, 7)
    got = np.asarray(sorted_segment_sum_2level(vals, bounds, tile=64))
    assert got[1:5].max() == 0.0 and got[6].max() == 0.0
    np.testing.assert_allclose(got[0], [2, 2])
    np.testing.assert_allclose(got[5], [2, 2])


def test_offsets_table():
    segs = jnp.asarray([1, 1, 3, 3, 3, 6], jnp.int32)
    off = np.asarray(segment_offsets(segs, 8))
    np.testing.assert_array_equal(off, [0, 0, 2, 2, 5, 5, 5, 6, 6])


@pytest.mark.parametrize("method", ["matmul", "cumsum"])
def test_lanes_major_matches_minor(method):
    from mlease_tpu.ops.segsum import sorted_segment_sum_2level_lanes
    rng = np.random.default_rng(3)
    T, S, L = 5000, 1500, 3
    vals = rng.normal(size=(L, T)).astype(np.float32)
    segs = np.sort(rng.integers(0, S, size=T)).astype(np.int32)
    bounds = segment_offsets(jnp.asarray(segs), S)
    got = np.asarray(sorted_segment_sum_2level_lanes(
        jnp.asarray(vals), bounds, tile=256, method=method))
    want = np.stack([
        np.asarray(sorted_segment_sum_2level(
            jnp.asarray(vals[l]), bounds, tile=256)) for l in range(L)])
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)
    ref = np.zeros((L, S), np.float64)
    for l in range(L):
        np.add.at(ref[l], segs, vals[l].astype(np.float64))
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-4)


def test_solver_boundary_diff_path_parity(monkeypatch):
    """The production solves run above BOUNDARY_DIFF_MIN_ENTRIES, where the
    tail reduces take the prefix+boundary path — unreachable at test sizes
    unless the gate is lowered. Forces it and asserts the full flat-blocks
    ADMM solve matches the scatter path."""
    from bench import synth_blocked_data
    from mlease_tpu.core.dataset import to_hybrid
    from mlease_tpu.ops import tron_multi as tm

    data, _ = synth_blocked_data(2000, 4, 512, 8)
    data = to_hybrid(data, 64)
    n, L, B = data.dim, 3, 4
    dt = jnp.float32
    head_tuple = (jnp.asarray(data.head, dt), jnp.asarray(data.head_ids),
                  jnp.asarray(data.tail_rows), jnp.asarray(data.tail_cols),
                  jnp.asarray(data.tail_vals, dt),
                  jnp.asarray(data.tail_c_rows),
                  jnp.asarray(data.tail_c_cols),
                  jnp.asarray(data.tail_c_vals, dt))
    args = (jnp.asarray(data.indices), jnp.asarray(data.values, dt),
            jnp.asarray(data.y, dt), jnp.asarray(data.weight, dt),
            jnp.asarray(data.offset, dt), head_tuple,
            jnp.zeros((L, B, n), dt), jnp.ones((L,), dt))

    def solve():
        prob = tm.stack_blocks(*args)
        r = tm.tron_multi(prob, jnp.zeros((B * n, L), dt),
                          jnp.asarray(1e-2, dt), max_iter=3, max_cg_iter=6)
        return np.asarray(r.w)

    w_scatter = solve()                       # gate off at this size
    monkeypatch.setattr(tm, "BOUNDARY_DIFF_MIN_ENTRIES", 1)
    w_bd = solve()
    assert np.max(np.abs(w_bd - w_scatter)) < 1e-4
    assert np.max(np.abs(w_scatter)) > 0.01   # solver actually moved


def test_matches_segment_sum_at_pass_shape():
    # the tail-pass contraction shape class (many entries, L lanes)
    rng = np.random.default_rng(7)
    T, S, L = 20_000, 6_000, 3
    vals = rng.normal(size=(T, L)).astype(np.float32)
    segs = np.sort(rng.integers(0, S, size=T)).astype(np.int32)
    a = np.asarray(jax.ops.segment_sum(
        jnp.asarray(vals), jnp.asarray(segs), num_segments=S,
        indices_are_sorted=True))
    bounds = segment_offsets(jnp.asarray(segs), S)
    b = np.asarray(sorted_segment_sum_2level(jnp.asarray(vals), bounds))
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-4)
