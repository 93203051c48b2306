"""Sorted segment reduction without scatter: two-level prefix + boundary diff.

The sparse-tail passes reduce a (T, L) value stream into row / column
segments. The stream is SORTED by segment id (the pack layout guarantees
it: row-sorted tails for Xv, column-sorted tails for X'v), yet
`jax.ops.segment_sum` lowers to scatter-add even with
`indices_are_sorted=True`, and TPU scatter-add is element-serialized —
measured ~62 ns/entry at the 25M production shape
(tools/tail_locality_result.json), ~40x off the HBM stream rate, making
the reduce (not the gather) the per-pass floor.

A sorted reduction needs no scatter. With `offsets` the (S+1,) segment
boundary table (loop-invariant, from the same sort that built the layout):

    E(b)    = sum of the first b stream entries     (exclusive prefix)
    out[s]  = E(offsets[s+1]) - E(offsets[s])

E is computed TWO-LEVEL so both speed and accuracy hold:

    tiles   (nT, K, L) = zero-padded reshape of vals
    within  = inclusive prefix along K — a LOWER-TRIANGULAR MATMUL on the
              MXU (K x K ones-triangle contraction), not a scan: XLA's
              cumsum lowering is a log-depth pass chain, the MXU does the
              whole tile prefix in one contraction at ~free FLOPs
    coarse  = exclusive cumsum over the nT tile sums (tiny)
    E(b)    = coarse[(b-1)//K] + within[b-1]   (flat),  E(0) = 0

Accuracy: adjacent boundaries usually share a tile, so the coarse term
cancels EXACTLY in the diff and the error is the within-tile prefix error
(~eps * sqrt(K) * |vals|) — same order as scatter-add's own left-to-right
summation error; verified against float64 in tests and
tools/segsum_probe.py. Empty segments diff identical prefixes: exact 0.

No reference counterpart: the reference reduces into java HashMaps
(LibLinearDataset.java:481-484); the sorted-stream layout this exploits
exists only in the TPU design (core/dataset.py column-sorted tails).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _acc_dtype(dt):
    """Accumulate the prefix matmul at >= the stream precision: f32 for
    f32/bf16 streams, f64 for an f64 run (a f32 accumulator would silently
    degrade the double-precision path)."""
    return jnp.float64 if dt == jnp.float64 else jnp.float32


def segment_offsets(sorted_segs: jax.Array, num_segments: int) -> jax.Array:
    """(S+1,) int32 boundary table for a sorted (T,) segment-id stream:
    offsets[s] = first stream position with id >= s; offsets[S] = T.
    Loop-invariant per layout — compute once, ship with the tail arrays."""
    return jnp.searchsorted(
        sorted_segs, jnp.arange(num_segments + 1, dtype=sorted_segs.dtype),
        side="left").astype(jnp.int32)


def sorted_segment_sum_2level(vals: jax.Array, offsets: jax.Array, *,
                              tile: int = 512,
                              method: str = "matmul") -> jax.Array:
    """Segment sums of a segment-SORTED value stream via boundary-diffed
    two-level prefix sums. vals (T, L) or (T,); offsets (S+1,) int32 from
    `segment_offsets`. Returns (S, L) / (S,) matching segment_sum on the
    same layout (up to f32 summation-order rounding). Deliberately NOT
    jitted here: it inlines into the caller's trace so XLA can fuse the
    contrib elementwise work into the prefix pipeline."""
    squeeze = vals.ndim == 1
    if squeeze:
        vals = vals[:, None]
    T, L = vals.shape
    K = tile
    nT = -(-T // K)
    pad = nT * K - T
    if pad:
        vals = jnp.concatenate(
            [vals, jnp.zeros((pad, L), vals.dtype)], axis=0)
    tiles = vals.reshape(nT, K, L)

    if method == "matmul":
        # inclusive within-tile prefix as one MXU contraction:
        # within[n, j, l] = sum_{k<=j} tiles[n, k, l]
        # HIGHEST: the TPU f32 matmul default is one bf16 pass (~3
        # digits) — a prefix SUM cannot afford that; the 6-pass f32
        # decomposition costs only MXU cycles on a bandwidth-bound op.
        tri = jnp.tril(jnp.ones((K, K), vals.dtype))
        within = jnp.einsum(
            "nkl,jk->njl", tiles, tri,
            preferred_element_type=_acc_dtype(vals.dtype),
            precision=jax.lax.Precision.HIGHEST).astype(vals.dtype)
    else:
        within = jnp.cumsum(tiles, axis=1)

    tile_sums = within[:, -1, :]                          # (nT, L)
    return _finish(within, tile_sums, offsets, nT, K, L, vals.dtype, squeeze)


def _finish(within, tile_sums, offsets, nT, K, L, dtype, squeeze):
    coarse = jnp.concatenate(
        [jnp.zeros((1, L), dtype),
         jnp.cumsum(tile_sums, axis=0)[:-1]], axis=0)     # exclusive, (nT, L)

    # E(b) = coarse[(b-1)//K] + within_flat[b-1], E(0) = 0
    b = offsets.astype(jnp.int32)
    bm = jnp.maximum(b - 1, 0)
    e = coarse[bm // K] + within.reshape(nT * K, L)[bm]
    e = jnp.where((b == 0)[:, None], jnp.zeros((), dtype), e)
    out = e[1:] - e[:-1]
    return out[:, 0] if squeeze else out


def sorted_segment_sum_2level_lanes(vals: jax.Array, offsets: jax.Array, *,
                                    tile: int = 512,
                                    method: str = "matmul") -> jax.Array:
    """Lanes-MAJOR batched variant: vals (L, T), one SHARED offset table —
    the production solver's layout (every lane reduces the same sorted
    stream with per-lane values). Returns (L, S). Same two-level scheme as
    `sorted_segment_sum_2level`, batched without transposing the stream."""
    L, T = vals.shape
    K = tile
    nT = -(-T // K)
    pad = nT * K - T
    if pad:
        vals = jnp.concatenate(
            [vals, jnp.zeros((L, pad), vals.dtype)], axis=1)
    tiles = vals.reshape(L, nT, K)

    if method == "matmul":
        tri = jnp.tril(jnp.ones((K, K), vals.dtype))
        within = jnp.einsum(
            "lnk,jk->lnj", tiles, tri,
            preferred_element_type=_acc_dtype(vals.dtype),
            precision=jax.lax.Precision.HIGHEST).astype(vals.dtype)
    else:
        within = jnp.cumsum(tiles, axis=2)

    tile_sums = within[:, :, -1]                          # (L, nT)
    coarse = jnp.concatenate(
        [jnp.zeros((L, 1), vals.dtype),
         jnp.cumsum(tile_sums, axis=1)[:, :-1]], axis=1)  # exclusive

    b = offsets.astype(jnp.int32)
    bm = jnp.maximum(b - 1, 0)
    e = coarse[:, bm // K] + within.reshape(L, nT * K)[:, bm]
    e = jnp.where((b == 0)[None, :], jnp.zeros((), vals.dtype), e)
    return e[:, 1:] - e[:, :-1]
