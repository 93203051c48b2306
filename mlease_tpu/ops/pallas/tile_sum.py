"""EXPERIMENTAL: scatter-free X'd for the COO tail via tile-segmented
one-hot MXU sums.

Design (validated in interpret mode; see ROADMAP.md #1 for hardware status):

1. At pack time (static per dataset), sort the tail COO by column and group
   into 128-column tiles, padding each tile's segment to a common P
   (`segment_layout`). Store rows/vals pre-permuted into the (C, P) slab
   order so the runtime needs NO scatter to build contributions:
   `contrib[c, p, :] = vals[c, p] * d[rows[c, p], :]` is a pure XLA gather
   (the fast primitive on TPU).
2. The kernel reduces each (P, L) contribution block into its tile's 128
   columns by building the (P, 128) one-hot of local column ids in VMEM and
   contracting on the MXU — a bucket-sum with zero scatter.

Cost model: one XLA gather over the tail (≈130 M idx/s) + P×128 MACs per
entry on the MXU (noise at MXU rates) vs the current scatter-add
(≈30 M idx/s) — a ~4× bound on the tail pass. Tile imbalance costs padding:
group columns into tiles by descending degree so each tile is
degree-homogeneous.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_C = 128


def segment_layout(cols: np.ndarray, n: int, *, p_multiple: int = 8):
    """Static layout: COO entry permutation + per-tile local column ids.

    Returns (order, tile_of_entry-slab position mapping packed as
    (local_col (C, P) int32, slot (T,) int64), C, P). Entries are grouped by
    column tile (columns sorted ascending; callers wanting degree-balanced
    tiles should pre-permute the column space).
    """
    order = np.argsort(cols, kind="stable")
    sc = cols[order]
    C = (n + TILE_C - 1) // TILE_C
    tile_of = sc // TILE_C
    counts = np.bincount(tile_of, minlength=C)
    P = max(int(counts.max(initial=1)), 1)
    P = ((P + p_multiple - 1) // p_multiple) * p_multiple
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    pos_in_tile = np.arange(len(sc)) - starts[tile_of]
    local = np.zeros((C, P), np.int32)
    local[tile_of, pos_in_tile] = (sc % TILE_C).astype(np.int32)
    slot = tile_of.astype(np.int64) * P + pos_in_tile
    return order, slot, local, C, P


def _kernel(contrib_ref, local_ref, out_ref):
    P = contrib_ref.shape[1]
    c = contrib_ref[0]
    l = local_ref[0, :, 0]
    oh = (l[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (P, TILE_C), 1)).astype(jnp.float32)
    out_ref[:] = jax.lax.dot_general(
        oh, c, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("C", "P", "interpret"))
def tile_segment_sum(contrib_slab: jax.Array, local_slab: jax.Array,
                     C: int, P: int, *, interpret: bool = False) -> jax.Array:
    """(C, P, L) contributions + (C, P) local ids -> (C*128, L) column sums.

    Padding entries must carry contribution 0 (any local id).
    """
    L = contrib_slab.shape[2]
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((C * TILE_C, L), jnp.float32),
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, P, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_C, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(contrib_slab, local_slab.reshape(C, P, 1))
