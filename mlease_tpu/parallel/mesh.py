"""Device mesh + sharding layout for the consensus trainer.

This module replaces the reference's entire distribution substrate — Hadoop
shuffle partitioning, DistributedCache broadcast, and driver-side meanModel
reduce (reference: src/main/java/com/linkedin/mapred/*, RegressionAdmmTrain.java:352-364)
— with a jax.sharding layout:

  * 1-D mesh over all chips, axis "block": data blocks are sharded over it
    (the analogue of `setNumReduceTasks(nblocks*nlambdas)` partitioning,
    RegressionAdmmTrain.java:355,571-591);
  * consensus state z is replicated; duals u are sharded with their blocks;
  * the block-mean in the ADMM step is a reduction over the sharded axis that
    XLA lowers to an ICI all-reduce (psum) — broadcast of the updated z falls
    out of replication, no HDFS/DistributedCache round trips;
  * the lambda axis stays a vmapped (replicated) dimension so the whole
    regularization path reuses the same HBM-resident data shards.

`nblocks` need not divide the device count: blocks are padded with empty
(masked) blocks to a multiple of the mesh size; masked blocks contribute
nothing to the consensus mean and keep zero duals.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mlease_tpu.core.dataset import BlockedData

BLOCK_AXIS = "block"
FEAT_AXIS = "feat"


def cpu_devices(n: int | None = None) -> list:
    """CPU devices (for tests / multi-chip dry runs on a virtual host mesh)."""
    devs = jax.devices("cpu")
    return devs if n is None else devs[:n]


def make_mesh(devices: Sequence | None = None, n: int | None = None) -> Mesh:
    """1-D mesh over `devices` (default: all default-backend devices)."""
    if devices is None:
        devices = jax.devices()
    if n is not None:
        if len(devices) < n:
            raise ValueError(f"need {n} devices, have {len(devices)}")
        devices = devices[:n]
    return Mesh(np.array(devices), (BLOCK_AXIS,))


def make_mesh_2d(devices: Sequence | None = None, *, block: int = 1,
                 feat: int = 1) -> Mesh:
    """2-D mesh (block, feat): data parallelism over blocks x feature model
    parallelism over column shards (train/feature_sharded.py). Lay the feat
    axis innermost so its per-Xv psum rides the fastest ICI links; the block
    axis carries one psum per ADMM iteration (the consensus mean)."""
    if devices is None:
        devices = jax.devices()
    need = block * feat
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    return Mesh(np.array(devices[:need]).reshape(block, feat),
                (BLOCK_AXIS, FEAT_AXIS))


def block_sharding(mesh: Mesh, extra_leading_dims: int = 0) -> NamedSharding:
    """Sharding for arrays whose axis `extra_leading_dims` is the block axis
    (0 for data arrays (B, ...), 1 for duals (L, B, ...))."""
    spec = [None] * extra_leading_dims + [BLOCK_AXIS]
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_blocks(data: BlockedData, multiple: int) -> tuple[BlockedData, np.ndarray]:
    """Pad the block axis to a multiple of the mesh size with empty blocks.

    Returns (padded_data, block_valid) where block_valid is (B_padded,) with
    1.0 for real blocks. Padded blocks have zero weight and all-false presence,
    so with the valid-mask consensus mean they are exact no-ops.
    """
    B = data.nblocks
    B_pad = ((B + multiple - 1) // multiple) * multiple
    valid = np.zeros(B_pad, dtype=np.float64)
    valid[:B] = 1.0
    if B_pad == B:
        return data, valid

    def pad(a):
        pad_width = [(0, B_pad - B)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, pad_width)

    return BlockedData(
        indices=pad(data.indices), values=pad(data.values),
        y=np.pad(data.y, [(0, B_pad - B), (0, 0)], constant_values=1.0),
        weight=pad(data.weight), offset=pad(data.offset),
        present=pad(data.present), nrows=pad(data.nrows),
        nblocks=B_pad, dim=data.dim,
        head=None if data.head is None else pad(data.head),
        head_ids=data.head_ids,
        tail_rows=None if data.tail_rows is None else pad(data.tail_rows),
        tail_cols=None if data.tail_cols is None else pad(data.tail_cols),
        tail_vals=None if data.tail_vals is None else pad(data.tail_vals),
        tail_c_rows=None if data.tail_c_rows is None else pad(data.tail_c_rows),
        tail_c_cols=None if data.tail_c_cols is None else pad(data.tail_c_cols),
        tail_c_vals=None if data.tail_c_vals is None else pad(data.tail_c_vals),
    ), valid


def shard_blocked_arrays(mesh: Mesh, arrays: dict) -> dict:
    """device_put a dict of named arrays with the standard ADMM layout.

    Keys 'indices','values','y','weight','offset','present','eps','block_valid'
    shard on axis 0; 'u' shards on axis 1; everything else replicates.
    """
    out = {}
    data_sharded = {"indices", "values", "y", "weight", "offset", "present",
                    "eps", "block_valid", "head"}
    for name, arr in arrays.items():
        if name in data_sharded:
            sh = block_sharding(mesh, 0)
        elif name == "u":
            sh = block_sharding(mesh, 1)
        else:
            sh = replicated(mesh)
        out[name] = jax.device_put(arr, sh)
    return out
