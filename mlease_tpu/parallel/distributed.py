"""Multi-host initialization + mesh construction for pod slices.

The reference scales across machines via the Hadoop job tracker; here a
multi-host run is a standard `jax.distributed` SPMD job: every host runs the
same driver, `initialize()` wires the coordinator, and the 1-D block mesh
spans all global devices — the consensus psum then rides ICI within a slice
and DCN across slices, with no framework code changes (the trainer only sees
a bigger mesh).

Usage on each host of a pod slice:

    from mlease_tpu.parallel import distributed
    distributed.initialize()                 # env-driven (JAX defaults), or
    distributed.initialize(coordinator_address="host0:1234",
                           num_processes=4, process_id=i)
    mesh = distributed.global_mesh()
    trainer = AdmmTrainer(data_shard, vocab, cfg, mesh=mesh)

Each host feeds its own data shard: `host_block_range(nblocks)` says which
consensus blocks this host should pack and device_put locally;
jax.make_array_from_process_local_data assembles the global sharded arrays.
"""

from __future__ import annotations

import jax
import numpy as np

from mlease_tpu.parallel.mesh import BLOCK_AXIS, make_mesh


def initialize(**kwargs) -> None:
    """jax.distributed.initialize passthrough (no-op when single-process)."""
    if jax.process_count() > 1 or kwargs:
        try:
            jax.distributed.initialize(**kwargs)
        except RuntimeError:
            pass  # already initialized


def global_mesh():
    """1-D block mesh over all global devices (all hosts)."""
    return make_mesh(jax.devices())


def host_block_range(nblocks: int) -> tuple[int, int]:
    """[start, end) of consensus blocks this process should load, assuming
    blocks are distributed contiguously over processes (block axis order =
    global device order)."""
    p = jax.process_index()
    n = jax.process_count()
    per = (nblocks + n - 1) // n
    return p * per, min((p + 1) * per, nblocks)


def make_global_blocked_arrays(mesh, local_arrays: dict, global_nblocks: int):
    """Assemble global sharded arrays from per-host local block shards via
    jax.make_array_from_process_local_data."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    out = {}
    for name, arr in local_arrays.items():
        axis = 1 if name == "u" else 0
        spec = [None] * axis + [BLOCK_AXIS]
        sharding = NamedSharding(mesh, P(*spec))
        global_shape = list(arr.shape)
        global_shape[axis] = global_nblocks
        out[name] = jax.make_array_from_process_local_data(
            sharding, np.asarray(arr), tuple(global_shape))
    return out
