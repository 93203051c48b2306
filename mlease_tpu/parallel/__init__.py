from mlease_tpu.parallel.mesh import (
    BLOCK_AXIS,
    block_sharding,
    cpu_devices,
    make_mesh,
    pad_blocks,
    replicated,
    shard_blocked_arrays,
)

__all__ = [
    "BLOCK_AXIS", "block_sharding", "cpu_devices", "make_mesh",
    "pad_blocks", "replicated", "shard_blocked_arrays",
]
