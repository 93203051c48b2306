"""Worker script for the two-process jax.distributed validation.

Each process owns half the consensus blocks, assembles global sharded arrays
with jax.make_array_from_process_local_data, and runs ADMM iterations whose
consensus mean crosses process boundaries — the real multi-host code path of
parallel/distributed.py, exercised on CPU (2 processes x 4 virtual devices).
Prints the final z checksum for the parent test to compare against the
single-process result.
"""

import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=num_procs, process_id=proc_id)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_admm import synth_rows  # noqa: E402

from mlease_tpu.core import build_vocab, pack_blocks  # noqa: E402
from mlease_tpu.ops import admm_math  # noqa: E402
from mlease_tpu.parallel import distributed  # noqa: E402
from mlease_tpu.train.admm import build_admm_step  # noqa: E402

NBLOCKS = 8
rng = np.random.default_rng(0)
rows = synth_rows(rng, 400)
vocab = build_vocab(rows)
blocks = [rows[i::NBLOCKS] for i in range(NBLOCKS)]
data_full = pack_blocks(blocks, vocab)

mesh = distributed.global_mesh()
assert mesh.devices.size == 4 * num_procs

lo, hi = distributed.host_block_range(NBLOCKS)
local = {name: np.asarray(getattr(data_full, name))[lo:hi]
         for name in ("indices", "values", "y", "weight", "offset",
                      "present")}
global_arrays = distributed.make_global_blocked_arrays(mesh, local, NBLOCKS)

n = data_full.dim
L = 1
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

repl = NamedSharding(mesh, P())
block_sh = NamedSharding(mesh, P(None, "block"))

step = build_admm_step(nblocks=NBLOCKS, regularizer=2,
                       intercept_index=vocab.intercept_index,
                       penalize_intercept=False, reference_l1_compat=False,
                       max_newton_iter=1000, max_cg_iter=500,
                       use_head=False, multi_rhs=True, pcg=True)

z = jax.device_put(jnp.zeros((L, n)), repl)
u = jax.device_put(jnp.zeros((L, NBLOCKS, n)), block_sh)
lam_vec = jax.device_put(jnp.full((L, n), 1.0), repl)
rho = jax.device_put(jnp.ones(L), repl)
eps_scale = jnp.asarray(
    __import__("mlease_tpu.ops.objective", fromlist=["x"]).class_balance_eps_scale(
        data_full.y, data_full.nrows))
eps = jax.device_put(0.01 * eps_scale, NamedSharding(mesh, P("block")))
block_valid = jax.device_put(jnp.ones(NBLOCKS),
                             NamedSharding(mesh, P("block")))
csc = (None, None, None)
head = (None,) * 8

for _ in range(4):
    z, u, diffs, _stats = step(global_arrays["indices"], global_arrays["values"],
                       global_arrays["y"], global_arrays["weight"],
                       global_arrays["offset"], csc, head,
                       global_arrays["present"], block_valid, z, u,
                       lam_vec, rho, rho, eps)

zsum = jax.jit(lambda a: jnp.abs(a).sum(),
               out_shardings=NamedSharding(mesh, P()))(z)
print(f"ZSUM {float(zsum):.12f}", flush=True)
jax.distributed.shutdown()
