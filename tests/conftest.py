"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the analogue of the reference's `is.local=true` single-process Hadoop
mode (reference: src/main/java/com/linkedin/mapred/AbstractAvroJob.java:260-267):
multi-"node" flows run in one process, here as 8 XLA host devices so that all
sharding/collective paths are exercised without TPU hardware.
"""

import os

# The image pins JAX_PLATFORMS=axon (single tunneled TPU chip); tests must
# not contend for it, so force CPU before jax initializes a backend.
os.environ["JAX_PLATFORMS"] = "cpu"
# Math-parity tests compare against the reference's float64 semantics; the
# framework itself creates every array with an explicit dtype, so enabling
# x64 here does not change the float32 production path.
os.environ["JAX_ENABLE_X64"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def sample_data_path():
    path = "/root/reference/examples/sample-data.avro"
    if not os.path.exists(path):
        pytest.skip("reference sample data not available")
    return path
