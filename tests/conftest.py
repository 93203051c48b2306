"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the analogue of the reference's `is.local=true` single-process Hadoop
mode (reference: src/main/java/com/linkedin/mapred/AbstractAvroJob.java:260-267):
multi-"node" flows run in one process, here as 8 XLA host devices so that all
sharding/collective paths are exercised without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def sample_data_path():
    path = "/root/reference/examples/sample-data.avro"
    if not os.path.exists(path):
        pytest.skip("reference sample data not available")
    return path
