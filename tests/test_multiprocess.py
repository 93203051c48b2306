"""Two-process jax.distributed run (the real multi-host path) must match the
single-process mesh result."""

import os
import socket
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from mlease_tpu.core import build_vocab, pack_blocks
from mlease_tpu.train.admm import AdmmConfig, AdmmTrainer

from test_admm import synth_rows


def free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_matches_single():
    # the deadline is enforced at the subprocess level (communicate(timeout)
    # + kill) — pytest-timeout is not installed in this image, so a marker
    # would be a silent no-op
    port = free_port()
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    worker = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
            assert p.returncode == 0, out[-2000:]
    except subprocess.TimeoutExpired:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
        pytest.fail("distributed worker exceeded the 240 s deadline")
    zsums = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("ZSUM")]
        assert lines, out[-2000:]
        zsums.append(float(lines[-1].split()[1]))
    # both processes agree on the replicated consensus
    assert zsums[0] == pytest.approx(zsums[1], rel=1e-12)

    # single-process reference with identical config
    NBLOCKS = 8
    rng = np.random.default_rng(0)
    rows = synth_rows(rng, 400)
    vocab = build_vocab(rows)
    data = pack_blocks([rows[i::NBLOCKS] for i in range(NBLOCKS)], vocab)
    # flat_blocks=False: the worker runs mesh-sharded (block-batched) solves
    cfg = AdmmConfig(lambdas=[1.0], rhos=[1.0], num_iters=4,
                     dtype=jnp.float64, multi_rhs=True, pcg=True,
                     flat_blocks=False)
    res = AdmmTrainer(data, vocab, cfg).run()
    assert zsums[0] == pytest.approx(float(np.abs(res.z).sum()), rel=1e-9)
