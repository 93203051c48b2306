"""Sharded-mesh ADMM: 8-virtual-device CPU mesh must reproduce the
single-device result exactly (same math, psum-backed consensus)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlease_tpu.core import build_vocab, pack_blocks
from mlease_tpu.parallel import make_mesh, cpu_devices, pad_blocks
from mlease_tpu.train.admm import AdmmConfig, AdmmTrainer

from test_admm import synth_rows


def test_mesh_has_8_cpu_devices():
    assert len(cpu_devices()) == 8


@pytest.mark.parametrize("nblocks", [8, 6])  # 6: non-divisible -> padding
def test_sharded_admm_matches_single_device(nblocks):
    rng = np.random.default_rng(21)
    rows = synth_rows(rng, 400)
    test_rows = synth_rows(rng, 80)
    vocab = build_vocab(rows)
    blocks = [rows[i::nblocks] for i in range(nblocks)]
    data = pack_blocks(blocks, vocab)
    # flat_blocks=False: the mesh path keeps the block batch axis, so the
    # single-device side must run the identical vmapped trajectory
    cfg = AdmmConfig(lambdas=[1.0, 10.0], num_iters=6, dtype=jnp.float64,
                     test_loglik_per_iter=True, flat_blocks=False)

    res_single = AdmmTrainer(data, vocab, cfg, test_rows=test_rows).run()

    mesh = make_mesh(cpu_devices())
    res_mesh = AdmmTrainer(data, vocab, cfg, test_rows=test_rows,
                           mesh=mesh).run()

    np.testing.assert_allclose(res_mesh.z, res_single.z, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(res_mesh.u, res_single.u, rtol=1e-12, atol=1e-12)
    assert res_mesh.u.shape == (2, nblocks, vocab.size)
    for a, b in zip(res_mesh.sample_loglik_history,
                    res_single.sample_loglik_history):
        assert a["testLoglik"] == pytest.approx(b["testLoglik"], rel=1e-12)


def test_pad_blocks_mask():
    rng = np.random.default_rng(2)
    rows = synth_rows(rng, 50)
    vocab = build_vocab(rows)
    data = pack_blocks([rows[:25], rows[25:]], vocab)
    padded, valid = pad_blocks(data, 8)
    assert padded.nblocks == 8
    np.testing.assert_array_equal(valid, [1, 1, 0, 0, 0, 0, 0, 0])
    assert padded.weight[2:].sum() == 0
    assert not padded.present[2:].any()
