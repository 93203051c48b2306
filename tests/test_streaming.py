"""Streaming (>HBM) ADMM must reproduce the in-memory trainer exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlease_tpu.core import build_vocab, pack_blocks
from mlease_tpu.train.admm import AdmmConfig, AdmmTrainer
from mlease_tpu.train.streaming import StreamingAdmmTrainer

from test_admm import synth_rows


def test_streaming_matches_in_memory():
    rng = np.random.default_rng(0)
    rows = synth_rows(rng, 400)
    vocab = build_vocab(rows)
    nblocks = 4
    blocks = [rows[i::nblocks] for i in range(nblocks)]
    cfg = AdmmConfig(lambdas=[1.0, 10.0], num_iters=6, dtype=jnp.float64,
                     multi_rhs=False)  # streaming uses the vmapped solver

    data_full = pack_blocks(blocks, vocab)
    res_mem = AdmmTrainer(data_full, vocab, cfg).run()

    # two groups of two blocks each, packed independently (different shapes)
    g1 = pack_blocks(blocks[:2], vocab)
    g2 = pack_blocks(blocks[2:], vocab)
    res_stream = StreamingAdmmTrainer([g1, g2], vocab, cfg).run()

    np.testing.assert_allclose(res_stream.z, res_mem.z, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(res_stream.u, res_mem.u, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(
        np.array([list(d.values()) for d in res_stream.diff_history]),
        np.array([list(d.values()) for d in res_mem.diff_history]),
        rtol=1e-8)


def test_streaming_l1():
    rng = np.random.default_rng(1)
    rows = synth_rows(rng, 300)
    vocab = build_vocab(rows)
    blocks = [rows[i::2] for i in range(2)]
    cfg = AdmmConfig(lambdas=[3.0], num_iters=8, regularizer=1,
                     dtype=jnp.float64, multi_rhs=False)
    res_mem = AdmmTrainer(pack_blocks(blocks, vocab), vocab, cfg).run()
    res_stream = StreamingAdmmTrainer(
        [pack_blocks([b], vocab) for b in blocks], vocab, cfg).run()
    np.testing.assert_allclose(res_stream.z, res_mem.z, rtol=1e-9, atol=1e-11)


def test_streaming_hybrid_multi_rhs():
    rng = np.random.default_rng(2)
    rows = synth_rows(rng, 300)
    vocab = build_vocab(rows)
    blocks = [rows[i::3] for i in range(3)]
    cfg = AdmmConfig(lambdas=[1.0, 10.0], num_iters=5, dtype=jnp.float64,
                     head_size=4, multi_rhs=True, pcg=True)
    res_mem = AdmmTrainer(pack_blocks(blocks, vocab), vocab, cfg).run()
    res_stream = StreamingAdmmTrainer(
        [pack_blocks(blocks[:2], vocab), pack_blocks(blocks[2:], vocab)],
        vocab, cfg).run()
    np.testing.assert_allclose(res_stream.z, res_mem.z, rtol=1e-9, atol=1e-11)
