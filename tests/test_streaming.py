"""Streaming (>HBM) ADMM must reproduce the in-memory trainer exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlease_tpu.core import build_vocab, pack_blocks
from mlease_tpu.train.admm import AdmmConfig, AdmmTrainer
from mlease_tpu.train.streaming import StreamingAdmmTrainer

# flat_blocks=False throughout: these tests assert tight trajectory parity
# between the streaming trainer (block-batched solves) and the in-memory
# trainer, so the in-memory side must run the identical vmapped path.

from test_admm import synth_rows


def test_streaming_flat_matches_vmapped():
    """flat_blocks folds each group's blocks into one stacked solve: same
    converged consensus to solver tolerance."""
    rng = np.random.default_rng(13)
    rows = synth_rows(rng, 400)
    vocab = build_vocab(rows)
    blocks = [rows[i::4] for i in range(4)]
    groups = [pack_blocks(blocks[:2], vocab), pack_blocks(blocks[2:], vocab)]
    base = dict(lambdas=[1.0, 10.0], num_iters=6, dtype=jnp.float64,
                multi_rhs=True, liblinear_epsilon=1e-4)
    res_v = StreamingAdmmTrainer(
        groups, vocab, AdmmConfig(flat_blocks=False, **base)).run()
    res_f = StreamingAdmmTrainer(
        groups, vocab, AdmmConfig(flat_blocks=True, **base)).run()
    np.testing.assert_allclose(res_f.z, res_v.z, rtol=1e-4, atol=2e-5)


def test_streaming_matches_in_memory():
    rng = np.random.default_rng(0)
    rows = synth_rows(rng, 400)
    vocab = build_vocab(rows)
    nblocks = 4
    blocks = [rows[i::nblocks] for i in range(nblocks)]
    cfg = AdmmConfig(flat_blocks=False, lambdas=[1.0, 10.0], num_iters=6, dtype=jnp.float64,
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
    cfg = AdmmConfig(flat_blocks=False, lambdas=[3.0], num_iters=8, regularizer=1,
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
    cfg = AdmmConfig(flat_blocks=False, lambdas=[1.0, 10.0], num_iters=5, dtype=jnp.float64,
                     head_size=4, multi_rhs=True, pcg=True)
    res_mem = AdmmTrainer(pack_blocks(blocks, vocab), vocab, cfg).run()
    res_stream = StreamingAdmmTrainer(
        [pack_blocks(blocks[:2], vocab), pack_blocks(blocks[2:], vocab)],
        vocab, cfg).run()
    np.testing.assert_allclose(res_stream.z, res_mem.z, rtol=1e-9, atol=1e-11)


def test_streaming_loglik_and_best_model_parity():
    """Per-iteration sample loglik + best-model tracking must match the
    in-memory trainer (RegressionAdmmTrain.java:766-845 semantics)."""
    rng = np.random.default_rng(3)
    rows = synth_rows(rng, 400)
    test_rows = synth_rows(rng, 150)
    vocab = build_vocab(rows)
    blocks = [rows[i::4] for i in range(4)]
    cfg = AdmmConfig(flat_blocks=False, lambdas=[1.0, 10.0], num_iters=5, dtype=jnp.float64,
                     multi_rhs=False, test_loglik_per_iter=True)
    res_mem = AdmmTrainer(pack_blocks(blocks, vocab), vocab, cfg,
                          test_rows=test_rows).run()
    res_stream = StreamingAdmmTrainer(
        [pack_blocks(blocks[:2], vocab), pack_blocks(blocks[2:], vocab)],
        vocab, cfg, test_rows=test_rows).run()

    assert len(res_stream.sample_loglik_history) == \
        len(res_mem.sample_loglik_history) > 0
    for a, b in zip(res_stream.sample_loglik_history,
                    res_mem.sample_loglik_history):
        assert a["lambda"] == b["lambda"] and a["iter"] == b["iter"]
        assert np.isclose(a["testLoglik"], b["testLoglik"], rtol=1e-9)
    assert res_stream.best_lambda == res_mem.best_lambda
    assert np.isclose(res_stream.best_loglik, res_mem.best_loglik, rtol=1e-9)
    for name, v in res_mem.best_model.coefficients.items():
        assert np.isclose(res_stream.best_model.coefficients[name], v,
                          rtol=1e-8)


def test_streaming_warm_start_boost_parity():
    """z0 warm start + initialize.boost.rate must match the in-memory
    trainer (RegressionAdmmTrain.java:236-280)."""
    rng = np.random.default_rng(4)
    rows = synth_rows(rng, 300)
    vocab = build_vocab(rows)
    blocks = [rows[i::2] for i in range(2)]
    z0 = rng.normal(size=vocab.size) * 0.1
    cfg = AdmmConfig(flat_blocks=False, lambdas=[2.0], num_iters=4, dtype=jnp.float64,
                     multi_rhs=False, initialize_boost_rate=5.0)
    res_mem = AdmmTrainer(pack_blocks(blocks, vocab), vocab, cfg).run(z0=z0)
    res_stream = StreamingAdmmTrainer(
        [pack_blocks([b], vocab) for b in blocks], vocab, cfg).run(z0=z0)
    np.testing.assert_allclose(res_stream.z, res_mem.z, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(res_stream.u, res_mem.u, rtol=1e-8, atol=1e-10)


def test_streaming_mesh_parity():
    """Groups sharded over a device mesh (block axis) reproduce the
    single-device streaming result; odd block counts exercise padding."""
    import jax
    from mlease_tpu.parallel import make_mesh

    rng = np.random.default_rng(5)
    rows = synth_rows(rng, 300)
    vocab = build_vocab(rows)
    blocks = [rows[i::3] for i in range(3)]
    cfg = AdmmConfig(flat_blocks=False, lambdas=[1.0, 10.0], num_iters=4, dtype=jnp.float64,
                     multi_rhs=False)
    groups = [pack_blocks(blocks[:2], vocab), pack_blocks(blocks[2:], vocab)]
    res_plain = StreamingAdmmTrainer(groups, vocab, cfg).run()
    mesh = make_mesh(jax.devices("cpu"), n=4)
    res_mesh = StreamingAdmmTrainer(groups, vocab, cfg, mesh=mesh).run()
    np.testing.assert_allclose(res_mesh.z, res_plain.z, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(res_mesh.u, res_plain.u, rtol=1e-8, atol=1e-11)


def test_streaming_double_buffer_order():
    """The next group's transfer must be issued before the current solve's
    result is synced (the PCIe-under-solve overlap structure)."""
    rng = np.random.default_rng(6)
    rows = synth_rows(rng, 200)
    vocab = build_vocab(rows)
    blocks = [rows[i::3] for i in range(3)]
    cfg = AdmmConfig(flat_blocks=False, lambdas=[1.0], num_iters=1, dtype=jnp.float64,
                     multi_rhs=False)
    groups = [pack_blocks([b], vocab) for b in blocks]
    tr = StreamingAdmmTrainer(groups, vocab, cfg)

    events = []
    orig_put = tr._put_group
    orig_solver = tr.solver

    def put(gi, dtype):
        events.append(("put", gi))
        return orig_put(gi, dtype)

    def solver(*args):
        events.append(("solve", sum(1 for e in events if e[0] == "solve")))
        return orig_solver(*args)

    tr._put_group = put
    tr.solver = solver
    tr.run()
    first_iter = events[:6]
    assert first_iter == [("put", 0), ("solve", 0), ("put", 1),
                          ("solve", 1), ("put", 2), ("solve", 2)]


def test_streaming_resident_head_parity_and_budget():
    """resident-head mode must be bit-equivalent to streaming the head, and
    the auto budget must fall back to streaming when the heads don't fit."""
    rng = np.random.default_rng(7)
    rows = synth_rows(rng, 300)
    vocab = build_vocab(rows)
    blocks = [rows[i::4] for i in range(4)]
    cfg = AdmmConfig(lambdas=[1.0, 10.0], num_iters=4, dtype=jnp.float64,
                     head_size=4, multi_rhs=True, pcg=True)
    groups = [pack_blocks(blocks[:2], vocab), pack_blocks(blocks[2:], vocab)]

    t_res = StreamingAdmmTrainer(groups, vocab, cfg, resident_head=True)
    assert len(t_res._resident_heads) == len(t_res.groups)
    t_stream = StreamingAdmmTrainer(groups, vocab, cfg, resident_head=False)
    assert len(t_stream._resident_heads) == 0
    np.testing.assert_array_equal(np.asarray(t_res.run().z),
                                  np.asarray(t_stream.run().z))

    # auto with a zero budget: nothing fits -> fully streamed
    t_auto = StreamingAdmmTrainer(groups, vocab, cfg, resident_head="auto",
                                  resident_head_budget_gb=0.0)
    assert len(t_auto._resident_heads) == 0

    # PARTIAL budget: only the first group's head fits -> tier 1 pins it
    # per group (all-or-nothing would pin zero), results bit-identical
    one_head_gb = (t_res.groups[0].head.nbytes
                   + t_res.groups[0].head_ids.nbytes + 1) / (1 << 30)
    t_part = StreamingAdmmTrainer(groups, vocab, cfg, resident_head="auto",
                                  resident_head_budget_gb=one_head_gb,
                                  consensus_device=True)
    assert len(t_part._resident_heads) >= 1
    assert len(t_part._resident_heads) < len(t_part.groups)
    np.testing.assert_array_equal(np.asarray(t_part.run().z),
                                  np.asarray(t_stream.run().z))


def test_streaming_device_sorted_tail_matches_host_sort():
    """_sort_tail_by_column must reproduce the host pack's stable column
    sort bit-for-bit (same permutation, same summation order downstream)."""
    from mlease_tpu.core.dataset import to_hybrid
    from mlease_tpu.train.streaming import _sort_tail_by_column

    rng = np.random.default_rng(8)
    rows = synth_rows(rng, 200)
    vocab = build_vocab(rows)
    data = pack_blocks([rows[i::2] for i in range(2)], vocab)
    host = to_hybrid(data, 4, column_sorted=True)
    dev = to_hybrid(data, 4, column_sorted=False)
    assert dev.tail_c_rows is None
    r, c, v = _sort_tail_by_column(jnp.asarray(dev.tail_rows),
                                   jnp.asarray(dev.tail_cols),
                                   jnp.asarray(dev.tail_vals))
    np.testing.assert_array_equal(np.asarray(r), host.tail_c_rows)
    np.testing.assert_array_equal(np.asarray(c), host.tail_c_cols)
    np.testing.assert_array_equal(np.asarray(v), host.tail_c_vals)


def test_streaming_resident_head_reuses_device_reference():
    """_put_group must hand back the SAME pinned device arrays every
    iteration in resident mode (no re-transfer of the dense head)."""
    rng = np.random.default_rng(9)
    rows = synth_rows(rng, 200)
    vocab = build_vocab(rows)
    cfg = AdmmConfig(lambdas=[1.0], num_iters=1, dtype=jnp.float64,
                     head_size=4, multi_rhs=True)
    t = StreamingAdmmTrainer(
        [pack_blocks([rows[:100]], vocab), pack_blocks([rows[100:]], vocab)],
        vocab, cfg, resident_head=True)
    for gi in range(2):
        head = t._put_group(gi, jnp.float64)[5]
        assert head[0] is t._resident_heads[gi][0]   # head_x
        assert head[1] is t._resident_heads[gi][1]   # head_ids


def test_streaming_tiered_residency_budget_ladder():
    """Budget ladder: heads fit but full groups don't -> tier 1 only;
    infinite budget (resident_head=True) -> every group fully pinned and
    _put_group returns the identical pinned tuple."""
    rng = np.random.default_rng(10)
    rows = synth_rows(rng, 240)
    vocab = build_vocab(rows)
    cfg = AdmmConfig(lambdas=[1.0], num_iters=2, dtype=jnp.float64,
                     head_size=4, multi_rhs=True)
    groups = [pack_blocks([rows[:120]], vocab), pack_blocks([rows[120:]], vocab)]

    probe = StreamingAdmmTrainer(groups, vocab, cfg, resident_head=False)
    # tier 1 charges head.nbytes + head_ids.nbytes per group
    head_bytes = sum(g.head.nbytes + g.head_ids.nbytes
                     for g in probe.groups)
    # budget just above the heads, below heads + first group
    tight = (head_bytes + 1) / (1 << 30)
    t1 = StreamingAdmmTrainer(groups, vocab, cfg, resident_head="auto",
                              resident_head_budget_gb=tight)
    assert len(t1._resident_heads) == len(groups)
    assert not t1._resident_groups and not t1._resident_ctails

    t2 = StreamingAdmmTrainer(groups, vocab, cfg, resident_head=True)
    assert set(t2._resident_groups) == {0, 1}
    assert t2._put_group(1, jnp.float64) is t2._resident_groups[1]
    np.testing.assert_array_equal(np.asarray(t2.run().z),
                                  np.asarray(t1.run().z))


def test_streaming_host_consensus_parity():
    """consensus_device=False (host-resident duals, the >HBM-consensus
    fallback) must match the device-consensus default to float64 roundoff,
    and both must match the in-memory trainer."""
    rng = np.random.default_rng(11)
    rows = synth_rows(rng, 400)
    vocab = build_vocab(rows)
    blocks = [rows[i::4] for i in range(4)]
    cfg = AdmmConfig(flat_blocks=False, lambdas=[1.0, 10.0], num_iters=6,
                     dtype=jnp.float64, multi_rhs=True, head_size=4)
    groups = [pack_blocks(blocks[:2], vocab), pack_blocks(blocks[2:], vocab)]
    t_dev = StreamingAdmmTrainer(groups, vocab, cfg, consensus_device=True)
    t_host = StreamingAdmmTrainer(groups, vocab, cfg, consensus_device=False)
    assert t_dev.residency_report()["consensus_device"]
    assert not t_host.residency_report()["consensus_device"]
    r_dev, r_host = t_dev.run(), t_host.run()
    np.testing.assert_allclose(r_dev.z, r_host.z, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(r_dev.u, r_host.u, rtol=1e-11, atol=1e-13)

    res_mem = AdmmTrainer(pack_blocks(blocks, vocab), vocab,
                          AdmmConfig(flat_blocks=False, lambdas=[1.0, 10.0],
                                     num_iters=6, dtype=jnp.float64,
                                     multi_rhs=True, head_size=4)).run()
    np.testing.assert_allclose(r_dev.z, res_mem.z, rtol=1e-9, atol=1e-11)


def test_streaming_callback_contract():
    """The per-iteration callback receives host (z, u) whose u-deltas
    reconstruct x exactly as the pipeline's write.train.output dump expects
    (u_new = u_old + x - z), in BOTH consensus placements."""
    rng = np.random.default_rng(12)
    rows = synth_rows(rng, 300)
    vocab = build_vocab(rows)
    blocks = [rows[i::3] for i in range(3)]
    groups = [pack_blocks(blocks[:2], vocab), pack_blocks(blocks[2:], vocab)]
    for dev_mode in (True, False):
        cfg = AdmmConfig(flat_blocks=False, lambdas=[2.0], num_iters=3,
                         dtype=jnp.float64, multi_rhs=False)
        seen = []

        def cb(iteration, z, u, diffs, inner_eps, logliks=None):
            seen.append((iteration, np.asarray(z, np.float64).copy(),
                         np.asarray(u, np.float64).copy()))

        t = StreamingAdmmTrainer(groups, vocab, cfg,
                                 consensus_device=dev_mode)
        res = t.run(callback=cb)
        assert [s[0] for s in seen] == list(range(1, res.iterations + 1))
        # u telescopes: u_k = sum_i (x_i - z_i); final callback state == result
        np.testing.assert_allclose(seen[-1][1], res.z, rtol=1e-12)
        np.testing.assert_allclose(seen[-1][2], res.u, rtol=1e-12)
        assert seen[-1][2].shape == (1, 3, vocab.size)


def test_streaming_resume_matches_uninterrupted():
    """z0/u0/start_iteration resume (the checkpoint contract) reproduces an
    uninterrupted run exactly."""
    rng = np.random.default_rng(14)
    rows = synth_rows(rng, 300)
    vocab = build_vocab(rows)
    blocks = [rows[i::2] for i in range(2)]
    groups = [pack_blocks([b], vocab) for b in blocks]
    cfg = AdmmConfig(flat_blocks=False, lambdas=[1.0], num_iters=6,
                     dtype=jnp.float64, multi_rhs=False)
    full = StreamingAdmmTrainer(groups, vocab, cfg).run()

    cfg3 = AdmmConfig(flat_blocks=False, lambdas=[1.0], num_iters=3,
                      dtype=jnp.float64, multi_rhs=False)
    state = {}

    def cb(iteration, z, u, diffs, inner_eps, logliks=None):
        state.update(inner_eps=inner_eps, mindiff=float(diffs.min()))

    part = StreamingAdmmTrainer(groups, vocab, cfg3).run(callback=cb)
    resumed = StreamingAdmmTrainer(groups, vocab, cfg).run(
        z0=part.z, u0=part.u, start_iteration=4,
        inner_eps0=state["inner_eps"], mindiff0=state["mindiff"])
    np.testing.assert_allclose(resumed.z, full.z, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(resumed.u, full.u, rtol=1e-9, atol=1e-12)


def test_compact_wire_bit_parity_and_accounting():
    """COO-head + permutation-tail wire must be EXACT: the reconstructed
    device arrays are bitwise the host arrays, so the full run's z matches
    the dense-wire run bit for bit; the accounting must report a strictly
    smaller per-iteration wire."""
    rng = np.random.default_rng(21)
    rows = synth_rows(rng, 400)
    vocab = build_vocab(rows)
    blocks = [rows[i::4] for i in range(4)]
    cfg = AdmmConfig(lambdas=[1.0, 10.0], num_iters=4, dtype=jnp.float64,
                     multi_rhs=True, head_size=4, flat_blocks=False)
    groups = [pack_blocks(blocks[:2], vocab), pack_blocks(blocks[2:], vocab)]
    t_dense = StreamingAdmmTrainer(groups, vocab, cfg, resident_head=False,
                                   compact_wire=False)
    t_coo = StreamingAdmmTrainer(groups, vocab, cfg, resident_head=False,
                                 compact_wire=True)
    assert set(t_coo._wire) == {0, 1}
    assert t_coo.stream_wire_bytes() < t_dense.stream_wire_bytes()
    assert t_coo.residency_report()["compact_wire_groups"] == 2

    # reconstructed group tuple == dense-path group tuple, bit for bit
    d = t_dense._put_group(0, jnp.float64)
    c = t_coo._put_group(0, jnp.float64)
    for a, b in zip(d[5], c[5]):  # the 8-tuple of hybrid head/tail arrays
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    np.testing.assert_array_equal(np.asarray(t_dense.run().z),
                                  np.asarray(t_coo.run().z))


def test_compact_wire_with_pinned_ctails_ships_only_perm():
    """With the column-sorted tails pinned (tier 3), a compact-wire group
    ships only the permutation + COO head + row arrays."""
    rng = np.random.default_rng(22)
    rows = synth_rows(rng, 240)
    vocab = build_vocab(rows)
    cfg = AdmmConfig(lambdas=[1.0], num_iters=2, dtype=jnp.float64,
                     head_size=4, multi_rhs=True)
    groups = [pack_blocks([rows[:120]], vocab),
              pack_blocks([rows[120:]], vocab)]
    probe = StreamingAdmmTrainer(groups, vocab, cfg, resident_head=False)
    from mlease_tpu.train.streaming import _ctail_bytes
    head_b = sum(g.head.nbytes + g.head_ids.nbytes for g in probe.groups)
    ctail_b = sum(_ctail_bytes(g) for g in probe.groups)
    budget = (head_b + ctail_b + 1) / (1 << 30)
    t = StreamingAdmmTrainer(groups, vocab, cfg, resident_head="auto",
                             resident_head_budget_gb=budget)
    assert len(t._resident_ctails) == len(groups)
    wire = t.stream_wire_bytes()
    # perm is 4 B/nnz; the two tail layouts it replaces are 24 B/nnz
    dense = t._dense_wire_bytes()
    assert wire < dense
    # and the run still matches the fully-dense-wire trainer bitwise
    t0 = StreamingAdmmTrainer(groups, vocab, cfg, resident_head=False,
                              compact_wire=False)
    np.testing.assert_array_equal(np.asarray(t.run().z),
                                  np.asarray(t0.run().z))


def test_compact_wire_requires_single_device():
    rng = np.random.default_rng(23)
    rows = synth_rows(rng, 100)
    vocab = build_vocab(rows)
    cfg = AdmmConfig(lambdas=[1.0], num_iters=1, dtype=jnp.float64,
                     head_size=4, multi_rhs=True)
    groups = [pack_blocks([rows[:50]], vocab), pack_blocks([rows[50:]], vocab)]
    import jax
    from mlease_tpu.parallel import make_mesh
    mesh = make_mesh(jax.devices(), n=2)
    with pytest.raises(ValueError, match="single device"):
        StreamingAdmmTrainer(groups, vocab, cfg, mesh=mesh,
                             compact_wire=True)
    # auto under a mesh: silently stays dense
    t = StreamingAdmmTrainer(groups, vocab, cfg, mesh=mesh,
                             compact_wire="auto")
    assert not t._wire


def test_tail_padding_harmonizes_shapes_bit_exactly():
    """pad_tails collapses per-group tail widths (each its own compiled
    solver/wire program) to one shared shape with BIT-identical results:
    the padding entries are (0, 0, 0.0) no-ops for every segment sum, and
    the padding-aware inverse permutation reconstructs the padded
    row-sorted tail exactly on device."""
    rng = np.random.default_rng(31)
    rows = synth_rows(rng, 500)
    vocab = build_vocab(rows)
    blocks = [rows[:40], rows[40:80], rows[80:290], rows[290:]]
    groups = [pack_blocks(blocks[:2], vocab), pack_blocks(blocks[2:], vocab)]
    cfg = AdmmConfig(lambdas=[1.0, 10.0], num_iters=4, dtype=jnp.float64,
                     multi_rhs=True, head_size=4)
    t_raw = StreamingAdmmTrainer(groups, vocab, cfg, resident_head=False,
                                 pad_tails=False)
    t_pad = StreamingAdmmTrainer(groups, vocab, cfg, resident_head=False,
                                 pad_tails=True)
    widths_raw = {g.tail_rows.shape[1] for g in t_raw.groups}
    widths_pad = {g.tail_rows.shape[1] for g in t_pad.groups}
    assert len(widths_raw) > 1           # fixture really is heterogeneous
    assert len(widths_pad) == 1
    assert t_pad._tail_orig_T            # at least one group was padded

    # the reconstructed compact-wire group tuple must be bitwise the padded
    # host arrays (gather through the padding-aware permutation)
    for gi in t_pad._wire:
        g = t_pad.groups[gi]
        _, _, _, _, _, head, _ = t_pad._put_group(gi, jnp.float64)
        _, _, t_r, t_c, t_v, tc_r, tc_c, tc_v = head
        np.testing.assert_array_equal(np.asarray(t_r), g.tail_rows)
        np.testing.assert_array_equal(np.asarray(t_c), g.tail_cols)
        np.testing.assert_array_equal(np.asarray(t_v), g.tail_vals)
        np.testing.assert_array_equal(np.asarray(tc_c), g.tail_c_cols)

    res_raw, res_pad = t_raw.run(), t_pad.run()
    np.testing.assert_array_equal(np.asarray(res_pad.z),
                                  np.asarray(res_raw.z))
    np.testing.assert_array_equal(np.asarray(res_pad.u),
                                  np.asarray(res_raw.u))


def test_tail_padding_auto_respects_overhead_cap():
    """auto (the default) pads mildly-heterogeneous groups but skips when
    padding would add >25% tail bytes (shipping mostly-padding would cost
    more than the per-group compiles save)."""
    rng = np.random.default_rng(33)
    rows = synth_rows(rng, 500)
    vocab = build_vocab(rows)
    cfg = AdmmConfig(lambdas=[1.0], num_iters=1, dtype=jnp.float64,
                     multi_rhs=True, head_size=4)
    # skewed split: per-group widths differ by ~5x -> auto must skip
    blocks = [rows[:40], rows[40:80], rows[80:290], rows[290:]]
    skew = [pack_blocks(blocks[:2], vocab), pack_blocks(blocks[2:], vocab)]
    t = StreamingAdmmTrainer(skew, vocab, cfg, resident_head=False)
    assert not t._tail_orig_T
    assert len({g.tail_rows.shape[1] for g in t.groups}) > 1
    # mild split -> auto pads
    blocks = [rows[:150], rows[150:290], rows[290:420], rows[420:]]
    mild = [pack_blocks(blocks[:2], vocab), pack_blocks(blocks[2:], vocab)]
    t2 = StreamingAdmmTrainer(mild, vocab, cfg, resident_head=False)
    raw_widths = {g.tail_rows.shape[1]
                  for g in StreamingAdmmTrainer(
                      mild, vocab, cfg, resident_head=False,
                      pad_tails=False).groups}
    if len(raw_widths) > 1:              # synth shapes may already agree
        assert t2._tail_orig_T
        assert len({g.tail_rows.shape[1] for g in t2.groups}) == 1


def test_head_coo_shared_length_padding():
    """Compact head-COO triplets pad to ONE shared length (one scatter
    program per run) and the additive scatter makes the pads exact."""
    from mlease_tpu.train.streaming import (_pad_head_coo_shared,
                                            _scatter_head_dense)
    rng = np.random.default_rng(34)
    wire = {}
    dense = {}
    for gi, nnz in enumerate([37, 91, 64]):
        rows = rng.integers(0, 16, size=nnz).astype(np.int32)
        cols = rng.integers(0, 4, size=nnz).astype(np.uint8)
        vals = rng.normal(size=nnz).astype(np.float32)
        wire[gi] = {"head_coo": (rows, cols, vals)}
        ref = np.zeros((16, 4), np.float32)
        np.add.at(ref, (rows, cols.astype(np.int64)), vals)
        dense[gi] = ref.reshape(2, 8, 4)
    _pad_head_coo_shared(wire)
    lens = {w["head_coo"][0].shape[0] for w in wire.values()}
    assert lens == {91}
    for gi, w in wire.items():
        r, c, v = w["head_coo"]
        got = np.asarray(_scatter_head_dense(
            jnp.asarray(r), jnp.asarray(c), jnp.asarray(v), (2, 8, 4)))
        np.testing.assert_array_equal(got, dense[gi])


def test_streaming_relaxation_matches_in_memory():
    """cfg.relaxation applies in the streaming solver exactly as in the
    in-memory trainer (it was silently ignored before r5): same relaxed
    consensus trajectory."""
    rng = np.random.default_rng(41)
    rows = synth_rows(rng, 400)
    vocab = build_vocab(rows)
    blocks = [rows[i::4] for i in range(4)]
    cfg = AdmmConfig(flat_blocks=False, lambdas=[1.0, 10.0], num_iters=5,
                     dtype=jnp.float64, multi_rhs=False, relaxation=1.6)
    res_mem = AdmmTrainer(pack_blocks(blocks, vocab), vocab, cfg).run()
    groups = [pack_blocks(blocks[:2], vocab), pack_blocks(blocks[2:], vocab)]
    res_stream = StreamingAdmmTrainer(groups, vocab, cfg).run()
    np.testing.assert_allclose(res_stream.z, res_mem.z, rtol=1e-9,
                               atol=1e-11)
    np.testing.assert_allclose(res_stream.u, res_mem.u, rtol=1e-8,
                               atol=1e-10)
