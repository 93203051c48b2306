"""Streaming pass-floor decomposition (mlease_tpu/utils/floor.py): the
probe table composes per-group by measured trip counts, the wire term uses
measured bandwidth, and the floor is the max of the two (double buffering
overlaps wire under compute)."""

import json

import jax.numpy as jnp
import numpy as np

from mlease_tpu.core import build_vocab, pack_blocks
from mlease_tpu.train.admm import AdmmConfig
from mlease_tpu.train.streaming import StreamingAdmmTrainer
from mlease_tpu.utils import floor as fl

from test_admm import synth_rows


def _table(tmp_path, platform="cpu"):
    tab = {
        "chip": "test", "platform": platform, "layout": "flat-blocks",
        "shape": {"features": 1000, "blocks": 2, "rows": 64, "nnz": 5,
                  "lambdas": 2, "head": 4, "tail_nnz_per_block": 256,
                  "ell_k": 0},
        "floors_ms": {"xv": 1.0, "xtv": 1.0, "fused_xtv_diag": 2.0,
                      "hv": 3.0, "fun_grad_diag": 5.0},
        "null_loop_ms": 0.01, "loop_trips": 50,
    }
    p = tmp_path / "floors.json"
    p.write_text(json.dumps(tab))
    return str(p), tab


def _trainer():
    rng = np.random.default_rng(7)
    rows = synth_rows(rng, 200)
    vocab = build_vocab(rows)
    cfg = AdmmConfig(lambdas=[1.0, 10.0], num_iters=2, dtype=jnp.float64,
                     multi_rhs=True, head_size=4)
    groups = [pack_blocks([rows[:100]], vocab),
              pack_blocks([rows[100:]], vocab)]
    return StreamingAdmmTrainer(groups, vocab, cfg, resident_head=False)


def test_streaming_floor_composes_per_group(tmp_path):
    path, tab = _table(tmp_path)
    t = _trainer()
    trip_log = [np.array([[3, 10], [5, 20]]),    # iter 1 (cold — dropped)
                np.array([[2, 8], [4, 16]]),
                np.array([[2, 8], [4, 16]])]
    wire = t.stream_wire_bytes()
    out = fl.streaming_floor(t.groups, trip_log, wire, steady_iter_s=1.0,
                             bw_bytes_per_s=1e9, n_lambdas=2,
                             floors_path=path)
    e_tab = fl.table_elems(tab)
    exp_ms = 0.0
    for g, (nt, cg) in zip(t.groups, [(2.0, 8.0), (4.0, 16.0)]):
        scale = fl.group_elems(g, 2) / e_tab
        exp_ms += scale * (5.0 + nt * (1.0 + 2.0) + cg * 3.0)
    assert out["compute_floor_s"] == round(exp_ms / 1e3, 4)
    assert out["wire_floor_s"] == round(wire / 1e9, 4)
    assert out["floor_iter_s"] == max(out["compute_floor_s"],
                                      out["wire_floor_s"])
    assert out["util"] == round(out["floor_iter_s"] / 1.0, 3)
    assert out["bound"] in ("compute", "wire")
    assert len(out["per_group"]) == 2
    assert out["per_group"][1]["nt"] == 4.0


def test_streaming_floor_handles_missing_table_and_bw(tmp_path):
    t = _trainer()
    out = fl.streaming_floor(t.groups, [np.ones((2, 2))], 100, 1.0, None, 2,
                             floors_path=str(tmp_path / "absent.json"))
    assert out["floor_iter_s"] is None and "pass_floors" in out["source"]
    # wrong platform is rejected
    path, _ = _table(tmp_path, platform="tpu")
    out = fl.streaming_floor(t.groups, [np.ones((2, 2))], 100, 1.0, None, 2,
                             floors_path=path)
    assert out["floor_iter_s"] is None and "measured on" in out["source"]
    # no bandwidth -> compute-only floor, wire term reported unknown
    path, _ = _table(tmp_path)
    out = fl.streaming_floor(t.groups, [np.ones((2, 2))], 100, 1.0, None, 2,
                             floors_path=path)
    assert out["wire_floor_s"] is None
    assert out["floor_iter_s"] == out["compute_floor_s"]


def test_trainer_records_per_group_trip_log():
    """Both consensus placements record one (G, 2) counter matrix per
    iteration, consistent with the aggregate the log line prints."""
    rng = np.random.default_rng(11)
    rows = synth_rows(rng, 200)
    vocab = build_vocab(rows)
    cfg = AdmmConfig(lambdas=[1.0], num_iters=3, dtype=jnp.float64,
                     multi_rhs=True, head_size=4)
    groups = [pack_blocks([rows[:100]], vocab),
              pack_blocks([rows[100:]], vocab)]
    for consensus in (True, False):
        t = StreamingAdmmTrainer(groups, vocab, cfg, resident_head=False,
                                 consensus_device=consensus)
        res = t.run()
        assert len(t.trip_log) == res.iterations
        for m in t.trip_log:
            assert m.shape == (2, 2)
            assert (m >= 0).all() and m.sum() > 0
