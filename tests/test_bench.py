"""bench.py smoke tests — the driver's only window into this framework's
performance is ONE parseable JSON line on stdout (round-1 failure: rc 124,
parsed null). These tests run the real bench script in a subprocess on the
CPU backend with tiny shapes and assert the contract the driver relies on:
rc 0, every stdout line is valid JSON, and the FINAL line carries a positive
measurement with the metric/value/unit/vs_baseline fields.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")

TINY = {
    "JAX_PLATFORMS": "cpu",
    "BENCH_FEATURES": "2000",
    "BENCH_BLOCKS": "2",
    "BENCH_ROWS": "512",
    "BENCH_NNZ": "5",
    "BENCH_LAMBDAS": "2",
    "BENCH_ITERS": "2",
    "BENCH_CONV_ITERS": "2",
    "BENCH_HEAD": "32",
}


def _run_bench(tmp_path, extra_env, timeout=600):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # single-device CPU is fine for the smoke run
    env["MLEASE_JAX_CACHE"] = str(tmp_path / "jax_cache")
    env["BENCH_DETAIL_PATH"] = str(tmp_path / "BENCH_DETAIL.json")
    env.update(TINY)
    env.update(extra_env)
    proc = subprocess.run(
        [sys.executable, BENCH], capture_output=True, text=True,
        timeout=timeout, cwd=REPO, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert lines, f"no stdout lines; stderr: {proc.stderr[-2000:]}"
    parsed = [json.loads(ln) for ln in lines]  # every line must parse
    for rec in parsed:
        for field in ("metric", "value", "unit", "vs_baseline"):
            assert field in rec, f"missing {field}: {rec}"
    # THE driver contract (round-4 failure: rc 0 / parsed null): the final
    # line must be fully contained in the last 2000 bytes of stdout and
    # parse standalone — simulate the driver's exact read.
    tail = proc.stdout[-2000:]
    tail_lines = [ln for ln in tail.splitlines() if ln.strip()]
    final_from_tail = json.loads(tail_lines[-1])
    assert final_from_tail == parsed[-1]
    assert len(lines[-1]) <= 1500, f"final line {len(lines[-1])}B > budget"
    return parsed


@pytest.mark.slow
def test_bench_admm_emits_final_json(tmp_path):
    """Default mode end-to-end on CPU: the final line is the COMPACT
    steady-state measurement (positive iter/s, flattened convergence
    headline scalars); the preceding line carries the full record with the
    nested convergence blob, mirrored to the sidecar file."""
    parsed = _run_bench(tmp_path, {"BENCH_DEADLINE": "0"})
    final = parsed[-1]
    assert final["metric"] == "admm_iterations_per_s"
    assert final["value"] > 0
    assert final["detail"]["conv_best_loglik"] < 0
    assert "device_acquire_s" in final["detail"]
    full = parsed[-2]
    assert full["metric"] == final["metric"]
    assert full["value"] == final["value"]
    assert full["detail"]["convergence"]["best_loglik"] == \
        final["detail"]["conv_best_loglik"]
    sidecar = json.loads((tmp_path / "BENCH_DETAIL.json").read_text())
    assert sidecar == full


@pytest.mark.slow
def test_bench_streaming_emits_final_json(tmp_path):
    """BENCH_MODE=streaming on CPU: positive iter/s, the ACTUAL pinned state
    reported (heads pinned + device-resident consensus in the default
    configuration — not the requested mode string), and a nonzero
    data-streamed accounting (tails still wire per iteration) with zero
    consensus wire."""
    parsed = _run_bench(tmp_path, {"BENCH_MODE": "streaming",
                                   "BENCH_GROUPS": "2",
                                   "BENCH_DEADLINE": "0"})
    final = parsed[-1]
    assert final["metric"] == "streaming_admm_iterations_per_s"
    assert final["value"] > 0
    assert final["detail"]["data_streamed_mb_per_iter"] > 0
    # residency flattened onto the compact final line
    assert final["detail"]["heads_pinned"] == final["detail"]["n_groups"]
    assert final["detail"]["consensus_device"] is True
    assert final["detail"]["consensus_mb_per_iter"] == 0
    residency = parsed[-2]["detail"]["residency"]   # nested on the full line
    assert residency["heads_pinned"] == residency["n_groups"]


@pytest.mark.slow
def test_bench_watchdog_two_stage(tmp_path):
    """With an immediate soft deadline the stage-1 watchdog must print a
    parseable line and KEEP RUNNING to the full result: the last line must
    still be a positive measurement (last-line-wins driver parsing), and the
    earlier watchdog line must also have been parseable (asserted in
    _run_bench for every line)."""
    parsed = _run_bench(tmp_path, {
        "BENCH_DEADLINE": "1", "BENCH_HARD_DEADLINE": "590",
        "BENCH_SKIP_CONV": "1"})
    assert len(parsed) >= 2, "stage-1 watchdog line + final line expected"
    assert parsed[-1]["value"] > 0


@pytest.mark.slow
def test_bench_acquire_stall_heartbeats_and_budget(tmp_path):
    """Chip contention contract (BENCH_r03 failure mode): while blocked in
    device-acquire the bench must (a) NOT charge the wait against
    BENCH_DEADLINE/BENCH_HARD_DEADLINE, (b) emit parseable heartbeat JSON,
    and (c) exit 0 with a diagnostic line when BENCH_ACQUIRE_DEADLINE is
    exhausted. Simulated by installing a warmup probe that never resolves."""
    code = (
        "import threading, time, bench\n"
        "bench._T_START = time.monotonic()\n"
        "threading.Thread(target=bench._watchdog_thread, args=(3.0, 6.0),\n"
        "                 daemon=True).start()\n"
        "bench._ACQUIRE_T0 = time.monotonic()\n"
        "bench._WARMUP = object()  # never resolves: simulated busy chip\n"
        "bench._finish_device_acquire()\n"
        "raise SystemExit('unreachable: acquire budget must os._exit(0)')\n"
    )
    env = dict(os.environ)
    env.update(TINY)
    env.update({"BENCH_ACQUIRE_DEADLINE": "12",
                "BENCH_ACQUIRE_HEARTBEAT": "4",
                # deadlines far BELOW the acquire budget: if the wait were
                # charged, the hard watchdog would fire first and the last
                # line would be the generic DEADLINE diagnostic instead
                "BENCH_DEADLINE": "3", "BENCH_HARD_DEADLINE": "6"})
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120, cwd=REPO, env=env)
    assert proc.returncode == 0, (proc.stdout, proc.stderr[-2000:])
    lines = [json.loads(ln) for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) >= 2, lines  # >=1 heartbeat + the budget diagnostic
    assert any("heartbeat" in rec["unit"] for rec in lines[:-1])
    final = lines[-1]
    assert "BENCH_ACQUIRE_DEADLINE" in final["unit"]
    assert final["detail"]["acquire_wait_s"] >= 12
    assert final["value"] == 0.0


def test_bench_charged_seconds_excludes_acquire_wait():
    """The watchdog charges elapsed-minus-acquire-blocked time."""
    sys.path.insert(0, REPO)
    import bench
    t0 = bench._T_START
    bench._ACQUIRE_EXCLUDED = 7.0
    bench._ACQUIRE_BLOCK_T0 = None
    try:
        assert bench._charged_seconds(t0 + 10.0) == pytest.approx(3.0)
        bench._ACQUIRE_BLOCK_T0 = t0 + 8.0
        assert bench._charged_seconds(t0 + 10.0) == pytest.approx(1.0)
    finally:
        bench._ACQUIRE_EXCLUDED = 0.0
        bench._ACQUIRE_BLOCK_T0 = None


@pytest.mark.slow
def test_bench_pass_floor_from_table(tmp_path):
    """detail.roofline.pass_floor composes the probe table by the run's trip
    counts; a table measured at another shape takes the element-scaled path
    and still yields a positive utilization."""
    floors = {
        "chip": "cpu-test", "platform": "cpu", "layout": "flat-blocks",
        "shape": {"features": 1000, "blocks": 2, "rows": 256, "nnz": 5,
                  "lambdas": 2, "head": 32, "tail_nnz_per_block": 600,
                  "ell_k": 0},
        "floors_ms": {"xv": 0.1, "xtv": 0.1, "fused_xtv_diag": 0.15,
                      "hv": 0.2, "fun_grad_diag": 0.25},
        "null_loop_ms": 0.01, "loop_trips": 50,
    }
    fpath = tmp_path / "floors.json"
    fpath.write_text(json.dumps(floors))
    parsed = _run_bench(tmp_path, {"BENCH_DEADLINE": "0",
                                   "BENCH_SKIP_CONV": "1",
                                   "BENCH_FLOORS": str(fpath)})
    pf = parsed[-2]["detail"]["roofline"]["pass_floor"]  # full record line
    assert pf["floor_iter_s"] > 0
    assert pf["util"] > 0
    assert pf["source"].startswith(("scaled", "measured"))
    assert "row_rate_util" not in parsed[-2]["detail"]["roofline"]
    # and the compact final line carries the flattened utilization
    assert parsed[-1]["detail"]["pass_floor_util"] == pf["util"]
    assert parsed[-1]["detail"]["pass_floor_iter_s"] == pf["floor_iter_s"]


def test_bench_compact_record_caps_final_line():
    """_compact_record drops lists/dicts, keeps scalars + whitelisted nested
    scalars, and hard-caps the line length even against adversarial detail
    (many long scalar keys)."""
    sys.path.insert(0, REPO)
    import bench
    rec = {
        "metric": "m", "value": 1.5, "unit": "iter/s", "vs_baseline": 45.0,
        "detail": {
            "steady_iter_s": 0.07,
            "iter_times_s": list(range(500)),         # list → dropped
            "roofline": {"mfu": 0.01, "bw_util": 0.5,
                         "pass_floor": {"util": 0.82, "floor_iter_s": 0.06,
                                        "floors_ms": {"xv": 1.0}}},
            "convergence": {"best_loglik": -0.497,
                            "z_vs_single_inf_final": [0.2, 0.04],
                            "z_vs_single_inf_traj": [0.1] * 300},
            "residency": {"heads_pinned": 4, "n_groups": 4,
                          "consensus_device": True, "tiers": {"a": 1}},
        },
    }
    line = bench._compact_record(rec)
    assert len(line) <= 1500
    out = json.loads(line)
    assert out["value"] == 1.5
    d = out["detail"]
    assert d["steady_iter_s"] == 0.07
    assert "iter_times_s" not in d
    assert d["pass_floor_util"] == 0.82
    assert d["conv_best_loglik"] == -0.497
    assert d["conv_z_inf_final_max"] == 0.2
    assert d["heads_pinned"] == 4 and d["consensus_device"] is True

    # adversarial: 200 scalar keys with long names still fits the cap
    rec["detail"].update({f"long_scalar_key_number_{i:04d}": i * 1.0
                          for i in range(200)})
    line = bench._compact_record(rec)
    assert len(line) <= 1500
    assert json.loads(line)["metric"] == "m"
