"""Probe-composed speed-of-light accounting for STREAMING iterations.

The HBM-resident trainer's utilization is checked against the measured
per-pass table (tools/pass_floors.json, written by
`tools/pass_microbench.py --floors` on-chip) composed by the run's trip
counts — bench.py `_pass_floor`. This module extends that accounting to the
streaming (>HBM) trainer at the shapes where the money is (the 25M/100M
configs): per-GROUP composed pass floors weighted by per-group measured
trip counts, plus the host->device wire term.

    compute_g     = scale_g * (fun_grad_diag + nt_g*(xv + fused_xtv_diag)
                               + cg_g*hv)          [element-scaled]
    compute_floor = sum_g compute_g
    wire_floor    = stream_wire_bytes / bw

With double buffering the wire for group g+1 rides under group g's solve,
so a steady iteration cannot beat max(compute_floor, wire_floor); the util
this module reports divides that max by the measured steady iteration time.
(The first group's transfer is not overlapped — it is part of why util<1,
not part of the floor.)

No reference counterpart: the reference's per-iteration cost model is
"re-read the partition from HDFS and run liblinear"
(RegressionAdmmTrain.java:677-690); it has no utilization accounting at all.
"""

from __future__ import annotations

import json
import os

import numpy as np


def load_floor_table(path: str | None = None, target_elems: int | None = None):
    """The measured per-pass table, or (None, reason). Platform-checked:
    floors measured on another backend are not comparable.

    With no explicit path, every tools/pass_floors*.json is considered and
    the table with element count nearest `target_elems` wins — per-pass
    cost per element is NOT constant across feature widths (gather/scatter
    at 1.9M features is a different HBM locality regime than 50K; the
    round-5 25M decomposition mis-read util 0.22 by scaling the 50K table
    245x), so the probe table must come from the matching regime."""
    import glob

    import jax
    plat = jax.devices()[0].platform
    env = os.environ.get("BENCH_FLOORS")
    if path is None and env:
        path = env
    if path is not None:
        try:
            with open(path) as f:
                tab = json.load(f)
        except (OSError, ValueError):
            return None, ("no pass_floors.json — run "
                          "tools/pass_microbench.py --floors on-chip")
        if tab.get("platform") != plat:
            return None, (f"pass_floors.json measured on "
                          f"{tab.get('platform')}, running on {plat}")
        return tab, None
    tools_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", "..", "tools")
    best, best_key = None, None
    for p in sorted(glob.glob(os.path.join(tools_dir, "pass_floors*.json"))):
        try:
            with open(p) as f:
                tab = json.load(f)
        except (OSError, ValueError):
            continue
        if tab.get("platform") != plat:
            continue
        e = max(table_elems(tab), 1)
        key = (abs(math_log_ratio(target_elems, e))
               if target_elems else 0.0)
        if best is None or key < best_key:
            best, best_key = tab, key
    if best is None:
        return None, ("no platform-matching pass_floors*.json — run "
                      "tools/pass_microbench.py --floors on-chip")
    return best, None


def math_log_ratio(a: int | None, b: int) -> float:
    import math
    if not a:
        return 0.0
    return math.log(max(a, 1) / max(b, 1))


def group_elems(g, n_lambdas: int) -> int:
    """Streamed-element count of one group's pass (the linear scaling
    variable of every pass primitive): B*(R*K + R*H + T)*L."""
    B = g.nblocks
    R = g.indices.shape[1]
    K = g.indices.shape[2]
    H = g.head.shape[2] if g.head is not None else 0
    T = (g.tail_vals.shape[1]
         if getattr(g, "tail_vals", None) is not None else 0)
    return B * (R * K + R * H + T) * n_lambdas


def table_elems(tab: dict) -> int:
    s = tab["shape"]
    return (s["blocks"] * (s["rows"] * s["ell_k"]
                           + s["rows"] * s["head"]
                           + s["tail_nnz_per_block"]) * s["lambdas"])


def streaming_floor(groups, trip_log, wire_bytes: int, steady_iter_s: float,
                    bw_bytes_per_s: float | None, n_lambdas: int,
                    floors_path: str | None = None) -> dict:
    """Compose the streaming iteration floor from the probe table.

    groups:    the trainer's (padded) group list
    trip_log:  list of per-iteration (G, 2) newton/cg counter matrices
               (StreamingAdmmTrainer.trip_log)
    wire_bytes: per-iteration host->device data bytes actually shipped
               (trainer.stream_wire_bytes())
    bw_bytes_per_s: measured host->device bandwidth (None -> wire term
               reported as unknown, util computed from compute alone)
    """
    mean_g_elems = (int(np.mean([group_elems(g, n_lambdas)
                                 for g in groups])) if groups else None)
    tab, err = load_floor_table(floors_path, target_elems=mean_g_elems)
    if tab is None:
        return {"floor_iter_s": None, "util": None, "source": err}
    if not trip_log:
        return {"floor_iter_s": None, "util": None,
                "source": "no trip log (zero iterations ran)"}
    # steady per-group trips: drop iteration 1 (cold trips differ) when
    # there are enough iterations to spare
    mats = trip_log[1:] if len(trip_log) > 1 else trip_log
    mean_trips = np.mean(np.stack(mats, axis=0), axis=0)  # (G, 2)
    fl = tab["floors_ms"]
    e_tab = max(table_elems(tab), 1)
    per_group = []
    compute_ms = 0.0
    for gi, g in enumerate(groups):
        elems = group_elems(g, n_lambdas)
        scale = elems / e_tab
        nt, cg = float(mean_trips[gi][0]), float(mean_trips[gi][1])
        g_ms = scale * (fl["fun_grad_diag"]
                        + nt * (fl["xv"] + fl["fused_xtv_diag"])
                        + cg * fl["hv"])
        compute_ms += g_ms
        per_group.append({"scale": round(scale, 4), "nt": round(nt, 1),
                          "cg": round(cg, 1),
                          "floor_ms": round(g_ms, 2)})
    compute_s = compute_ms / 1e3
    wire_s = (wire_bytes / bw_bytes_per_s if bw_bytes_per_s else None)
    floor_s = max(compute_s, wire_s) if wire_s is not None else compute_s
    bound = ("wire" if wire_s is not None and wire_s > compute_s
             else "compute")
    return {
        "floor_iter_s": round(floor_s, 4),
        "util": (round(floor_s / steady_iter_s, 3)
                 if steady_iter_s > 0 else None),
        "bound": bound,
        "compute_floor_s": round(compute_s, 4),
        "wire_floor_s": (round(wire_s, 4) if wire_s is not None else None),
        "wire_bytes_per_iter": int(wire_bytes),
        "bw_gbps": (round(bw_bytes_per_s / 1e9, 3)
                    if bw_bytes_per_s else None),
        "source": (f"composed from probe table @ {tab.get('chip')} "
                   f"(features={tab.get('shape', {}).get('features')}); "
                   "element-scaled per group; util>1 means the in-situ "
                   "solver beats the isolated-pass probe"),
        "per_group": per_group[:32],
    }


def measure_put_bandwidth(n_bytes: int = 1 << 26, tries: int = 3) -> float:
    """Measured host->device put bandwidth (bytes/s, best of `tries`).
    The streaming floor's wire denominator — on the tunneled chip this is
    the ~40-80 MB/s tunnel, on local PCIe multiple GB/s; measuring (not
    assuming) keeps the wire term honest on whatever link the run has."""
    import time

    import jax

    a = np.ones(n_bytes // 4, np.float32)
    best = float("inf")
    for _ in range(tries):
        t0 = time.monotonic()
        jax.device_put(a).block_until_ready()
        best = min(best, time.monotonic() - t0)
    return n_bytes / best
