"""Probe: sorted segment-sum vs cumsum-boundary-diff at production width.

tools/tail_locality_probe.py measured the tail passes' sorted segment-sum
reduce at ~62 ns/entry on-chip (630-740 ms for a 9.3M-entry stream) —
~40x off the HBM stream rate, and locality-insensitive: the reduce, not
the gather, is the per-pass floor at production shapes. XLA lowers
jax.ops.segment_sum to scatter-add even with indices_are_sorted, and TPU
scatter-add is element-serialized.

A SORTED segment reduction needs no scatter at all:

    P    = exclusive_prefix_sum(vals)            # (T+1, L)
    out  = P[ends] - P[starts]                   # (S, L) boundary diffs

with starts/ends the (loop-invariant) segment offset table. The prefix
sum is computed TWO-LEVEL for accuracy and speed:

    tiles   = vals.reshape(nT, K, L)
    within  = cumsum(tiles, axis=1)              # vectorized, K minor-tiled
    coarse  = exclusive cumsum of tile sums      # (nT, L), tiny
    P[t]    = coarse[t // K] + within[t // K, t % K]

Boundary diffs where start and end land in the same tile cancel the
coarse term EXACTLY, so the f32 error is the within-tile cumsum error
(~eps * sqrt(K) * scale), comparable to scatter-add's own summation
error — verified here against a float64 reference.

Measures, at PROBE_* shapes (default: the 25M production regime — 9.3M
entries, 3.1M row segments / 3.8M col segments, L=3):

    segsum_sorted    jax.ops.segment_sum(..., indices_are_sorted=True)
    cumsum_plain     jnp.cumsum along the stream axis (lowering baseline)
    boundary_diff    the two-level prefix + boundary gather + diff

    python tools/segsum_probe.py                       # tunneled TPU
    PROBE_TAIL=32128 PROBE_SEGS=16384 python tools/segsum_probe.py

Reference analogue: the reference's reduce is a java HashMap accumulate
(LibLinearDataset.java:481-484); no TPU counterpart to compare.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.pass_microbench import _time_loop  # noqa: E402


def main():
    plat = os.environ.get("JAX_PLATFORMS")
    import jax
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    import jax.numpy as jnp

    from mlease_tpu.ops.segsum import (segment_offsets,
                                       sorted_segment_sum_2level)

    T = int(os.environ.get("PROBE_TAIL", 9_275_904))
    S = int(os.environ.get("PROBE_SEGS", 3_125_000))
    L = int(os.environ.get("PROBE_LAMBDAS", 3))
    K = int(os.environ.get("PROBE_TILE", 512))
    trips = int(os.environ.get("PROBE_TRIPS", 20))
    dt = jnp.float32

    rng = np.random.default_rng(0)
    vals_np = rng.normal(size=(T, L)).astype(np.float32)
    segs_np = np.sort(rng.integers(0, S, size=T)).astype(np.int32)
    vals = jnp.asarray(vals_np, dt)
    segs = jnp.asarray(segs_np)
    bounds = segment_offsets(segs, S)           # (S+1,) int32, invariant
    TINY = jnp.asarray(1e-30, dt)

    # accuracy vs a float64 reference (exact at these magnitudes)
    ref = np.zeros((S, L), np.float64)
    np.add.at(ref, segs_np, vals_np.astype(np.float64))
    got_ss = np.asarray(jax.ops.segment_sum(
        vals, segs, num_segments=S, indices_are_sorted=True))
    got_bd = np.asarray(sorted_segment_sum_2level(vals, bounds, tile=K))
    scale = np.abs(ref).max() + 1.0
    err_ss = float(np.abs(got_ss - ref).max() / scale)
    err_bd = float(np.abs(got_bd - ref).max() / scale)

    null = _time_loop(lambda w: w.at[0, 0].add(TINY), vals, n=trips)

    def chain(fn, ops):
        return (lambda x, o: x.at[0, 0].add(jnp.sum(fn(x, o)) * TINY)), ops

    ss_fn, ss_ops = chain(
        lambda v, o: jax.ops.segment_sum(v, o[0], num_segments=S,
                                         indices_are_sorted=True), (segs,))
    cs_fn, cs_ops = chain(lambda v, o: jnp.cumsum(v, axis=0), ())
    bd_fn, bd_ops = chain(
        lambda v, o: sorted_segment_sum_2level(v, o[0], tile=K), (bounds,))

    t_ss = max(_time_loop(ss_fn, vals, n=trips, operands=ss_ops) - null, 0)
    t_cs = max(_time_loop(cs_fn, vals, n=trips, operands=cs_ops) - null, 0)
    t_bd = max(_time_loop(bd_fn, vals, n=trips, operands=bd_ops) - null, 0)

    out = {
        "entries": T, "segments": S, "lambdas": L, "tile": K,
        "trips": trips, "null_loop_ms": round(null * 1e3, 4),
        "segsum_sorted_ms": round(t_ss * 1e3, 3),
        "cumsum_plain_ms": round(t_cs * 1e3, 3),
        "boundary_diff_ms": round(t_bd * 1e3, 3),
        "speedup": round(t_ss / max(t_bd, 1e-9), 2),
        "ns_per_entry": {"segsum": round(t_ss * 1e9 / T, 2),
                         "boundary_diff": round(t_bd * 1e9 / T, 2)},
        "max_rel_err_vs_f64": {"segsum": err_ss, "boundary_diff": err_bd},
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "segsum_probe_result.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": "segsum_boundary_diff_speedup",
                      "value": out["speedup"], "unit": "x vs sorted segment_sum",
                      "vs_baseline": 0.0, "detail": out}))


if __name__ == "__main__":
    main()
