"""Probe: is the sparse-tail pass locality-SENSITIVE at production widths?

Round-3 probes (pass_microbench gather section) showed the raw row gather is
locality-insensitive at the default 50K-feature shape (uniform / compact /
zipf-ordered / zipf-scattered all ~2.7 ns/row) — a frequency-ordered
vocabulary cannot win there. The round-5 25M floor re-measurement
(tools/pass_floors_25m.json) found per-pass cost per element is ~25x the
50K-shape rate at 1.9M-feature width: the gather/scatter working set no
longer fits whatever locality structure served the small shape, and ROADMAP
names "feature-clustered tail layouts" as the next lever — a LAYOUT claim
that was never measured at that width. This probe measures it directly.

At width W (default 1.9M, the 25M production regime) and tail size T
(default 4.6M/block x 2 blocks, the measured shape), time the two
primitives that carry the tail passes:

  gather     out[t]  = Wv[cols[t], :]            (T,L) reads from (W, L)
  rowsegsum  r[row]  = sum_t vals[t] * out[t]    (row-sorted segment_sum)
  colsegsum  g[col] += vals[t] * c[rows[t]]      (col-sorted segment_sum,
                                                  the X'v scatter direction)

with cols drawn from four id distributions over [0, W):

  compact        all ids within the first 1% of the space (extreme locality
                 ceiling — what a perfect clustering could reach)
  zipf_ranked    p(k) ~ (k+1)^-1.3, hot ids = LOW ids (what a
                 frequency-sorted vocab produces; first-occurrence order on
                 a zipf stream is approximately this)
  zipf_scattered same draw pushed through a random permutation of the id
                 space (hot ids scattered across the full width — the
                 adversarial vocab order)
  uniform        uniform over W (no hot set at all)

If zipf_ranked ~= zipf_scattered at production width, vocabulary order is
not a lever and the ROADMAP item closes negative (the pass is bound by
total bytes touched, not by where they sit). If ranked tracks compact and
beats scattered, a frequency-ordering pass at ingest is the next win.

    python tools/tail_locality_probe.py                    # tunneled TPU
    PROBE_WIDTH=50000 PROBE_TAIL=32128 python tools/tail_locality_probe.py

No reference counterpart: the reference's tail is a java HashMap walk
(LibLinearDataset.java:481-484); byte-level HBM layout has no analogue.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.pass_microbench import _time_loop  # noqa: E402

ZIPF_A = 1.3


def _draw_cols(rng, dist, W, T):
    if dist == "compact":
        return rng.integers(0, max(W // 100, 1), size=T, dtype=np.int32)
    if dist == "uniform":
        return rng.integers(0, W, size=T, dtype=np.int32)
    # truncated zipf over [0, W)
    p = 1.0 / np.power(np.arange(1, W + 1, dtype=np.float64), ZIPF_A)
    p /= p.sum()
    ids = rng.choice(W, size=T, p=p).astype(np.int32)
    if dist == "zipf_scattered":
        perm = rng.permutation(W).astype(np.int32)
        ids = perm[ids]
    return ids


def main():
    plat = os.environ.get("JAX_PLATFORMS")
    import jax
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    import jax.numpy as jnp

    W = int(os.environ.get("PROBE_WIDTH", 1_900_000))
    T = int(os.environ.get("PROBE_TAIL", 4_637_952))
    B = int(os.environ.get("PROBE_BLOCKS", 2))
    R = int(os.environ.get("PROBE_ROWS", 1_562_500))
    L = int(os.environ.get("PROBE_LAMBDAS", 3))
    trips = int(os.environ.get("PROBE_TRIPS", 20))
    dt = jnp.float32

    rng = np.random.default_rng(0)
    Wv = jnp.asarray(rng.normal(size=(B * W, L)) * 0.1, dt)
    vals = jnp.asarray(rng.normal(size=(B * T,)), dt)
    # row ids: sorted within each block (the production row-sorted tail),
    # ~T/R nnz per row, offset per block into the flat row space
    rows_np = np.sort(rng.integers(0, R, size=(B, T)), axis=1)
    rows_np += (np.arange(B, dtype=np.int64)[:, None] * R)
    rows = jnp.asarray(rows_np.reshape(-1).astype(np.int32))
    cvec = jnp.asarray(rng.normal(size=(B * R, L)), dt)
    TINY = jnp.asarray(1e-30, dt)

    null = _time_loop(lambda w: w.at[0, 0].add(TINY), Wv, n=trips)

    out = {"width": W, "tail_per_block": T, "blocks": B, "rows_per_block": R,
           "lambdas": L, "trips": trips, "null_loop_ms": round(null * 1e3, 4),
           "dists": {}}
    for dist in ("compact", "zipf_ranked", "zipf_scattered", "uniform"):
        cols_np = np.concatenate(
            [_draw_cols(rng, dist, W, T) + b * W for b in range(B)])
        cols = jnp.asarray(cols_np.astype(np.int32))
        # col-sorted copy for the scatter-direction segment_sum
        order = np.argsort(cols_np, kind="stable")
        c_cols = jnp.asarray(cols_np[order].astype(np.int32))
        c_rows = jnp.asarray(rows_np.reshape(-1)[order].astype(np.int32))
        c_vals = jnp.asarray(np.asarray(vals)[order], dt)

        def chain(fn, ops):
            return (lambda x, o: x.at[0, 0].add(jnp.sum(fn(x, o)) * TINY)), ops

        gather_fn, gops = chain(lambda w, o: w[o[0]], (cols,))
        rowss_fn, rops = chain(
            lambda w, o: jax.ops.segment_sum(
                w[o[0]] * o[1][:, None], o[2], num_segments=B * R,
                indices_are_sorted=True), (cols, vals, rows))
        # (o[3] + w[0, 0]) threads the loop carry through the otherwise
        # invariant operand read so XLA cannot hoist the pass out of the
        # chained loop; the broadcast add is noise next to the segment_sum.
        colss_fn, cops = chain(
            lambda w, o: jax.ops.segment_sum(
                (o[3] + w[0, 0])[o[1]] * o[2][:, None], o[0],
                num_segments=B * W,
                indices_are_sorted=True).sum(axis=0, keepdims=True),
            (c_cols, c_rows, c_vals, cvec))
        # colsegsum writes (B*W, L) — chain through Wv-shaped state is fine
        # because the reduction above collapses it into the scalar tap.
        g = max(_time_loop(gather_fn, Wv, n=trips, operands=gops) - null, 0)
        rs = max(_time_loop(rowss_fn, Wv, n=trips, operands=rops) - null, 0)
        cs = max(_time_loop(colss_fn, Wv, n=trips, operands=cops) - null, 0)
        out["dists"][dist] = {
            "gather_ms": round(g * 1e3, 3),
            "gather_ns_per_elem": round(g * 1e9 / (B * T), 2),
            "row_segsum_ms": round(rs * 1e3, 3),
            "col_segsum_ms": round(cs * 1e3, 3),
        }
        print(json.dumps({dist: out["dists"][dist]}), flush=True)

    ranked = out["dists"]["zipf_ranked"]["row_segsum_ms"]
    scattered = out["dists"]["zipf_scattered"]["row_segsum_ms"]
    out["ranked_vs_scattered"] = round(scattered / max(ranked, 1e-9), 3)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tail_locality_result.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": "tail_locality_ranked_vs_scattered",
                      "value": out["ranked_vs_scattered"], "unit": "x",
                      "vs_baseline": 0.0, "detail": out}))


if __name__ == "__main__":
    main()
