"""Per-pass microbenchmark of the multi-RHS solver primitives on-chip.

Times the individual data passes that make up an ADMM iteration — xv (scores
gather + head MXU matmul + tail segment-sum), xtv (scatter/segment-sum),
xtv_and_sqdiag (the fused gradient+Jacobi pass), hv (one CG trip) — at the
default bench shapes, in the exact hybrid layout the trainer builds. Answers
"where does the iteration time actually go" with measurements instead of the
analytic model (bench.py's roofline is the model; this is the ground truth
it is checked against).

    python tools/pass_microbench.py            # tunneled TPU
    JAX_PLATFORMS=cpu python tools/pass_microbench.py

Prints one JSON line with per-pass ms and derived bytes/s per component.
Chained dispatch (each rep consumes the previous result) keeps the tunnel
RTT out of the steady numbers, same technique as bench.py.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_op(fn, x0, lo=10, hi=40):
    """Seconds per call by two-point slope: (t_hi - t_lo) / (hi - lo).

    On the tunneled chip block_until_ready can return before execution
    finishes; a device->host FETCH of the last result is the only reliable
    barrier — but one fetch costs a tunnel RTT, so the constant is removed
    by differencing two queue depths (the in-order device queue makes total
    time linear in reps)."""
    out = fn(x0)
    jax_fetch(out)   # compile + settle

    def total(reps):
        t0 = time.monotonic()
        out = fn(x0)
        for _ in range(reps - 1):
            out = fn(x0)
        jax_fetch(out)
        return time.monotonic() - t0

    t_lo = min(total(lo), total(lo))
    t_hi = min(total(hi), total(hi))
    return max(t_hi - t_lo, 0.0) / (hi - lo)


def jax_fetch(x):
    import jax
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(jax.device_get(leaf))


def main():
    plat = os.environ.get("JAX_PLATFORMS")
    import jax
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    import jax.numpy as jnp

    from bench import synth_blocked_data
    from mlease_tpu.core.dataset import to_hybrid
    from mlease_tpu.ops import tron_multi as tm

    n_features = int(os.environ.get("BENCH_FEATURES", 50_000))
    rows = int(os.environ.get("BENCH_ROWS", 16_384))
    nnz = int(os.environ.get("BENCH_NNZ", 15))
    L = int(os.environ.get("BENCH_LAMBDAS", 3))
    head = int(os.environ.get("BENCH_HEAD", 512))
    B = int(os.environ.get("BENCH_BLOCKS", 4))

    data, _ = synth_blocked_data(n_features, B, rows, nnz)
    data = to_hybrid(data, head)
    n = data.dim
    b = 0  # one block: per-pass cost is per block; the step vmaps B of these

    dt = jnp.float32
    prob = tm.MultiProblem(
        indices=jnp.asarray(data.indices[b]),
        values=jnp.asarray(data.values[b], dt),
        y=jnp.asarray(data.y[b], dt),
        weight=jnp.asarray(data.weight[b], dt),
        offset=jnp.asarray(data.offset[b], dt),
        prior_mean=jnp.zeros((n, L), dt),
        prior_var_inv=jnp.ones((n, L), dt),
        head_x=jnp.asarray(data.head[b], dt),
        head_ids=jnp.asarray(data.head_ids),
        tail_rows=jnp.asarray(data.tail_rows[b]),
        tail_cols=jnp.asarray(data.tail_cols[b]),
        tail_vals=jnp.asarray(data.tail_vals[b], dt),
        tail_c_rows=jnp.asarray(data.tail_c_rows[b]),
        tail_c_cols=jnp.asarray(data.tail_c_cols[b]),
        tail_c_vals=jnp.asarray(data.tail_c_vals[b], dt))

    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=(n, L)) * 0.1, dt)
    C = jnp.asarray(rng.normal(size=(rows, L)), dt)
    Dm = jnp.asarray(rng.random((rows, L)) * 0.25, dt)

    xv_j = jax.jit(tm.xv)
    xtv_j = jax.jit(tm.xtv)
    fused_j = jax.jit(tm.xtv_and_sqdiag)
    diag_j = jax.jit(tm.hessian_diagonal)
    hv_j = jax.jit(tm.hv)
    fgc_j = jax.jit(lambda p, w: tm.fun_grad_curvature(p, w, with_diag=True))

    # parts of xv in isolation (head matmul vs ELL gather vs tail)
    def head_only(V):
        return jnp.dot(prob.head_x, V[prob.head_ids],
                       preferred_element_type=V.dtype,
                       precision=jax.lax.Precision.HIGHEST)

    def ell_only(V):
        return jnp.sum(prob.values[..., None] * V[prob.indices], axis=1)

    def tail_only(V):
        contrib = prob.tail_vals[:, None] * V[prob.tail_cols]
        return jax.ops.segment_sum(contrib, prob.tail_rows,
                                   num_segments=rows, indices_are_sorted=True)

    head_j, ell_j, tail_j = (jax.jit(head_only), jax.jit(ell_only),
                             jax.jit(tail_only))

    # locality experiment (ROADMAP #1c): does gather time depend on how
    # compact the index range is? Same count/order of gathers, indices drawn
    # over the full vocab vs a 2K hot region. Equal times => a
    # frequency-ordered tail vocabulary cannot help; unequal => reordering
    # the cold tail by frequency is worth building.
    T = data.tail_rows.shape[1]
    spread_idx = jnp.asarray(rng.integers(0, n, T).astype(np.int32))
    compact_idx = jnp.asarray(rng.integers(0, min(2048, n), T)
                              .astype(np.int32))

    def gather_only(idx):
        return W[idx]

    gather_j = jax.jit(gather_only)

    K = data.indices.shape[2]
    res = {
        "xv_ms": _time_op(lambda w: xv_j(prob, w), W) * 1e3,
        "xv_head_ms": _time_op(head_j, W) * 1e3,
        "xv_ell_ms": _time_op(ell_j, W) * 1e3,
        "xv_tail_ms": _time_op(tail_j, W) * 1e3,
        "xtv_ms": _time_op(lambda c: xtv_j(prob, c), C) * 1e3,
        "diag_ms": _time_op(lambda d: diag_j(prob, d), Dm) * 1e3,
        "fused_xtv_diag_ms": _time_op(
            lambda c: fused_j(prob, c, Dm), C) * 1e3,
        "hv_ms": _time_op(lambda s: hv_j(prob, Dm, s), W) * 1e3,
        "fun_grad_diag_ms": _time_op(lambda w: fgc_j(prob, w), W) * 1e3,
        "gather_spread_ms": _time_op(gather_j, spread_idx) * 1e3,
        "gather_compact_ms": _time_op(gather_j, compact_idx) * 1e3,
    }
    res = {k: round(v, 3) for k, v in res.items()}
    shapes = {"rows": rows, "n": n, "L": L, "K_ell": K, "head": head,
              "tail_nnz": T, "block": "1 of {}".format(B),
              "device": str(jax.devices()[0])}
    print(json.dumps({"metric": "pass_microbench", "value": res["xv_ms"],
                      "unit": "ms per xv pass (single block)",
                      "vs_baseline": 0.0,
                      "detail": {"passes_ms": res, "shapes": shapes}}))


if __name__ == "__main__":
    main()
