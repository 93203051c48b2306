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

Measurement technique: the tunnel has a per-dispatch floor (~0.2 ms) and
multi-ms fetch jitter, so sub-ms ops CANNOT be timed by repeated dispatch.
Each primitive instead runs N times inside ONE jitted lax.fori_loop with a
real (value-negligible) data dependence between trips — one dispatch, one
fetch, per-trip time = total / N; the loop-carried dependence stops XLA
hoisting the loop-invariant computation.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TRIPS = int(os.environ.get("MICROBENCH_TRIPS", 200))


def jax_fetch(x):
    import jax
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(jax.device_get(leaf))


def _time_loop(step, x0, tries=3, n=N_TRIPS, operands=None):
    """Seconds per `step` application: n chained inside one program.

    `step` must map x -> x (same pytree) with a true data dependence so the
    while-body cannot be hoisted; the added chaining arithmetic is a few
    scalar flops per trip — noise against the 10^5-element passes timed.

    operands: optional pytree passed as a jit OPERAND to step(x, operands)
    instead of a closure capture — closures bake the problem data into the
    program as literals, which the tunnel's remote-compile endpoint rejects
    above ~its body limit at production shapes (HTTP 413)."""
    import jax

    if operands is None:
        @jax.jit
        def loop(x):
            return jax.lax.fori_loop(0, n, lambda i, v: step(v), x)

        def run():
            return loop(x0)
    else:
        @jax.jit
        def loop(x, ops):
            return jax.lax.fori_loop(0, n, lambda i, v: step(v, ops), x)

        def run():
            return loop(x0, operands)

    out = run()
    jax_fetch(out)   # compile + settle

    def total():
        t0 = time.monotonic()
        jax_fetch(run())
        return time.monotonic() - t0

    return min(total() for _ in range(tries)) / n


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
    TINY = jnp.asarray(1e-30, dt)   # runtime-zero-ish, not foldable

    def chainW(fn):
        """x -> x step around fn(x): the FULL output reduces into the carry
        (a sum, so no element of fn(x) is dead and XLA cannot slice the
        gathers down to the one element the chain consumes)."""
        return lambda x: x.at[0, 0].add(jnp.sum(fn(x)) * TINY)

    def chainC(fn):
        return lambda c: c.at[0, 0].add(jnp.sum(fn(c)) * TINY)

    # parts of xv in isolation (head matmul vs ELL gather vs tail)
    def head_only(V):
        return jnp.dot(prob.head_x, V[prob.head_ids],
                       preferred_element_type=V.dtype,
                       precision=jax.lax.Precision.HIGHEST)

    def ell_only(V):
        if prob.indices.shape[-1] == 0:
            return jnp.zeros((1,), V.dtype)
        return jnp.sum(prob.values[..., None] * V[prob.indices], axis=1)

    def tail_only(V):
        contrib = prob.tail_vals[:, None] * V[prob.tail_cols]
        return jax.ops.segment_sum(contrib, prob.tail_rows,
                                   num_segments=rows, indices_are_sorted=True)

    # locality experiments (ROADMAP #1c): does gather time depend on how
    # compact the accessed region is? Four index sets with identical counts:
    # uniform over the vocab, uniform over a 2K region, zipf with hot ids
    # compact at the low end (frequency-ordered vocab), and the SAME zipf
    # draws scattered through a fixed random permutation (first-occurrence
    # vocab, the reference ingest order). zipf_ordered beating zipf_scattered
    # is the measured case for frequency-ordering the vocabulary.
    T = data.tail_rows.shape[1]
    spread_idx = jnp.asarray(rng.integers(0, n, T).astype(np.int32))
    compact_idx = jnp.asarray(rng.integers(0, min(2048, n), T)
                              .astype(np.int32))
    zipf_np = ((rng.zipf(1.3, size=T).astype(np.int64) - 1)
               % n).astype(np.int32)
    perm = rng.permutation(n).astype(np.int32)
    zipf_ordered = jnp.asarray(zipf_np)
    zipf_scattered = jnp.asarray(perm[zipf_np])

    def chain_gather(idx0):
        # idx -> idx dependence through a FULL reduce of the gathered rows
        def step(idx):
            g = W[idx]
            return idx.at[0].add((jnp.sum(g) * TINY).astype(jnp.int32))
        return step

    # vmapped-over-all-blocks variants: the trainer's step runs B blocks in
    # one program; comparing against B x single-block isolates vmap overhead
    prob4 = tm.MultiProblem(
        indices=jnp.asarray(data.indices),
        values=jnp.asarray(data.values, dt),
        y=jnp.asarray(data.y, dt),
        weight=jnp.asarray(data.weight, dt),
        offset=jnp.asarray(data.offset, dt),
        prior_mean=jnp.zeros((B, n, L), dt),
        prior_var_inv=jnp.ones((B, n, L), dt),
        head_x=jnp.asarray(data.head, dt),
        head_ids=jnp.asarray(data.head_ids),
        tail_rows=jnp.asarray(data.tail_rows),
        tail_cols=jnp.asarray(data.tail_cols),
        tail_vals=jnp.asarray(data.tail_vals, dt),
        tail_c_rows=jnp.asarray(data.tail_c_rows),
        tail_c_cols=jnp.asarray(data.tail_c_cols),
        tail_c_vals=jnp.asarray(data.tail_c_vals, dt))
    in_axes4 = tm.MultiProblem(indices=0, values=0, y=0, weight=0, offset=0,
                               prior_mean=0, prior_var_inv=0, head_x=0,
                               head_ids=None, tail_rows=0, tail_cols=0,
                               tail_vals=0, tail_c_rows=0, tail_c_cols=0,
                               tail_c_vals=0)
    hv4 = jax.vmap(tm.hv, in_axes=(in_axes4, 0, 0))
    fgc4 = jax.vmap(lambda p, w: tm.fun_grad_curvature(p, w, with_diag=True),
                    in_axes=(in_axes4, 0))
    W4 = jnp.broadcast_to(W, (B, n, L))
    Dm4 = jnp.broadcast_to(Dm, (B, rows, L))

    def chainW4(fn):
        return lambda x: x.at[0, 0, 0].add(jnp.sum(fn(x)) * TINY)

    # one full warm-started multi-RHS TRON solve, all blocks, realistic
    # tolerance — the whole x-update of an ADMM iteration in one number
    def solve_all(x):
        def one(p, w0):
            r = tm.tron_multi(p, w0, 0.01, max_iter=1000, max_cg_iter=500,
                              precondition=True)
            return r.w, r.newton_trips, r.cg_trips
        w, nt, cg = jax.vmap(one, in_axes=(in_axes4, 0))(prob4, x)
        return w, nt, cg

    solve_j = jax.jit(lambda x: solve_all(x)[0])
    _, nt4, cg4 = jax.jit(solve_all)(W4 * 0)
    solve_trips = (int(np.asarray(nt4).max()), int(np.asarray(cg4).max()))

    W4_zero = W4 * 0

    # flat-vs-vmapped experiment: the same B tails as (a) a vmapped batch
    # over (B, T) COO into per-block (n, L) slabs vs (b) ONE flat (B*T,) COO
    # with block-offset ids into a stacked (B*n, L) slab. Equal gathers,
    # equal segment-sum elements — any delta is pure batching overhead.
    tails_rows4 = jnp.asarray(data.tail_rows)
    tails_cols4 = jnp.asarray(data.tail_cols)
    tails_vals4 = jnp.asarray(data.tail_vals, dt)
    flat_rows = jnp.asarray(
        (data.tail_rows + (np.arange(B)[:, None] * rows)).reshape(-1))
    flat_cols = jnp.asarray(
        (data.tail_cols + (np.arange(B)[:, None] * n)).reshape(-1))
    flat_vals = jnp.asarray(data.tail_vals.reshape(-1), dt)
    Wflat = jnp.asarray(rng.normal(size=(B * n, L)) * 0.1, dt)

    def tail_vmapped(x):
        def one(tr, tc, tv, w):
            return jax.ops.segment_sum(tv[:, None] * w[tc], tr,
                                       num_segments=rows,
                                       indices_are_sorted=True)
        return jax.vmap(one)(tails_rows4, tails_cols4, tails_vals4, x)

    def tail_flat(x):
        return jax.ops.segment_sum(flat_vals[:, None] * x[flat_cols],
                                   flat_rows, num_segments=B * rows,
                                   indices_are_sorted=True)

    def chain_solve(x):
        # every trip re-solves from ~zero (cold inner solve, the iteration-1
        # cost); the chained perturbation keeps the dependence real
        return W4_zero.at[0, 0, 0].add(jnp.sum(solve_j(x)) * TINY)

    # constant per-trip cost of the harness itself (carry copy + chain
    # arithmetic + amortized dispatch/fetch): subtracted from every number
    null = _time_loop(chainW(lambda w: jnp.zeros((), dt)), W)

    def t(step, x0):
        return max(_time_loop(step, x0) - null, 0.0)

    res = {
        "null_loop_ms": null * 1e3,
        "xv_ms": t(chainW(lambda w: tm.xv(prob, w)), W) * 1e3,
        "xv_head_ms": t(chainW(head_only), W) * 1e3,
        "xv_ell_ms": t(chainW(ell_only), W) * 1e3,
        "xv_tail_ms": t(chainW(tail_only), W) * 1e3,
        "xtv_ms": t(chainC(lambda c: tm.xtv(prob, c)), C) * 1e3,
        "diag_ms": t(
            chainC(lambda d: tm.hessian_diagonal(prob, d)), Dm) * 1e3,
        "fused_xtv_diag_ms": t(
            chainC(lambda c: sum(jnp.sum(o) for o in
                                 tm.xtv_and_sqdiag(prob, c, Dm))), C) * 1e3,
        "hv_ms": t(chainW(lambda s: tm.hv(prob, Dm, s)), W) * 1e3,
        "fun_grad_diag_ms": t(
            chainW(lambda w: sum(jnp.sum(o) for o in
                                 tm.fun_grad_curvature(
                                     prob, w, with_diag=True))), W) * 1e3,
        "tail_b4_vmapped_ms": t(chainW4(tail_vmapped), W4) * 1e3,
        "tail_flat_ms": t(chainW(tail_flat), Wflat) * 1e3,
        "hv_b4_ms": t(chainW4(lambda s: hv4(prob4, Dm4, s)), W4) * 1e3,
        "fgc_b4_ms": t(
            chainW4(lambda w: sum(jnp.sum(o) for o in fgc4(prob4, w))),
            W4) * 1e3,
        "solve_all_blocks_ms": max(
            _time_loop(chain_solve, W4_zero, n=20) - null, 0.0) * 1e3,
        "gather_spread_ms": t(chain_gather(spread_idx), spread_idx) * 1e3,
        "gather_compact_ms": t(chain_gather(compact_idx), compact_idx) * 1e3,
        "gather_zipf_ordered_ms": t(chain_gather(zipf_ordered),
                                    zipf_ordered) * 1e3,
        "gather_zipf_scattered_ms": t(chain_gather(zipf_scattered),
                                      zipf_scattered) * 1e3,
    }
    res = {k: round(v, 4) for k, v in res.items()}
    shapes = {"rows": rows, "n": n, "L": L, "K_ell": data.indices.shape[2],
              "head": head, "tail_nnz": T, "block": "1 of {}".format(B),
              "loop_trips": N_TRIPS,
              "solve_newton_trips": solve_trips[0],
              "solve_cg_trips": solve_trips[1],
              "device": str(jax.devices()[0])}
    print(json.dumps({"metric": "pass_microbench", "value": res["xv_ms"],
                      "unit": "ms per xv pass (single block)",
                      "vs_baseline": 0.0,
                      "detail": {"passes_ms": res, "shapes": shapes}}))


def measure_floors(out_path: str | None = None):
    """Measure the FLAT-blocks per-pass times exactly as the trainer's
    default layout runs them (stack_blocks over all B blocks, one program)
    and write tools/pass_floors.json — the probe-derived speed-of-light
    table bench.py's roofline checks utilization against.

    This replaces the retired single `row_ns` floor: round-3 probes showed
    the 9-12 ns/row gather-floor attributions were DISPATCH artifacts (raw
    gather is ~2.7 ns/row and locality-insensitive; the sorted segment-sum
    reduce dominates the tail pass), so the honest floor is the measured
    per-pass cost of each primitive at the bench shape, composed per the
    trip counts of the actual run:

        floor_iter = fun_grad_diag            (fused f/g/D at W0)
                   + newton_trips * (xv + fused_xtv_diag)
                   + cg_trips * hv
        (grad_norm_at_zero is loop-invariant — XLA hoists it, ROADMAP 4c)
    """
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
    dt = jnp.float32

    head_tuple = (jnp.asarray(data.head, dt), jnp.asarray(data.head_ids),
                  jnp.asarray(data.tail_rows), jnp.asarray(data.tail_cols),
                  jnp.asarray(data.tail_vals, dt),
                  jnp.asarray(data.tail_c_rows), jnp.asarray(data.tail_c_cols),
                  jnp.asarray(data.tail_c_vals, dt))
    prob = tm.stack_blocks(
        jnp.asarray(data.indices), jnp.asarray(data.values, dt),
        jnp.asarray(data.y, dt), jnp.asarray(data.weight, dt),
        jnp.asarray(data.offset, dt),
        head_tuple, jnp.zeros((L, B, n), dt), jnp.ones((L,), dt))

    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=(B * n, L)) * 0.1, dt)
    C = jnp.asarray(rng.normal(size=(B * rows, L)), dt)
    Dm = jnp.asarray(rng.random((B * rows, L)) * 0.25, dt)
    TINY = jnp.asarray(1e-30, dt)

    # problem + Dm ride as jit operands (closure-captured literals exceed
    # the tunnel's remote-compile body limit at production shapes)
    def chain(fn):
        return lambda x, ops: x.at[0, 0].add(jnp.sum(fn(x, ops)) * TINY)

    pd = (prob, Dm)
    null = _time_loop(lambda w: w.at[0, 0].add(TINY), W)

    def t(step, x0):
        return max(_time_loop(step, x0, operands=pd) - null, 0.0)

    floors_ms = {
        "xv": t(chain(lambda w, o: tm.xv(o[0], w)), W) * 1e3,
        "xtv": t(chain(lambda c, o: tm.xtv(o[0], c)), C) * 1e3,
        "fused_xtv_diag": t(
            chain(lambda c, o: sum(jnp.sum(x) for x in
                                   tm.xtv_and_sqdiag(o[0], c, o[1]))),
            C) * 1e3,
        "hv": t(chain(lambda s, o: tm.hv(o[0], o[1], s)), W) * 1e3,
        "fun_grad_diag": t(
            chain(lambda w, o: sum(jnp.sum(x) for x in
                                   tm.fun_grad_curvature(
                                       o[0], w, with_diag=True))), W) * 1e3,
    }
    floors_ms = {k: round(v, 4) for k, v in floors_ms.items()}
    out = {
        "chip": getattr(jax.devices()[0], "device_kind", str(jax.devices()[0])),
        "platform": jax.devices()[0].platform,
        "layout": "flat-blocks",
        "shape": {"features": n_features, "blocks": B, "rows": rows,
                  "nnz": nnz, "lambdas": L, "head": head,
                  "tail_nnz_per_block": int(data.tail_rows.shape[1]),
                  "ell_k": int(data.indices.shape[2])},
        "floors_ms": floors_ms,
        "null_loop_ms": round(null * 1e3, 4),
        "loop_trips": N_TRIPS,
    }
    if out_path is None:
        out_path = os.environ.get(
            "PASS_FLOORS_OUT",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "pass_floors.json"))
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": "pass_floors", "value": floors_ms["hv"],
                      "unit": f"ms per flat-{B}-block hv pass",
                      "vs_baseline": 0.0, "detail": out}))
    return out


if __name__ == "__main__":
    if "--floors" in sys.argv:
        measure_floors()
    else:
        main()
