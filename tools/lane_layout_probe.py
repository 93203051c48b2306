"""Probe: does the (T, L) lanes-MINOR layout of the sparse-tail passes pay a
TPU lane-padding tax?

Hypothesis (round 3): every tail op works on (T, L) arrays with L=3 minor —
TPU vector registers are (8, 128) tiles, so a minor dim of 3 is padded to
128 lanes and every gather/segment-sum moves ~42x the useful bytes. A flat
1-D (L*T,) layout with per-lane offset ids (lane l reads W_flat[l*n + col]
and reduces into segment l*R + row) keeps every op over large 1-D arrays —
no padding anywhere. Same for the head matmul: (R,H)@(H,L) writes an (R, 3)
result (padded 128 wide); (L,H)@(H,R) writes (3, R) (padded 8 high).

Measures, at the default bench shapes (one block and flat 4-block):
  xv_tail     — gather + row segment-sum, (T,L) vs flat (L*T)
  xtv_tail    — gather + column segment-sum, both layouts
  head matmul — (R,H)@(H,L) vs (L,H)@(H,R)
  hv          — the full CG pass (xv+xtv) in both layouts

    python tools/lane_layout_probe.py          # tunneled TPU
    JAX_PLATFORMS=cpu python tools/lane_layout_probe.py
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

    from bench import synth_blocked_data
    from mlease_tpu.core.dataset import to_hybrid

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

    # ---- flat 4-block arrays (the default trainer layout) --------------
    boffs_n = (np.arange(B, dtype=np.int32) * n)[:, None]
    boffs_r = (np.arange(B, dtype=np.int32) * rows)[:, None]
    t_rows = jnp.asarray((data.tail_rows + boffs_r).reshape(-1))
    t_cols = jnp.asarray((data.tail_cols + boffs_n).reshape(-1))
    t_vals = jnp.asarray(data.tail_vals.reshape(-1), dt)
    tc_rows = jnp.asarray((data.tail_c_rows + boffs_r).reshape(-1))
    tc_cols = jnp.asarray((data.tail_c_cols + boffs_n).reshape(-1))
    tc_vals = jnp.asarray(data.tail_c_vals.reshape(-1), dt)
    head_x = jnp.asarray(data.head[0], dt)          # (R, H) single block
    N, R, T = B * n, B * rows, t_rows.shape[0]
    H = head_x.shape[1]

    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=(N, L)) * 0.1, dt)      # lanes-minor
    Wf = jnp.asarray(np.ascontiguousarray(
        np.asarray(W).T.reshape(-1)), dt)                   # flat (L*N,)
    D = jnp.asarray(rng.random((R, L)), dt)
    Df = jnp.asarray(np.ascontiguousarray(np.asarray(D).T.reshape(-1)), dt)
    Wh = jnp.asarray(rng.normal(size=(H, L)), dt)
    WhT = jnp.asarray(np.asarray(Wh).T.copy(), dt)          # (L, H)
    TINY = jnp.asarray(1e-30, dt)

    # flat per-lane offset ids (iteration-invariant, built once)
    lane_n = (jnp.arange(L, dtype=jnp.int32) * N)[:, None]
    lane_r = (jnp.arange(L, dtype=jnp.int32) * R)[:, None]
    t_cols_f = (t_cols[None, :] + lane_n).reshape(-1)       # (L*T,)
    t_rows_f = jnp.broadcast_to(t_rows[None, :] + lane_r, (L, T)).reshape(-1)
    tc_rows_f = (tc_rows[None, :] + lane_r).reshape(-1)
    tc_cols_f = jnp.broadcast_to(tc_cols[None, :] + lane_n,
                                 (L, T)).reshape(-1)
    t_vals_f = jnp.tile(t_vals, L)
    tc_vals_f = jnp.tile(tc_vals, L)

    import jax.ops

    # ---- the current lanes-minor ops -----------------------------------
    def xv_tail_minor(V):
        contrib = t_vals[:, None] * V[t_cols]               # (T, L)
        return jax.ops.segment_sum(contrib, t_rows, num_segments=R,
                                   indices_are_sorted=True)

    def xtv_tail_minor(d):
        contrib = tc_vals[:, None] * d[tc_rows]
        return jax.ops.segment_sum(contrib, tc_cols, num_segments=N,
                                   indices_are_sorted=True)

    def hv_tail_minor(V):
        s = xv_tail_minor(V)
        return xtv_tail_minor(jnp.ones((R, L), dt) * s)

    # ---- flat 1-D lanes-major ops ---------------------------------------
    # lane-major sorted: within each lane block the ids are sorted, and lane
    # blocks are disjoint ascending ranges -> globally sorted
    def xv_tail_flat(vf):
        contrib = t_vals_f * vf[t_cols_f]                   # (L*T,)
        return jax.ops.segment_sum(contrib, t_rows_f, num_segments=L * R,
                                   indices_are_sorted=True)

    def xtv_tail_flat(df):
        contrib = tc_vals_f * df[tc_rows_f]
        return jax.ops.segment_sum(contrib, tc_cols_f, num_segments=L * N,
                                   indices_are_sorted=True)

    def hv_tail_flat(vf):
        return xtv_tail_flat(xv_tail_flat(vf))

    # ---- head matmul layouts --------------------------------------------
    def head_minor(w):
        return jnp.dot(head_x, w, preferred_element_type=dt,
                       precision=jax.lax.Precision.HIGHEST)   # (R, L)

    def head_major(w):
        return jnp.dot(w, head_x.T, preferred_element_type=dt,
                       precision=jax.lax.Precision.HIGHEST)   # (L, R)

    def chain(fn):
        return lambda x: x.at[(0,) * x.ndim].add(jnp.sum(fn(x)) * TINY)

    null2 = _time_loop(chain(lambda w: jnp.zeros((), dt)), W)
    null1 = _time_loop(chain(lambda w: jnp.zeros((), dt)), Wf)

    def t2(fn, x0, null):
        return (_time_loop(chain(fn), x0) - null) * 1e3

    out = {
        "shape": {"N": int(N), "R": int(R), "T": int(T), "L": L, "H": H},
        "xv_tail_minor_ms": t2(xv_tail_minor, W, null2),
        "xv_tail_flat_ms": t2(xv_tail_flat, Wf, null1),
        "xtv_tail_minor_ms": t2(xtv_tail_minor, D, null2),
        "xtv_tail_flat_ms": t2(xtv_tail_flat, Df, null1),
        "hv_tail_minor_ms": t2(hv_tail_minor, W, null2),
        "hv_tail_flat_ms": t2(hv_tail_flat, Wf, null1),
        "head_minor_ms": t2(head_minor, Wh, null2),
        "head_major_ms": t2(head_major, WhT, null2),
        "platform": jax.devices()[0].platform,
    }
    # numerical agreement (same summation order per lane)
    a = np.asarray(xv_tail_minor(W))
    b = np.asarray(xv_tail_flat(Wf)).reshape(L, R).T
    out["xv_agree"] = bool(np.allclose(a, b, atol=1e-5))
    a = np.asarray(xtv_tail_minor(D))
    b = np.asarray(xtv_tail_flat(Df)).reshape(L, N).T
    out["xtv_agree"] = bool(np.allclose(a, b, atol=1e-5))
    print(json.dumps(out))




def vmap_variant():
    """Second experiment set: (L, T) lanes-MAJOR tails via vmap-over-L
    (a different lowering than the flat offset-id variant, which measured
    5x slower on TPU), plus the in-scan carry cost of (N, L) vs (L, N)
    state when the live set exceeds VMEM."""
    plat = os.environ.get("JAX_PLATFORMS")
    import jax
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    import jax.numpy as jnp
    import time

    from bench import synth_blocked_data
    from mlease_tpu.core.dataset import to_hybrid

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
    boffs_n = (np.arange(B, dtype=np.int32) * n)[:, None]
    boffs_r = (np.arange(B, dtype=np.int32) * rows)[:, None]
    t_rows = jnp.asarray((data.tail_rows + boffs_r).reshape(-1))
    t_cols = jnp.asarray((data.tail_cols + boffs_n).reshape(-1))
    t_vals = jnp.asarray(data.tail_vals.reshape(-1), dt)
    N, R, T = B * n, B * rows, t_rows.shape[0]

    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=(N, L)) * 0.1, dt)
    Wt = jnp.asarray(np.asarray(W).T.copy(), dt)
    TINY = jnp.asarray(1e-30, dt)

    def chain(fn):
        return lambda x: x.at[(0,) * x.ndim].add(jnp.sum(fn(x)) * TINY)

    def xv_tail_minor(V):
        contrib = t_vals[:, None] * V[t_cols]
        return jax.ops.segment_sum(contrib, t_rows, num_segments=R,
                                   indices_are_sorted=True)

    def xv_tail_vmapL(Vt):                      # Vt (L, N) -> (L, R)
        def one(v):
            return jax.ops.segment_sum(t_vals * v[t_cols], t_rows,
                                       num_segments=R,
                                       indices_are_sorted=True)
        return jax.vmap(one)(Vt)

    tc_rows = jnp.asarray((data.tail_c_rows + boffs_r).reshape(-1))
    tc_cols = jnp.asarray((data.tail_c_cols + boffs_n).reshape(-1))
    tc_vals = jnp.asarray(data.tail_c_vals.reshape(-1), dt)
    D = jnp.asarray(rng.random((R, L)), dt)
    Dt = jnp.asarray(np.asarray(D).T.copy(), dt)

    def xtv_tail_minor(d):
        contrib = tc_vals[:, None] * d[tc_rows]
        return jax.ops.segment_sum(contrib, tc_cols, num_segments=N,
                                   indices_are_sorted=True)

    def xtv_tail_vmapL(dt_):                    # (L, R) -> (L, N)
        def one(d1):
            return jax.ops.segment_sum(tc_vals * d1[tc_rows], tc_cols,
                                       num_segments=N,
                                       indices_are_sorted=True)
        return jax.vmap(one)(dt_)

    null2 = _time_loop(chain(lambda w: jnp.zeros((), dt)), W)
    out = {
        "xv_tail_minor_ms": (_time_loop(chain(xv_tail_minor), W)
                             - null2) * 1e3,
        "xv_tail_vmapL_ms": (_time_loop(chain(xv_tail_vmapL), Wt)
                             - null2) * 1e3,
        "xtv_tail_minor_ms": (_time_loop(chain(xtv_tail_minor), D)
                              - null2) * 1e3,
        "xtv_tail_vmapL_ms": (_time_loop(chain(xtv_tail_vmapL), Dt)
                              - null2) * 1e3,
    }
    out["agree_xtv_vmapL"] = bool(np.allclose(
        np.asarray(xtv_tail_minor(D)), np.asarray(xtv_tail_vmapL(Dt)).T,
        atol=1e-5))

    # in-scan carry cost: 6 trips x 4 carried state arrays, only axpys
    def carry_cost(x0s, axis):
        @jax.jit
        def run(a, b, c, d):
            def body(carry, _):
                a, b, c, d = carry
                a = a + 0.5 * b
                b = b - 0.25 * c
                c = c + 0.125 * d
                d = d * 0.99 + a * 0.01
                return (a, b, c, d), jnp.sum(a, axis=axis)[:1]
            (a, b, c, d), s = jax.lax.scan(body, (a, b, c, d), None,
                                           length=6)
            return s
        fetchable = run(*x0s)
        np.asarray(fetchable)
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            np.asarray(run(*x0s))
            best = min(best, time.monotonic() - t0)
        return best / 6 * 1e3

    mk = lambda: jnp.asarray(rng.normal(size=(N, L)), dt)      # noqa: E731
    mkT = lambda: jnp.asarray(rng.normal(size=(L, N)), dt)     # noqa: E731
    out["scan_carry_minor_ms_per_trip"] = carry_cost(
        (mk(), mk(), mk(), mk()), 0)
    out["scan_carry_major_ms_per_trip"] = carry_cost(
        (mkT(), mkT(), mkT(), mkT()), 1)
    out["agree_vmapL"] = bool(np.allclose(
        np.asarray(xv_tail_minor(W)), np.asarray(xv_tail_vmapL(Wt)).T,
        atol=1e-5))
    print(json.dumps(out))


if __name__ == "__main__" and os.environ.get("PROBE_VMAP"):
    vmap_variant()
    raise SystemExit(0)

if __name__ == "__main__":
    main()
