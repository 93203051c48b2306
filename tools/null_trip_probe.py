"""Null-body solver-loop probe (VERDICT r4 item 7).

The default bench shape reads pass-floor util 0.555 with a localized
~2.5 ms/solver-trip fixed residual (solve_all_blocks 105.5 ms vs ~76 ms of
composed passes at 3 newton / 9 cg trips). The r4 attribution — per-trip
control/elementwise overhead inside the jitted while_loops that does not
scale with data — was plausible but indirect. This probe pins it: a nested
while_loop with the solver's EXACT trip structure and state shapes (outer
newton loop, inner CG loop whose body performs the same (L,)-scalar trust
region algebra and (L, B*n) elementwise state updates as
ops/tron_multi.py:_cg body) with the one data pass (Hv) replaced by a
free same-shape stand-in. What remains is the per-trip overhead floor.

    residual_per_trip ~= null_total / (nt*(1 + cg_per_nt))

If it matches ~2.5 ms/trip, the default-shape util is floor+overhead (and
the overhead provably vanishes at scale since it is shape-independent); if
not, the gap is real solver headroom.

Run on-chip: JAX_PLATFORMS=tpu python tools/null_trip_probe.py
(env: PROBE_FEATURES/PROBE_BLOCKS/PROBE_LAMBDAS/PROBE_NT/PROBE_CG)
"""
import json
import os
import sys
import time

import numpy as np

import jax

_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    jax.config.update("jax_platforms", _plat)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"))
import jax.numpy as jnp  # noqa: E402


def build_null_solver(N: int, L: int, nt: int, cg: int):
    """Nested while_loops with tron_multi's trip structure, null data pass.

    Inner body mirrors ops/tron_multi.py:_cg's non-pass ops one for one:
    1 stand-in Hv, 5 (L,)-reductions (dots), ~10 (L,) scalar where-chains,
    4 (L, N) state updates through 2-way where masks. Outer body mirrors a
    newton trip's bookkeeping: W/pred updates + trust-region scalars."""

    def dot(a, b):
        return jnp.sum(a * b, axis=1)

    def cg_loop(G, delta):
        z0 = -G
        cgtol = 0.1 * jnp.sqrt(dot(-G, z0))

        def cond(state):
            *_, it = state
            return it < cg

        def body(state):
            s, r, z, d, rz, it = state
            small = jnp.sqrt(jnp.maximum(dot(r, z), 0.0)) <= cgtol
            Hd = d * 1.0000001          # the pass, made free
            dHd = dot(d, Hd)
            alpha = jnp.where(dHd > 0, rz / jnp.where(dHd > 0, dHd, 1.0),
                              0.0)
            s_try = s + alpha[:, None] * d
            boundary = jnp.sqrt(dot(s_try, s_try)) > delta
            std, sts, dtd = dot(s, d), dot(s, s), dot(d, d)
            dsq = delta * delta
            rad = jnp.sqrt(jnp.maximum(std * std + dtd * (dsq - sts), 0.0))
            denom = std + rad
            alpha_b = jnp.where(
                std >= 0,
                jnp.where(denom != 0, (dsq - sts)
                          / jnp.where(denom != 0, denom, 1.0), 0.0),
                jnp.where(dtd != 0, (rad - std)
                          / jnp.where(dtd != 0, dtd, 1.0), 0.0))
            s_bnd = s + alpha_b[:, None] * d
            r_bnd = r - alpha_b[:, None] * Hd
            r_int = r - alpha[:, None] * Hd
            rz_new = dot(r_int, r_int)
            beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0),
                             0.0)
            d_int = r_int + beta[:, None] * d
            take_bnd = jnp.logical_and(~small, boundary)[:, None]
            take_int = jnp.logical_and(~small, ~boundary)[:, None]
            s_out = jnp.where(take_bnd, s_bnd,
                              jnp.where(take_int, s_try, s))
            r_out = jnp.where(take_bnd, r_bnd,
                              jnp.where(take_int, r_int, r))
            z_out = jnp.where(take_int, r_int, z)
            d_out = jnp.where(take_int, d_int, d)
            rz_out = jnp.where(take_int[:, 0], rz_new, rz)
            return (s_out, r_out, z_out, d_out, rz_out, it + 1)

        init = (jnp.zeros_like(G), -G, z0, z0, dot(-G, z0),
                jnp.asarray(0, jnp.int32))
        s, r, *_ = jax.lax.while_loop(cond, body, init)
        return s, r

    @jax.jit
    def run(W0, G0):
        def cond(state):
            *_, it = state
            return it < nt

        def body(state):
            W, G, delta, it = state
            s, r = cg_loop(G, delta)
            # newton-trip bookkeeping: prediction/actual reduction scalars,
            # accept/reject, trust-region update, W/G state updates
            gs = dot(G, s)
            prered = -0.5 * (gs - dot(s, r))
            actred = prered * 0.999
            ratio = actred / jnp.where(prered != 0, prered, 1.0)
            accept = ratio > 0.25
            delta = jnp.where(ratio < 0.25, delta * 0.5,
                              jnp.where(ratio > 0.75, delta * 2.0, delta))
            W = jnp.where(accept[:, None], W + s, W)
            G = jnp.where(accept[:, None], G * 0.9 + s * 1e-3, G)
            return (W, G, delta, it + 1)

        delta0 = jnp.sqrt(dot(G0, G0))
        W, G, *_ = jax.lax.while_loop(cond, body, (W0, G0, delta0,
                                                   jnp.asarray(0,
                                                               jnp.int32)))
        return jnp.sum(W) + jnp.sum(G)

    return run


def main():
    n = int(os.environ.get("PROBE_FEATURES", 50_000))
    B = int(os.environ.get("PROBE_BLOCKS", 4))
    L = int(os.environ.get("PROBE_LAMBDAS", 3))
    nt = int(os.environ.get("PROBE_NT", 3))
    cg = int(os.environ.get("PROBE_CG", 9))
    reps = int(os.environ.get("PROBE_REPS", 20))
    N = B * n

    rng = np.random.default_rng(0)
    W0 = jnp.asarray(rng.normal(size=(L, N)) * 0.01, jnp.float32)
    G0 = jnp.asarray(rng.normal(size=(L, N)) * 0.1, jnp.float32)
    run = build_null_solver(N, L, nt, cg)
    float(run(W0, G0))                       # compile + execute
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        for _ in range(reps):
            out = run(W0, G0)
        float(out)   # device->host fetch: the only reliable sync barrier
        #              on the tunneled backend (block_until_ready can
        #              return early there)
        best = min(best, (time.monotonic() - t0) / reps)
    trips = nt * (1 + cg)
    per_trip_ms = best * 1e3 / trips
    print(json.dumps({
        "metric": "null_trip_overhead_ms",
        "value": round(per_trip_ms, 4),
        "unit": (f"ms per solver trip, null passes ({nt} newton x {cg} cg, "
                 f"(L={L}, N={N}) state, "
                 f"{jax.devices()[0].platform})"),
        "vs_baseline": 0.0,
        "detail": {"total_ms": round(best * 1e3, 3), "trips": trips,
                   "device": str(jax.devices()[0])},
    }), flush=True)


if __name__ == "__main__":
    main()
