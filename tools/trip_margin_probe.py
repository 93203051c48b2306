"""Marginal per-trip cost of the REAL solver at the default bench shape.

The null-trip probe (tools/null_trip_probe.py) showed the solver's loop
structure costs only ~0.06 ms/trip on-chip, so the default-shape residual
(solve time minus composed pass floors, ~1 ms/trip) is NOT control
overhead — it is the passes running slower in situ than in isolation, or
work the 2.5-passes/newton model does not count. This probe separates the
terms empirically: run tron_multi (the trainer's exact flat-blocks entry)
at forced trip counts, then least-squares fit

    time_ms  ~=  a  +  b * newton_trips  +  c * cg_trips

b is the marginal in-situ cost of one newton trip (model: xv +
fused_xtv_diag floors), c of one cg trip (model: hv floor), a the fixed
setup (model: fun_grad_diag + dispatch). Comparing (a, b, c) with
tools/pass_floors.json pins WHERE the residual lives.

Run on-chip: python tools/trip_margin_probe.py  (env: PROBE_REPS)
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import synth_blocked_data  # noqa: E402
from mlease_tpu.core.dataset import to_hybrid  # noqa: E402
from mlease_tpu.ops import tron_multi as tm  # noqa: E402


def main():
    n_features = int(os.environ.get("BENCH_FEATURES", 50_000))
    rows = int(os.environ.get("BENCH_ROWS", 16_384))
    nnz = int(os.environ.get("BENCH_NNZ", 15))
    L = int(os.environ.get("BENCH_LAMBDAS", 3))
    head = int(os.environ.get("BENCH_HEAD", 512))
    B = int(os.environ.get("BENCH_BLOCKS", 4))
    reps = int(os.environ.get("PROBE_REPS", 10))

    data, _ = synth_blocked_data(n_features, B, rows, nnz)
    data = to_hybrid(data, head)
    n = data.dim
    dt = jnp.float32
    head_tuple = (jnp.asarray(data.head, dt), jnp.asarray(data.head_ids),
                  jnp.asarray(data.tail_rows), jnp.asarray(data.tail_cols),
                  jnp.asarray(data.tail_vals, dt),
                  jnp.asarray(data.tail_c_rows),
                  jnp.asarray(data.tail_c_cols),
                  jnp.asarray(data.tail_c_vals, dt))
    prob = tm.stack_blocks(
        jnp.asarray(data.indices), jnp.asarray(data.values, dt),
        jnp.asarray(data.y, dt), jnp.asarray(data.weight, dt),
        jnp.asarray(data.offset, dt),
        head_tuple, jnp.zeros((L, B, n), dt), jnp.ones((L,), dt))
    W0 = jnp.zeros((B * n, L), dt)
    eps = jnp.asarray(1e-12, dt)   # never stop early: trips run to caps

    # decoupled design: cg trips vary at fixed nt (first row block) and nt
    # varies at small cg caps (second), so [1, nt, cg] stays well-
    # conditioned even when CG terminates before its cap (its stop rule is
    # relative — a tiny eps does not force the cap)
    configs = [(1, 1), (1, 2), (1, 4), (1, 16),
               (2, 1), (3, 1), (2, 16), (3, 16), (4, 2)]
    obs = []
    warmed = False
    for mi, mc in configs:
        def run():
            return tm.tron_multi(prob, W0, eps, max_iter=mi,
                                 max_cg_iter=mc, precondition=True)
        r = run()
        nt = int(r.newton_trips)
        cg = int(r.cg_trips)
        float(jnp.sum(r.w))            # fetch barrier (tunnel-safe sync)
        if not warmed:                 # absorb one-time aux-program costs
            for _ in range(reps):
                r = run()
            float(jnp.sum(r.w))
            warmed = True
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            for _ in range(reps):
                r = run()
            float(jnp.sum(r.w))
            best = min(best, (time.monotonic() - t0) / reps)
        obs.append((nt, cg, best * 1e3))
        print(f"# max_iter={mi} max_cg={mc}: nt={nt} cg={cg} "
              f"t={best * 1e3:.2f} ms", flush=True)

    A = np.array([[1.0, nt, cg] for nt, cg, _ in obs])
    y = np.array([t for *_, t in obs])
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    a, b, c = (float(v) for v in coef)
    resid = float(np.max(np.abs(A @ coef - y)))

    floors = {}
    fp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "pass_floors.json")
    try:
        with open(fp) as f:
            tab = json.load(f)
        if tab.get("platform") == jax.devices()[0].platform:
            fl = tab["floors_ms"]
            floors = {"newton_model_ms": round(fl["xv"]
                                               + fl["fused_xtv_diag"], 3),
                      "cg_model_ms": round(fl["hv"], 3),
                      "setup_model_ms": round(fl["fun_grad_diag"], 3)}
    except (OSError, ValueError, KeyError):
        pass

    print(json.dumps({
        "metric": "trip_margin_ms",
        "value": round(c, 3),
        "unit": (f"ms marginal per cg trip in situ "
                 f"({jax.devices()[0].platform}; model floor "
                 f"{floors.get('cg_model_ms')})"),
        "vs_baseline": 0.0,
        "detail": {"fixed_ms": round(a, 3),
                   "per_newton_ms": round(b, 3),
                   "per_cg_ms": round(c, 3),
                   "fit_max_resid_ms": round(resid, 3),
                   "observations": [
                       {"nt": nt, "cg": cg, "ms": round(t, 2)}
                       for nt, cg, t in obs],
                   "pass_floor_model": floors,
                   "device": str(jax.devices()[0])},
    }), flush=True)


if __name__ == "__main__":
    main()
