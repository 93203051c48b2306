"""Probe: cost of the TRON/CG vector algebra in (N, L) lanes-minor layout
vs (L, N) lanes-major, and the cost of one full CG body minus the Hv.

The sparse-tail probe (tools/lane_layout_probe.py) measured the DATA passes
preferring lanes-minor (T, L) on TPU. This probe measures the other side:
the solver STATE algebra — axpys, per-lane dots, masked selects over
(N, L) f32 with L=3 — where a lane-minor layout tiles (8, 128) vector
registers at 3/128 occupancy. If (L, N) is much cheaper, the CG loop should
carry state lanes-major and transpose at the data-pass boundary (or not —
the transpose itself is measured here too).

    python tools/vector_layout_probe.py           # tunneled TPU
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

    N = int(os.environ.get("PROBE_N", 200_004))
    L = int(os.environ.get("PROBE_L", 3))
    dt = jnp.float32
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(N, L)), dt)
    B = jnp.asarray(rng.normal(size=(N, L)), dt)
    At = jnp.asarray(np.asarray(A).T.copy(), dt)
    Bt = jnp.asarray(np.asarray(B).T.copy(), dt)
    TINY = jnp.asarray(1e-30, dt)

    def chain(fn):
        return lambda x: x.at[(0,) * x.ndim].add(jnp.sum(fn(x)) * TINY)

    def axpy_minor(x):
        return x + 0.5 * B

    def axpy_major(x):
        return x + 0.5 * Bt

    def dot_minor(x):
        return jnp.sum(x * B, axis=0)          # (L,)

    def dot_major(x):
        return jnp.sum(x * Bt, axis=1)         # (L,)

    def where_minor(x):
        m = dot_minor(x) > 0
        return jnp.where(m[None, :], x, B)

    def where_major(x):
        m = dot_major(x) > 0
        return jnp.where(m[:, None], x, Bt)

    def transpose_cost(x):
        return x.T + 0.0                       # materialized transpose

    # a CG body's worth of state algebra with the Hv replaced by a copy:
    # ~6 dots + ~8 axpys/selects (see ops/tron_multi._trcg body)
    def cg_body_minor(s):
        r, z, d = s + B, s * 0.5, s - B
        Hd = d                                  # stand-in for hv()
        dHd = jnp.sum(d * Hd, axis=0)
        alpha = jnp.where(dHd > 0, 1.0 / jnp.where(dHd > 0, dHd, 1.0), 0.0)
        s_try = s + alpha * d
        boundary = jnp.sqrt(jnp.sum(s_try * s_try, axis=0)) > 1.0
        r_int = r - alpha * Hd
        rz = jnp.sum(r_int * z, axis=0)
        beta = jnp.where(rz > 0, rz, 0.0)
        d_int = z + beta * d
        out = jnp.where(boundary[None, :], s_try, s + 0.1 * d_int)
        return out

    def cg_body_major(s):
        r, z, d = s + Bt, s * 0.5, s - Bt
        Hd = d
        dHd = jnp.sum(d * Hd, axis=1)
        alpha = jnp.where(dHd > 0, 1.0 / jnp.where(dHd > 0, dHd, 1.0), 0.0)
        s_try = s + alpha[:, None] * d
        boundary = jnp.sqrt(jnp.sum(s_try * s_try, axis=1)) > 1.0
        r_int = r - alpha[:, None] * Hd
        rz = jnp.sum(r_int * z, axis=1)
        beta = jnp.where(rz > 0, rz, 0.0)
        d_int = z + beta[:, None] * d
        out = jnp.where(boundary[:, None], s_try, s + 0.1 * d_int)
        return out

    null2 = _time_loop(chain(lambda x: jnp.zeros((), dt)), A)

    def t(fn, x0):
        return (_time_loop(chain(fn), x0) - null2) * 1e3

    out = {
        "shape": {"N": N, "L": L},
        "axpy_minor_ms": t(axpy_minor, A),
        "axpy_major_ms": t(axpy_major, At),
        "dot_minor_ms": t(lambda x: x + dot_minor(x)[None, :] * TINY, A),
        "dot_major_ms": t(lambda x: x + dot_major(x)[:, None] * TINY, At),
        "where_minor_ms": t(where_minor, A),
        "where_major_ms": t(where_major, At),
        "transpose_NL_to_LN_ms": t(transpose_cost, A),
        "cg_body_minor_ms": t(cg_body_minor, A),
        "cg_body_major_ms": t(cg_body_major, At),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
