"""End-to-end layout discriminator: a miniature preconditioned-CG loop with
the REAL sparse Hv (head matmul + both tail passes) and the real amount of
carried state, in (N, L) lanes-minor vs (L, N) lanes-major form.

tools/vector_layout_probe.py showed a single (N,3) axpy pays ~0.59 ms
(lane-padded HBM traffic) while the fused fori_loop body measured ~0 (the
carry can stay VMEM-resident at probe size). The real solver carries far
more state than VMEM holds (W, G, Dm, M + CG s/r/z/d), so only an
end-to-end loop with that much live state discriminates the layouts. The
Hv here uses the production gather/segment-sum code paths; only the state
algebra layout differs — lanes-major wraps the same sparse passes in
boundary transposes.

    python tools/minicg_layout_probe.py            # tunneled TPU
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    from mlease_tpu.ops.tron_multi import MultiProblem, stack_blocks

    n_features = int(os.environ.get("BENCH_FEATURES", 50_000))
    rows = int(os.environ.get("BENCH_ROWS", 16_384))
    nnz = int(os.environ.get("BENCH_NNZ", 15))
    L = int(os.environ.get("BENCH_LAMBDAS", 3))
    head = int(os.environ.get("BENCH_HEAD", 512))
    B = int(os.environ.get("BENCH_BLOCKS", 4))
    CG = int(os.environ.get("PROBE_CG", 6))
    OUTER = int(os.environ.get("PROBE_OUTER", 20))

    data, _ = synth_blocked_data(n_features, B, rows, nnz)
    data = to_hybrid(data, head)
    n = data.dim
    dt = jnp.float32

    heads = (jnp.asarray(data.head, dt), jnp.asarray(data.head_ids),
             jnp.asarray(data.tail_rows), jnp.asarray(data.tail_cols),
             jnp.asarray(data.tail_vals, dt), jnp.asarray(data.tail_c_rows),
             jnp.asarray(data.tail_c_cols), jnp.asarray(data.tail_c_vals, dt))
    prob = stack_blocks(
        jnp.asarray(data.indices), jnp.asarray(data.values, dt),
        jnp.asarray(data.y, dt), jnp.asarray(data.weight, dt),
        jnp.asarray(data.offset, dt), heads,
        jnp.zeros((L, B, n), dt), jnp.ones((L,), dt))
    N = prob.dim
    R = prob.y.shape[0]

    rng = np.random.default_rng(0)
    G0 = jnp.asarray(rng.normal(size=(N, L)) * 0.1, dt)
    Dm0 = jnp.asarray(rng.random((R, L)) * 0.25, dt)
    M0 = jnp.asarray(rng.random((N, L)) + 0.5, dt)

    # ---- lanes-minor (production layout) --------------------------------
    @jax.jit
    def run_minor(G, Dm, M):
        def cg(carry, _):
            s, r, z, d, rz = carry
            Hd = tm.hv(prob, Dm, d)
            dHd = jnp.sum(d * Hd, axis=0)
            alpha = rz / jnp.where(dHd != 0, dHd, 1.0)
            s = s + alpha * d
            r = r - alpha * Hd
            z = r / M
            rz_new = jnp.sum(r * z, axis=0)
            beta = rz_new / jnp.where(rz != 0, rz, 1.0)
            d = z + beta * d
            return (s, r, z, d, rz_new), None

        def outer(carry, _):
            G, Dm, M = carry
            z0 = -G / M
            init = (jnp.zeros_like(G), -G, z0, z0, jnp.sum(G * z0, axis=0))
            (s, r, _z, _d, _rz), _ = jax.lax.scan(cg, init, None, length=CG)
            # newton-ish state refresh at W+s: one fused f/g/D+diag pass
            F, G2, Dm2, Hd2 = tm.fun_grad_curvature(prob, s, with_diag=True)
            return (G2, Dm2, jnp.maximum(Hd2, 1e-12)), F

        (G, Dm, M), Fs = jax.lax.scan(outer, (G, Dm, M), None, length=OUTER)
        return G, Fs

    # ---- lanes-major state, boundary transposes at the data passes ------
    @jax.jit
    def run_major(Gt, Dmt, Mt):
        def cg(carry, _):
            s, r, z, d, rz = carry                    # all (L, N)
            Hd = tm.hv(prob, Dmt.T, d.T).T
            dHd = jnp.sum(d * Hd, axis=1)
            alpha = rz / jnp.where(dHd != 0, dHd, 1.0)
            s = s + alpha[:, None] * d
            r = r - alpha[:, None] * Hd
            z = r / Mt
            rz_new = jnp.sum(r * z, axis=1)
            beta = rz_new / jnp.where(rz != 0, rz, 1.0)
            d = z + beta[:, None] * d
            return (s, r, z, d, rz_new), None

        def outer(carry, _):
            Gt, Dmt, Mt = carry
            z0 = -Gt / Mt
            init = (jnp.zeros_like(Gt), -Gt, z0, z0, jnp.sum(Gt * z0, axis=1))
            (s, r, _z, _d, _rz), _ = jax.lax.scan(cg, init, None, length=CG)
            F, G2, Dm2, Hd2 = tm.fun_grad_curvature(prob, s.T, with_diag=True)
            return (G2.T, Dm2.T, jnp.maximum(Hd2, 1e-12).T), F

        (Gt, Dmt, Mt), Fs = jax.lax.scan(outer, (Gt, Dmt, Mt), None,
                                         length=OUTER)
        return Gt, Fs

    def fetch(x):
        for leaf in jax.tree_util.tree_leaves(x):
            np.asarray(jax.device_get(leaf))

    def bench(f, *args):
        out = f(*args)
        fetch(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            fetch(f(*args))
            best = min(best, time.monotonic() - t0)
        return best / OUTER

    t_minor = bench(run_minor, G0, Dm0, M0)
    t_major = bench(run_major, G0.T, Dm0.T, M0.T)
    # agreement checked at ONE outer trip: the probe's dynamics are not
    # contractive (random G0, no trust region), so reduction-order noise
    # amplifies chaotically over more trips — expected, and irrelevant to
    # what is being measured here (layout cost)
    fa = np.asarray(run_minor(G0, Dm0, M0)[1])[:1]
    fb = np.asarray(run_major(G0.T, Dm0.T, M0.T)[1])[:1]
    agree = bool(np.allclose(fa, fb, rtol=1e-4))
    print(json.dumps({
        "shape": {"N": int(N), "R": int(R), "L": L, "cg": CG},
        "outer_minor_ms": round(t_minor * 1e3, 3),
        "outer_major_ms": round(t_major * 1e3, 3),
        "speedup": round(t_minor / t_major, 2),
        "agree": agree,
        "platform": jax.devices()[0].platform}))


if __name__ == "__main__":
    main()
