"""On-chip probe: split the steady ADMM iteration time into device compute
vs host<->device dispatch/fetch overhead (the tunneled chip adds ~tens of ms
RTT per fetch, which bench.py's per-iteration stats fetch pays every step).

Runs the bench-default shapes three ways:
  A. per-iteration fetch (what bench.py's steady loop measured historically)
  B. chained dispatch, one fetch at the end (production regime of run())
  C. fused on-device while_loop, fixed trip count (pure device time)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat and "axon" not in plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from bench import synth_blocked_data, _make_vocab
    from mlease_tpu.train.admm import AdmmConfig, AdmmTrainer

    n_features = int(os.environ.get("BENCH_FEATURES", 50_000))
    nblocks = int(os.environ.get("BENCH_BLOCKS", 4))
    rows = int(os.environ.get("BENCH_ROWS", 16_384))
    nnz = int(os.environ.get("BENCH_NNZ", 15))
    iters = int(os.environ.get("PROBE_ITERS", 8))

    data, _ = synth_blocked_data(n_features, nblocks, rows, nnz)
    vocab = _make_vocab(n_features)
    cfg = AdmmConfig(lambdas=[1.0, 10.0, 100.0], num_iters=iters,
                     regularizer=2, head_size=512, pcg=True,
                     dtype=jnp.float32)
    trainer = AdmmTrainer(data, vocab, cfg)

    L, n = 3, data.dim
    lam_vec = trainer.lam_vec
    rho = jnp.ones(L, jnp.float32)
    eps = 0.01 * trainer.eps_scale

    def step(z, u):
        return trainer.step(trainer.indices, trainer.values, trainer.y,
                            trainer.weight, trainer.offset, trainer.csc,
                            trainer.head, trainer.present,
                            trainer.block_valid, z, u, lam_vec, rho, rho, eps)

    z = jnp.zeros((L, n), jnp.float32)
    u = jnp.zeros((L, nblocks, n), jnp.float32)
    t0 = time.monotonic()
    z, u, d, stats = step(z, u)
    np.asarray(d)
    print(f"compile+first: {time.monotonic()-t0:.2f}s")

    # warm into steady regime; snapshot state to host (step donates u, so
    # every experiment needs a fresh device copy)
    for _ in range(2):
        z, u, d, stats = step(z, u)
    z_h = np.asarray(z)
    u_h = np.asarray(u)

    def fresh():
        return jnp.asarray(z_h), jnp.asarray(u_h)

    # A: fetch per iteration (d + stats, as bench.py did)
    zA, uA = fresh()
    t0 = time.monotonic()
    for _ in range(iters):
        zA, uA, d, stats = step(zA, uA)
        np.asarray(d)
        int(np.asarray(stats["newton_trips"]).max())
        int(np.asarray(stats["cg_trips"]).max())
    a = (time.monotonic() - t0) / iters
    print(f"A per-iter fetch      : {a*1e3:8.1f} ms/iter")

    # B: chained dispatch, single fetch — try increasing chain depths (the
    # tunnel may cap async queue depth)
    for depth in (2, 4, 8):
        try:
            zB, uB = fresh()
            t0 = time.monotonic()
            for _ in range(depth):
                zB, uB, d, stats = step(zB, uB)
            np.asarray(d)
            b = (time.monotonic() - t0) / depth
            print(f"B chain depth {depth:2d}      : {b*1e3:8.1f} ms/iter")
        except Exception as e:  # noqa: BLE001
            print(f"B chain depth {depth:2d}      : FAILED {type(e).__name__}"
                  f" {str(e)[:100]}")

    # C: on-device lax loop of the same step at fixed trip count
    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def loop(z, u):
        def body(_, zu):
            z, u = zu
            z, u, _, _ = trainer._step_raw(
                trainer.indices, trainer.values, trainer.y, trainer.weight,
                trainer.offset, trainer.csc, trainer.head, trainer.present,
                trainer.block_valid, z, u, lam_vec, rho, rho, eps) \
                if hasattr(trainer, "_step_raw") else (None,)*4
            return z, u
        return jax.lax.fori_loop(0, iters, body, (z, u))

    # build the raw step for the fused loop
    from mlease_tpu.train.admm import build_admm_step
    trainer._step_raw = build_admm_step(
        nblocks=trainer.nblocks, regularizer=2,
        intercept_index=vocab.intercept_index,
        penalize_intercept=cfg.penalize_intercept,
        reference_l1_compat=cfg.reference_l1_compat,
        max_newton_iter=cfg.max_newton_iter, max_cg_iter=cfg.max_cg_iter,
        relaxation=cfg.relaxation, dual_layout=False, use_head=True,
        multi_rhs=True, pcg=cfg.pcg, jit=False)

    zC, uC = fresh()
    t0 = time.monotonic()
    zC, uC = loop(zC, uC)
    np.asarray(zC[0, :4])
    c_cold = time.monotonic() - t0
    print(f"C fused compile+run   : {c_cold:8.2f} s total")
    zC, uC = fresh()
    t0 = time.monotonic()
    zC, uC = loop(zC, uC)
    np.asarray(zC[0, :4])
    c = (time.monotonic() - t0) / iters
    print(f"C fused device loop   : {c*1e3:8.1f} ms/iter")


if __name__ == "__main__":
    main()
