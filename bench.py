"""Benchmark: consensus-ADMM sparse logistic regression on TPU.

Measures steady-state ADMM iterations/second of the full jitted training step
(batched TRON x-update over (lambda x block), consensus psum means, z/u
updates) on a synthetic sparse CTR-style workload, and prints ONE JSON line.

Baseline context: the reference (linkedin/ml-ease) runs ONE Hadoop MapReduce
job per ADMM iteration (RegressionAdmmTrain.java:281-497 — job submission,
mapper fan-out x nlambdas, shuffle, per-reducer liblinear solve, driver-side
HDFS meanModel streaming). It publishes no timing numbers (BASELINE.md); a
conservative floor for a Hadoop-1.x iteration round on a real cluster is ~30 s
of scheduling+shuffle+IO alone, so vs_baseline = iterations_per_s * 30.0
(i.e. how many times faster than one 30-second MapReduce round per iteration).

Scale knobs via env: BENCH_FEATURES, BENCH_BLOCKS, BENCH_ROWS (per block),
BENCH_NNZ, BENCH_LAMBDAS, BENCH_ITERS.
"""

import json
import os
import sys
import time

import numpy as np


def synth_blocked_data(n_features: int, nblocks: int, rows_per_block: int,
                       nnz: int, seed: int = 0):
    """Directly materialize a BlockedData without per-row Python overhead.

    Power-law-ish column popularity mimics CTR data: a few hot features, a
    long tail. The intercept column (last index) is appended to every row.
    """
    from mlease_tpu.core.dataset import BlockedData

    rng = np.random.default_rng(seed)
    n = n_features + 1  # + intercept column
    icpt = n_features
    B, R, K = nblocks, rows_per_block, nnz + 1

    # zipf-ish column draw
    raw = rng.zipf(1.3, size=(B, R, nnz)).astype(np.int64)
    cols = (raw - 1) % n_features
    indices = np.concatenate(
        [cols, np.full((B, R, 1), icpt, dtype=np.int64)], axis=2).astype(np.int32)
    values = np.concatenate(
        [rng.normal(size=(B, R, nnz)).astype(np.float32) * 0.5,
         np.ones((B, R, 1), dtype=np.float32)], axis=2)

    w_true = (rng.normal(size=n) * 0.3).astype(np.float32)
    w_true[icpt] = -1.5
    scores = np.einsum("brk,brk->br", values,
                       w_true[indices]).astype(np.float32)
    p = 1.0 / (1.0 + np.exp(-scores))
    y = np.where(rng.random((B, R)) < p, 1.0, -1.0).astype(np.float32)

    present = np.zeros((B, n), dtype=bool)
    for b in range(B):
        present[b, np.unique(indices[b])] = True

    return BlockedData(
        indices=indices, values=values, y=y,
        weight=np.ones((B, R), np.float32),
        offset=np.zeros((B, R), np.float32),
        present=present,
        nrows=np.full(B, R, np.int32), nblocks=B, dim=n), w_true


def bench_item_models():
    """BENCH_MODE=item: thousands of independent per-key LRs as bucketed
    batched solves (the BASELINE.json "NaiveTrain mode: 10K independent
    per-key small LR models" configuration)."""
    import jax

    from mlease_tpu.train.item import ItemConfig, train_item_models

    n_items = int(os.environ.get("BENCH_ITEMS", 10_000))
    rows_per_item = int(os.environ.get("BENCH_ITEM_ROWS", 48))
    n_feat = int(os.environ.get("BENCH_ITEM_FEATURES", 12))
    rng = np.random.default_rng(0)

    keyed = {}
    for i in range(n_items):
        w = rng.normal(size=n_feat) * 0.5
        rows = []
        for _ in range(rows_per_item):
            nnz = int(rng.integers(2, 7))
            js = rng.choice(n_feat, size=nnz, replace=False)
            vals = rng.normal(size=nnz)
            p = 1.0 / (1.0 + np.exp(-(w[js] * vals).sum() + 0.4))
            rows.append({"response": int(rng.random() < p),
                         "features": [(f"f{j}", float(v))
                                      for j, v in zip(js, vals)],
                         "weight": 1.0, "offset": 0.0})
        keyed[f"item{i}"] = rows

    cfg = ItemConfig(intercept_lambdas=[1.0], default_lambdas=[1.0, 10.0],
                     compute_var=True)
    t0 = time.monotonic()
    result = train_item_models(keyed, cfg)
    elapsed = time.monotonic() - t0
    n_models = len(result.models)
    print(json.dumps({
        "metric": "item_models_per_s",
        "value": round(n_models / elapsed, 1),
        "unit": f"models/s ({n_items} items x 2-point grid, "
                f"{rows_per_item} rows/item, posterior variance, "
                f"{jax.devices()[0].platform})",
        "vs_baseline": round((n_models / elapsed) / (1000 / 30.0), 1),
        "detail": {"total_s": round(elapsed, 2), "models": n_models},
    }))


def bench_convergence():
    """BENCH_MODE=convergence: wall-clock to target held-out loglik — the
    BASELINE.json headline metric ('wall-clock to target test loglik')."""
    import jax
    import jax.numpy as jnp

    from mlease_tpu.core.vocab import FeatureVocab
    from mlease_tpu.core.dataset import pack_rows
    from mlease_tpu.train.admm import AdmmConfig, AdmmTrainer

    n_features = int(os.environ.get("BENCH_FEATURES", 50_000))
    nblocks = int(os.environ.get("BENCH_BLOCKS", 4))
    rows = int(os.environ.get("BENCH_ROWS", 16_384))
    nnz = int(os.environ.get("BENCH_NNZ", 15))
    iters = int(os.environ.get("BENCH_ITERS", 20))

    data, w_true = synth_blocked_data(n_features, nblocks, rows, nnz)
    test, _ = synth_blocked_data(n_features, 1, 8192, nnz, seed=1)

    vocab = FeatureVocab.__new__(FeatureVocab)
    vocab._index = {}
    vocab._names = [f"f{i}" for i in range(n_features)] + ["(INTERCEPT)"]
    vocab._frozen = True
    vocab.has_intercept = True

    cfg = AdmmConfig(lambdas=[1.0, 10.0, 100.0], num_iters=iters,
                     regularizer=2, test_loglik_per_iter=True,
                     head_size=int(os.environ.get("BENCH_HEAD", "512")),
                     dtype=jnp.float32)
    trainer = AdmmTrainer(data, vocab, cfg)
    # wire the pre-packed synthetic test block directly
    trainer.test_arrays = (
        jnp.asarray(test.indices[0]), jnp.asarray(test.values[0], jnp.float32),
        jnp.asarray(test.y[0], jnp.float32),
        jnp.asarray(test.weight[0], jnp.float32),
        jnp.asarray(test.offset[0], jnp.float32))
    from mlease_tpu.train.admm import build_loglik_fn
    trainer.loglik_fn = build_loglik_fn()

    t0 = time.monotonic()
    result = trainer.run()
    wall = time.monotonic() - t0

    best = result.best_loglik
    target = best - 1e-3
    hit_iter = None
    for entry in result.sample_loglik_history:
        if entry["testLoglik"] >= target:
            hit_iter = entry["iter"]
            break
    time_to_target = (sum(result.iter_times[:hit_iter])
                      if hit_iter else wall)
    print(json.dumps({
        "metric": "wall_clock_to_target_loglik_s",
        "value": round(time_to_target, 2),
        "unit": (f"s to within 1e-3 of best held-out loglik {best:.4f} "
                 f"(3-lambda path, {nblocks * rows} rows x {n_features} "
                 f"features, {jax.devices()[0].platform})"),
        "vs_baseline": round((30.0 * (hit_iter or result.iterations))
                             / max(time_to_target, 1e-9), 1),
        "detail": {"hit_iter": hit_iter, "iterations": result.iterations,
                   "best_loglik": best, "total_wall_s": round(wall, 2),
                   "iter_times_s": [round(t, 3) for t in result.iter_times]},
    }))


def main():
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: the heavy while-loop program compiles in
    # 2-5 min on the tunneled chip; cache hits make reruns near-instant
    try:
        cache_dir = os.environ.get("MLEASE_JAX_CACHE",
                                   "/root/repo/.jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    mode = os.environ.get("BENCH_MODE", "admm")
    if mode == "item":
        return bench_item_models()
    if mode == "convergence":
        return bench_convergence()

    from mlease_tpu.core.vocab import FeatureVocab
    from mlease_tpu.train.admm import AdmmConfig, AdmmTrainer

    n_features = int(os.environ.get("BENCH_FEATURES", 50_000))
    nblocks = int(os.environ.get("BENCH_BLOCKS", 4))
    rows = int(os.environ.get("BENCH_ROWS", 16_384))
    nnz = int(os.environ.get("BENCH_NNZ", 15))
    n_lambdas = int(os.environ.get("BENCH_LAMBDAS", 3))
    iters = int(os.environ.get("BENCH_ITERS", 4))

    data, _w_true = synth_blocked_data(n_features, nblocks, rows, nnz)

    # lightweight vocab stand-in: only intercept_index is used by the trainer
    vocab = FeatureVocab.__new__(FeatureVocab)
    vocab._index = {}
    vocab._names = [f"f{i}" for i in range(n_features)] + ["(INTERCEPT)"]
    vocab._frozen = True
    vocab.has_intercept = True

    lambdas = [1.0, 10.0, 100.0][:n_lambdas]
    cfg = AdmmConfig(lambdas=lambdas, num_iters=iters, regularizer=2,
                     dual_layout=bool(int(os.environ.get("BENCH_DUAL", "0"))),
                     head_size=int(os.environ.get("BENCH_HEAD", "512")),
                     pcg=bool(int(os.environ.get("BENCH_PCG", "1"))),
                     dtype=jnp.float32)
    trainer = AdmmTrainer(data, vocab, cfg)

    L, n = len(lambdas), data.dim
    z = jnp.zeros((L, n), jnp.float32)
    u = jnp.zeros((L, data.nblocks, n), jnp.float32)
    lam_vec = trainer.lam_vec
    rho_eff = jnp.ones(L, jnp.float32)
    eps = 0.01 * trainer.eps_scale

    def step(z, u):
        return trainer.step(trainer.indices, trainer.values, trainer.y,
                            trainer.weight, trainer.offset, trainer.csc,
                            trainer.head, trainer.present,
                            trainer.block_valid, z, u, lam_vec, rho_eff,
                            rho_eff, eps)

    # NOTE: timings force a host fetch of the per-iteration diffs —
    # block_until_ready alone does not reliably wait on the tunneled axon
    # platform, so device->host transfer is the only honest barrier.
    t0 = time.monotonic()
    z, u, d = step(z, u)
    np.asarray(d)
    compile_time = time.monotonic() - t0  # includes the first (cold) solve

    # cold iteration (z=u=0, full-depth TRON solves)
    z = jnp.zeros((L, n), jnp.float32)
    u = jnp.zeros((L, data.nblocks, n), jnp.float32)
    t0 = time.monotonic()
    z, u, d = step(z, u)
    np.asarray(d)
    cold_iter = time.monotonic() - t0

    # steady state: warm-started iterations (the regime of a 10-20 iteration
    # ADMM run)
    t0 = time.monotonic()
    for _ in range(iters):
        z, u, d = step(z, u)
    np.asarray(d)
    elapsed = time.monotonic() - t0
    iters_per_s = iters / elapsed

    rows_total = nblocks * rows
    result = {
        "metric": "admm_iterations_per_s",
        "value": round(iters_per_s, 4),
        "unit": f"iter/s ({n_lambdas}-lambda path, {rows_total} rows x "
                f"{n_features} features, {nblocks} blocks, "
                f"{jax.devices()[0].platform})",
        "vs_baseline": round(iters_per_s * 30.0, 1),
        "detail": {
            "compile_s": round(compile_time, 2),
            "cold_iter_s": round(cold_iter, 3),
            "steady_iter_s": round(elapsed / iters, 4),
            "head_size": cfg.head_size,
            "multi_rhs": cfg.multi_rhs,
            "maxdiff_last": float(np.asarray(d).max()),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
