"""Does the jax persistent compilation cache work on the axon TPU backend?

Compiles the bench-default ADMM step once and reports acquisition, transfer,
and compile wall times plus whether new cache entries appeared. Run twice —
first with MLEASE_JAX_CACHE=<empty dir>, then with the repo cache — to
separate cache-hit speedup from server-side state.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    cache_dir = os.environ.get("MLEASE_JAX_CACHE", "/root/repo/.jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    before = set(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else set()

    import jax.numpy as jnp
    from bench import synth_blocked_data, _make_vocab
    from mlease_tpu.train.admm import AdmmConfig, AdmmTrainer

    t0 = time.monotonic()
    x = jnp.ones((8, 128))
    np.asarray(x * 2)
    print(f"acquire+tiny-op: {time.monotonic()-t0:7.2f}s")

    data, _ = synth_blocked_data(50_000, 4, 16_384, 15)
    vocab = _make_vocab(50_000)
    cfg = AdmmConfig(lambdas=[1.0, 10.0, 100.0], num_iters=4, regularizer=2,
                     head_size=512, pcg=True, dtype=jnp.float32)
    t0 = time.monotonic()
    trainer = AdmmTrainer(data, vocab, cfg)
    print(f"trainer build+xfer: {time.monotonic()-t0:7.2f}s")

    L, n = 3, data.dim
    z = jnp.zeros((L, n), jnp.float32)
    u = jnp.zeros((L, 4, n), jnp.float32)
    rho = jnp.ones(L, jnp.float32)
    eps = 0.01 * trainer.eps_scale

    t0 = time.monotonic()
    lowered = jax.jit(
        trainer.step.__wrapped__ if hasattr(trainer.step, "__wrapped__")
        else None) if False else None
    z, u, d, stats = trainer.step(
        trainer.indices, trainer.values, trainer.y, trainer.weight,
        trainer.offset, trainer.csc, trainer.head, trainer.present,
        trainer.block_valid, z, u, trainer.lam_vec, rho, rho, eps)
    np.asarray(d)
    print(f"step compile+first: {time.monotonic()-t0:7.2f}s")

    after = set(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else set()
    new = sorted(after - before)
    print(f"new cache entries: {len(new)}")
    for f in new[:6]:
        print("  +", f)


if __name__ == "__main__":
    main()
