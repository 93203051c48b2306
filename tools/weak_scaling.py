"""Weak-scaling measurement over a virtual device mesh.

Runs the full jitted ADMM step at FIXED work per device (blocks_per_device x
rows_per_block) while growing the mesh, and reports iterations/s + parallel
efficiency vs the 1-device run. On the CPU backend with
XLA_FLAGS=--xla_force_host_platform_device_count=N this validates the
sharding/collective layout and gives a stand-in curve until a real pod slice
is available (BASELINE.json target: >=80% weak-scaling efficiency at 2+
hosts; the CPU mesh shares one socket's memory bandwidth, so the virtual
curve is a LOWER bound on ICI behavior for this bandwidth-bound workload).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python tools/weak_scaling.py --devices 1,2,4,8

Prints one JSON line: {"metric": "weak_scaling", ...}.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(n_dev: int, blocks_per_dev: int, rows: int, features: int,
            nnz: int, iters: int) -> dict:
    import jax
    import jax.numpy as jnp

    from bench import synth_blocked_data, _make_vocab
    from mlease_tpu.parallel.mesh import make_mesh
    from mlease_tpu.train.admm import AdmmConfig, AdmmTrainer

    mesh = make_mesh(jax.devices(), n=n_dev)
    nblocks = blocks_per_dev * n_dev
    data, _ = synth_blocked_data(features, nblocks, rows, nnz)
    vocab = _make_vocab(features)
    cfg = AdmmConfig(lambdas=[1.0, 10.0], num_iters=iters, regularizer=2,
                     head_size=int(os.environ.get("BENCH_HEAD", "64")),
                     dtype=jnp.float32)
    trainer = AdmmTrainer(data, vocab, cfg, mesh=mesh)

    L, n = 2, data.dim
    from jax.sharding import NamedSharding, PartitionSpec as P
    z = jax.device_put(jnp.zeros((L, n), jnp.float32),
                       NamedSharding(mesh, P()))
    u = jax.device_put(jnp.zeros((L, trainer.data.nblocks, n), jnp.float32),
                       NamedSharding(mesh, P(None, "block")))
    rho = jnp.ones(L, jnp.float32)
    eps = 0.01 * trainer.eps_scale

    def step(z, u):
        return trainer.step(trainer.indices, trainer.values, trainer.y,
                            trainer.weight, trainer.offset, trainer.csc,
                            trainer.head, trainer.present,
                            trainer.block_valid, z, u, trainer.lam_vec,
                            rho, rho, eps)

    z, u, d, _s = step(z, u)
    np.asarray(d)                      # compile + settle
    t0 = time.monotonic()
    for _ in range(iters):
        z, u, d, _s = step(z, u)
    np.asarray(d)
    dt = (time.monotonic() - t0) / iters
    return {"devices": n_dev, "nblocks": nblocks, "iter_s": round(dt, 4),
            "iters_per_s": round(1.0 / dt, 3)}


def measure_feature(n_dev: int, feats_per_shard: int, rows: int, nnz: int,
                    iters: int, nblocks: int = 2) -> dict:
    """Model weak scaling: n grows with the feat axis (fixed n/shard) and
    per-row nnz grows with it (fixed nnz/shard), so per-chip coefficient
    state AND per-chip gather work stay constant while the model grows — a
    flat curve demonstrates the >HBM claim. On the virtual CPU mesh all
    devices share one socket and collectives serialize, so the virtual curve
    badly under-reports what ICI psum delivers; treat it as a correctness/
    lower-bound exercise (same caveat as block mode, worse because this mode
    psums per Xv rather than per iteration)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bench import synth_blocked_data, _make_vocab
    from mlease_tpu.parallel.mesh import make_mesh_2d
    from mlease_tpu.train.admm import AdmmConfig
    from mlease_tpu.train.feature_sharded import FeatureShardedAdmmTrainer

    mesh = make_mesh_2d(jax.devices(), block=1, feat=n_dev)
    n = feats_per_shard * n_dev
    data, _ = synth_blocked_data(n, nblocks, rows, nnz * n_dev)
    vocab = _make_vocab(n)
    cfg = AdmmConfig(lambdas=[1.0, 10.0], num_iters=iters, regularizer=2,
                     dtype=jnp.float32)
    trainer = FeatureShardedAdmmTrainer(data, vocab, cfg, mesh=mesh)

    L = 2
    S, nl = trainer.fs.n_shards, trainer.fs.n_local
    z = jax.device_put(jnp.zeros((S, L, nl), jnp.float32),
                       NamedSharding(mesh, P("feat")))
    u = jax.device_put(jnp.zeros((S, L, trainer.fs.nblocks, nl), jnp.float32),
                       NamedSharding(mesh, P("feat", None, "block")))
    rho = jnp.ones(L, jnp.float32)
    eps = 0.01 * trainer.eps_scale

    def step(z, u):
        return trainer.step(trainer.indices, trainer.values, trainer.y,
                            trainer.weight, trainer.offset, trainer.present,
                            trainer.block_valid, z, u, trainer.lam,
                            trainer.icpt_mask, rho, rho, eps)

    z, u, d, _nt, _cg = step(z, u)
    np.asarray(d)                      # compile + settle
    t0 = time.monotonic()
    for _ in range(iters):
        z, u, d, _nt, _cg = step(z, u)
    np.asarray(d)
    dt = (time.monotonic() - t0) / iters
    return {"devices": n_dev, "features": n, "iter_s": round(dt, 4),
            "iters_per_s": round(1.0 / dt, 3)}


def main():
    # the axon plugin ignores the JAX_PLATFORMS env var; apply it via config
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax as _jax
        _jax.config.update("jax_platforms", plat)
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--blocks-per-device", type=int, default=2)
    ap.add_argument("--rows", type=int, default=2048)
    ap.add_argument("--features", type=int, default=5000)
    ap.add_argument("--nnz", type=int, default=10)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--mode", choices=["block", "feature"], default="block",
                    help="block: data weak scaling (blocks/device fixed); "
                         "feature: model weak scaling (features/shard fixed, "
                         "train/feature_sharded.py)")
    args = ap.parse_args()

    import jax
    counts = [int(x) for x in args.devices.split(",")]
    avail = len(jax.devices())
    counts = [c for c in counts if c <= avail]

    if args.mode == "feature":
        points = [measure_feature(c, args.features, args.rows, args.nnz,
                                  args.iters) for c in counts]
    else:
        points = [measure(c, args.blocks_per_device, args.rows, args.features,
                          args.nnz, args.iters) for c in counts]
    base = points[0]["iter_s"]
    ncores = os.cpu_count() or 1
    on_cpu = jax.devices()[0].platform == "cpu"
    over_base = max(points[0]["devices"] / ncores, 1.0)
    for p in points:
        # weak scaling: same per-device work, so efficiency = t1 / tN
        p["efficiency"] = round(base / p["iter_s"], 3)
        if on_cpu:
            # the virtual mesh multiplexes all devices onto ncores physical
            # cores: past that point the host is compute-saturated and raw
            # efficiency just measures oversubscription (devices/ncores).
            # Normalizing by the oversubscription growth RELATIVE TO THE
            # BASE POINT (over_p / over_base — the base point is 1.0 by
            # construction even when it already oversubscribes) isolates
            # what the sharding/collective layout itself costs — 1.0 means
            # iteration time grew exactly with total work, i.e. the layout
            # added no super-linear communication overhead. This is a
            # DIAGNOSTIC, not a weak-scaling efficiency: the published
            # value and vs_baseline always use the raw efficiency.
            over = max(p["devices"] / ncores, 1.0)
            p["efficiency_core_normalized"] = round(
                base / p["iter_s"] * over / over_base, 3)
    last = points[-1]
    print(json.dumps({"metric": f"weak_scaling_{args.mode}",
                      "value": last["efficiency"],
                      "unit": f"efficiency at {last['devices']} devices "
                              f"({jax.devices()[0].platform}, "
                              f"{ncores} cores"
                              + (", raw; virtual-mesh oversubscription "
                                 "diagnostic in detail" if on_cpu else "")
                              + ")",
                      "vs_baseline": round(last["efficiency"] / 0.8, 2),
                      "detail": {"points": points,
                                 "physical_cores": ncores}}))


if __name__ == "__main__":
    main()
