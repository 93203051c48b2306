"""Naive trainer: independent per-(lambda, key) fits + optional model mean.

TPU-native RegressionNaiveTrain (reference:
src/main/java/com/linkedin/mlease/regression/jobs/RegressionNaiveTrain.java):
the reference fans every record out x nlambdas, shuffles to one reducer per
(lambda, key) — with PartitionIdAssigner pre-assigning reducer ids in
heavy-per-item mode (:103-123) — and fits an independent liblinear model per
reducer. Here the keys become a batched axis of one vmapped TRON solve over
(lambda x key) on shared HBM data; PartitionIdAssigner is unnecessary (host
grouping replaces the shuffle), and the optional divide-and-average
`compute.model.mean` final model (:134-140,190-198) is a masked mean over the
key axis.

Semantics kept from the reference reducer (:286-416):
  * priorVar = 1/lambda by default, per-feature 1/lambda.map[k] overrides
    (:333-339), intercept variance 100000 unless penalize.intercept (:342)
  * scalar prior.mean for every feature (default 0) (:395 via defaultPriorMean)
  * bias column only when has.intercept (default true) (:361-369)
  * keys with fewer than data.size.threshold rows are skipped (:379-382)
  * output keys "lambda#key" (:228-241); each model carries only the features
    present in its key's data
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mlease_tpu.core.dataset import pack_blocks
from mlease_tpu.core.linear_model import LinearModel, mean_model
from mlease_tpu.core.vocab import build_vocab
from mlease_tpu.ops import admm_math, objective as obj
from mlease_tpu.ops.tron import tron
from mlease_tpu.train.admm import _lambda_key


@dataclass
class NaiveConfig:
    lambdas: Sequence[float] = (1.0,)
    liblinear_epsilon: float = 0.001  # RegressionNaiveTrain.java:149 default
                                      # (the ADMM warm-start init path sets
                                      # 0.01 explicitly, AdmmTrain.java:246)
    has_intercept: bool = True
    penalize_intercept: bool = False
    prior_mean: float = 0.0
    lambda_map: Mapping[str, float] | None = None
    data_size_threshold: int = 0
    compute_model_mean: bool = False
    positive_weight: float = 1.0
    multi_rhs: bool = True        # lambda path as trailing axis (one data
                                  # pass per key serves all lambdas)
    pcg: bool = True              # Jacobi-preconditioned CG (multi-RHS only)
    flat_blocks: bool = True      # fold the key axis into the coefficient
                                  # axis (one stacked (K*n, L) solve —
                                  # batched gathers measure ~1.9x flat, see
                                  # train/admm.py); joint trust region and
                                  # the strictest per-key eps scale; same
                                  # converged models to solver tolerance.
                                  # Single-device multi-RHS only.
    dtype: Any = jnp.float32
    max_newton_iter: int = 1000
    max_cg_iter: int = 500
    intercept_prior_var: float = 100000.0  # RegressionNaiveTrain.java:342
    intercept_key: str | None = None  # "intercept.key": WHICH feature gets
                                      # the unpenalized 1e5 prior variance
                                      # (the reference injects it into the
                                      # variance map under this name,
                                      # RegressionNaiveTrain.java:146,342);
                                      # None = the bias column "(INTERCEPT)"


@dataclass
class NaiveResult:
    models: dict[str, LinearModel]          # "lambda#key" -> model
    mean_models: dict[str, LinearModel] | None  # "lambda" -> mean (final-model)
    skipped_keys: list[str]


def train_naive(keyed_rows: Mapping[str, Sequence[Mapping]],
                config: NaiveConfig, vocab=None, mesh=None) -> NaiveResult:
    """Fit one model per (lambda, key).

    keyed_rows: {key -> canonical rows}; for block mode keys are "0".."N-1"
    (reference NaiveMapper key selection, RegressionNaiveTrain.java:228-241).
    """
    cfg = config
    dtype = cfg.dtype
    keys = sorted(keyed_rows)
    kept_keys = [k for k in keys
                 if len(keyed_rows[k]) >= max(cfg.data_size_threshold, 1)]
    skipped = [k for k in keys if k not in kept_keys]
    if not kept_keys:
        return NaiveResult({}, {} if cfg.compute_model_mean else None, skipped)

    all_rows = [r for k in kept_keys for r in keyed_rows[k]]
    if vocab is None:
        vocab = build_vocab(all_rows, has_intercept=cfg.has_intercept)

    bias = 1.0 if cfg.has_intercept else 0.0
    data = pad_data = pack_blocks([keyed_rows[k] for k in kept_keys], vocab,
                                  bias=bias)
    block_valid = np.ones(data.nblocks)
    if mesh is not None:
        from mlease_tpu.parallel.mesh import pad_blocks, shard_blocked_arrays
        pad_data, block_valid = pad_blocks(data, mesh.devices.size)

    lambdas = [float(l) for l in cfg.lambdas]
    n = vocab.size

    # prior variance per (lambda, feature): 1/lambda default, 1/lambda.map[k]
    # overrides, big variance for the intercept unless penalized
    # the unpenalized-intercept entry targets the feature named by
    # intercept.key (default: the bias column); a custom name redirects the
    # 1e5 variance to that data feature and leaves the bias column at
    # 1/lambda, exactly as the reference's variance-map injection behaves
    icpt_idx = (vocab.get(cfg.intercept_key) if cfg.intercept_key
                else vocab.intercept_index)
    pvi = np.zeros((len(lambdas), n))
    for i, lam in enumerate(lambdas):
        lam_vec = admm_math.per_feature_lambda(lam, n, cfg.lambda_map, vocab)
        pvi[i] = lam_vec
        if icpt_idx is not None and not cfg.penalize_intercept:
            pvi[i, icpt_idx] = 1.0 / cfg.intercept_prior_var
    prior_var_inv = jnp.asarray(pvi, dtype)
    prior_mean = jnp.full((n,), cfg.prior_mean, dtype)

    indices = jnp.asarray(pad_data.indices)
    values = jnp.asarray(pad_data.values, dtype)
    y = jnp.asarray(pad_data.y, dtype)
    weight = jnp.asarray(pad_data.weight, dtype)
    if cfg.positive_weight != 1.0:
        weight = jnp.where(y == 1, cfg.positive_weight * weight, weight)
    offset = jnp.asarray(pad_data.offset, dtype)
    eps = jnp.asarray(cfg.liblinear_epsilon
                      * obj.class_balance_eps_scale(pad_data.y, pad_data.nrows),
                      dtype)

    if mesh is not None:
        from mlease_tpu.parallel.mesh import shard_blocked_arrays
        sh = shard_blocked_arrays(mesh, {
            "indices": indices, "values": values, "y": y, "weight": weight,
            "offset": offset, "eps": eps})
        indices, values, y = sh["indices"], sh["values"], sh["y"]
        weight, offset, eps = sh["weight"], sh["offset"], sh["eps"]

    if cfg.multi_rhs:
        from mlease_tpu.ops.tron_multi import MultiProblem, tron_multi

        pvi_T = prior_var_inv.T                           # (n, L)
        pm_T = jnp.broadcast_to(prior_mean[:, None], pvi_T.shape)
        L = len(lambdas)

        def solve_key(indices, values, y, weight, offset, eps):
            prob = MultiProblem(indices=indices, values=values, y=y,
                                weight=weight, offset=offset,
                                prior_mean=pm_T, prior_var_inv=pvi_T)
            return tron_multi(prob, jnp.zeros((n, L), dtype), eps,
                              max_iter=cfg.max_newton_iter,
                              max_cg_iter=cfg.max_cg_iter,
                              precondition=cfg.pcg).w

        # stacked column AND row ids live in int32 (no hybrid head here, so
        # only the column ids are offset — the row guard keeps symmetry
        # with the other flat paths and costs nothing)
        n_keys_pad = pad_data.indices.shape[0]
        if (cfg.flat_blocks and mesh is None
                and n_keys_pad * n < 2**31
                and n_keys_pad * pad_data.padded_rows < 2**31):
            # keys fold into the coefficient axis: one (K*n, L) stacked
            # solve (train/admm.py solve_flat rationale — batched gathers
            # measure ~1.9x their flat equivalents)
            @jax.jit
            def solve_flat(indices, values, y, weight, offset, eps):
                Kk, R, Kn = indices.shape
                boffs = jnp.arange(Kk, dtype=jnp.int32)[:, None, None] * n
                prob = MultiProblem(
                    indices=(indices + boffs).reshape(Kk * R, Kn),
                    values=values.reshape(Kk * R, Kn),
                    y=y.reshape(-1), weight=weight.reshape(-1),
                    offset=offset.reshape(-1),
                    prior_mean=jnp.tile(pm_T, (Kk, 1)),
                    prior_var_inv=jnp.tile(pvi_T, (Kk, 1)))
                w = tron_multi(prob, jnp.zeros((Kk * n, L), dtype),
                               jnp.min(eps), max_iter=cfg.max_newton_iter,
                               max_cg_iter=cfg.max_cg_iter,
                               precondition=cfg.pcg).w
                return w.reshape(Kk, n, L)

            x_T = solve_flat(indices, values, y, weight, offset, eps)
        else:
            solve = jax.jit(jax.vmap(solve_key))
            x_T = solve(indices, values, y, weight, offset, eps)  # (K, n, L)
        x = np.asarray(x_T, np.float64).transpose(2, 0, 1)[:, :data.nblocks]
    else:
        solver = partial(tron, max_iter=cfg.max_newton_iter,
                         max_cg_iter=cfg.max_cg_iter)

        def solve_one(indices, values, y, weight, offset, pvi_l, eps):
            prob = obj.LRProblem(indices=indices, values=values, y=y,
                                 weight=weight, offset=offset,
                                 prior_mean=prior_mean, prior_var_inv=pvi_l)
            return solver(prob, jnp.zeros(n, dtype), eps).w

        solve_keys = jax.vmap(solve_one, in_axes=(0, 0, 0, 0, 0, None, 0))
        solve_grid = jax.jit(jax.vmap(
            solve_keys, in_axes=(None, None, None, None, None, 0, None)))
        x = solve_grid(indices, values, y, weight, offset, prior_var_inv, eps)
        x = np.asarray(x, np.float64)[:, :data.nblocks]   # (L, K, n)

    models: dict[str, LinearModel] = {}
    for i, lam in enumerate(lambdas):
        for b, key in enumerate(kept_keys):
            dense = np.where(data.present[b], x[i, b], 0.0)
            model = LinearModel.from_dense(dense, vocab)
            models[f"{_lambda_key(lam)}#{key}"] = model

    mean_models = None
    if cfg.compute_model_mean:
        mean_models = mean_model(models, nblocks=len(kept_keys),
                                 nlambdas=len(lambdas))
    return NaiveResult(models=models, mean_models=mean_models,
                       skipped_keys=skipped)
