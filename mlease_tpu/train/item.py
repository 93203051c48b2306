"""Per-item model training: thousands of small LRs with posterior variance.

TPU-native ItemModelTrain (reference:
src/main/java/com/linkedin/mlease/regression/jobs/ItemModelTrain.java:130-312):
the reference shuffles rows to one reducer per item key and fits the
(intercept.lambdas x default.lambdas) hyperparameter grid sequentially per
item. Here items are packed into *local* dense coordinate systems (intercept
at local index 0, the item's observed features after it), bucketed by padded
(rows, features) shape, and each bucket solves the whole (grid x item) batch
as one vmapped TRON call — thousands of independent small models ride one
compiled program, and the Laplace posterior variance comes from batched
Hessians on the MXU.

Reference semantics kept:
  * grid keys "ilambda:dlambda#item" (ItemModelTrain.java:265)
  * intercept prior mean from intercept.prior.mean.map else
    intercept.default.prior.mean (:240-248); other features prior mean 0
  * prior var: 1/intercept_lambda for the intercept, per-feature
    1/lambda.map[k], else 1/default_lambda (:251-262 with :193-216)
  * posterior variance (compute.var): diagonal 1/hessianDiagonal
    (LibLinear.java:330-333), or full Cholesky-inverse of the Hessian
    (LibLinear.java:317-327) with the diagonal reported
  * lambda.map features absent from an item's data report posterior variance
    = prior variance (LibLinear.java:385-396)
  * cold start w=0 (initParam=null, ItemModelTrain.java:262)
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mlease_tpu.core.linear_model import LinearModel
from mlease_tpu.io.records import INTERCEPT_NAME
from mlease_tpu.ops import objective as obj
from mlease_tpu.ops.tron import tron
from mlease_tpu.train.admm import _lambda_key


@dataclass
class ItemConfig:
    intercept_lambdas: Sequence[float] = (1.0,)
    default_lambdas: Sequence[float] = (1.0,)
    intercept_default_prior_mean: float = 0.0
    intercept_prior_mean_map: Mapping[str, float] | None = None
    lambda_map: Mapping[str, float] | None = None
    compute_var: bool = False
    full_cov: bool = False
    liblinear_epsilon: float = 0.01
    positive_weight: float = 1.0
    solver: str = "cholesky"   # "cholesky": dense Newton + MXU Gram (the
                               # speed-of-light small-problem path); "tron":
                               # the CG solver shared with the ADMM x-update
    dtype: Any = jnp.float32
    max_newton_iter: int = 1000
    max_cg_iter: int = 500


@dataclass
class ItemResult:
    models: dict[str, LinearModel]                 # "il:dl#item" -> model
    posterior_var: dict[str, LinearModel]          # same keys (empty model if
                                                   # compute_var=False)
    covariances: dict[str, dict] | None = None     # full_cov: {key: {(f1,f2): v}}


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _bucket_dim(x: int, floor: int = 8) -> int:
    """Next power of two (>= floor): shape-buckets items so thousands of
    distinct per-item sizes share a handful of compiled solver
    specializations (at most ~2x padding waste)."""
    n = floor
    while n < x:
        n <<= 1
    return n


def _pack_local(rows, lambda_map):
    """One item's rows -> local coords. Returns (names, indices, values, y,
    weight, offset, map_mask, map_vals) with intercept at local index 0."""
    names = [INTERCEPT_NAME]
    index = {INTERCEPT_NAME: 0}
    parsed = []
    for row in rows:
        acc = {0: 1.0}  # intercept/bias slot
        for key, v in row["features"]:
            j = index.get(key)
            if j is None:
                j = len(names)
                index[key] = j
                names.append(key)
            acc[j] = acc.get(j, 0.0) + v
        parsed.append(acc)
    return names, index, parsed


def train_item_models(keyed_rows: Mapping[str, Sequence[Mapping]],
                      config: ItemConfig) -> ItemResult:
    cfg = config
    dtype = cfg.dtype
    lambda_map = dict(cfg.lambda_map or {})
    pm_map = dict(cfg.intercept_prior_mean_map or {})

    # -- host: local packing + shape bucketing ---------------------------
    items = []
    for key in sorted(keyed_rows):
        rows = keyed_rows[key]
        if not rows:
            continue
        names, index, parsed = _pack_local(rows, lambda_map)
        R = _bucket_dim(len(rows))
        K = _bucket_dim(max(len(a) for a in parsed))
        F = _bucket_dim(len(names))
        items.append((key, rows, names, parsed, R, K, F))

    buckets: dict[tuple[int, int, int], list] = {}
    for it in items:
        buckets.setdefault((it[4], it[5], it[6]), []).append(it)

    grid = [(il, dl) for il in cfg.intercept_lambdas
            for dl in cfg.default_lambdas]
    G = len(grid)
    il_arr = jnp.asarray([g[0] for g in grid], dtype)
    dl_arr = jnp.asarray([g[1] for g in grid], dtype)

    if cfg.solver == "cholesky":
        from mlease_tpu.ops.newton import newton_cholesky

        def solver(prob, w0, eps):
            return newton_cholesky(prob, w0, eps,
                                   max_iter=min(cfg.max_newton_iter, 100))
    elif cfg.solver == "tron":
        solver = partial(tron, max_iter=cfg.max_newton_iter,
                         max_cg_iter=cfg.max_cg_iter)
    else:
        raise ValueError(f"unknown solver {cfg.solver!r}")

    def solve_bucket_fn(F):
        """Batched (grid x item) solve + posterior variance for one bucket
        shape. prior var per grid point g and item i:
        pvi[0]=il_g; pvi[f]=lambda_map override else dl_g; padding lanes 1."""

        def one(indices, values, y, weight, offset, prior_mean, map_mask,
                map_pvi, pad_mask, eps, il, dl):
            pvi = jnp.where(map_mask, map_pvi, dl)
            pvi = pvi.at[0].set(il)
            pvi = jnp.where(pad_mask, 1.0, pvi)
            prob = obj.LRProblem(indices=indices, values=values, y=y,
                                 weight=weight, offset=offset,
                                 prior_mean=prior_mean, prior_var_inv=pvi)
            w = solver(prob, jnp.zeros(F, dtype), eps).w
            if cfg.compute_var:
                if cfg.full_cov:
                    H = obj.dense_hessian(prob, w)
                    cov = jnp.linalg.inv(H)
                    pvar = jnp.diagonal(cov)
                else:
                    pvar = 1.0 / obj.hessian_diagonal(prob, w)
                    cov = jnp.zeros((F, F), dtype)
            else:
                pvar = jnp.zeros(F, dtype)
                cov = jnp.zeros((0, 0), dtype)
            return w, pvar, cov

        over_items = jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                                            None, None))
        over_grid = jax.vmap(over_items,
                             in_axes=(None,) * 10 + (0, 0))
        return jax.jit(over_grid)

    models: dict[str, LinearModel] = {}
    posterior: dict[str, LinearModel] = {}
    covs: dict[str, dict] = {} if (cfg.compute_var and cfg.full_cov) else None

    for (R, K, F), bucket in sorted(buckets.items()):
        I = len(bucket)
        indices = np.zeros((I, R, K), np.int32)
        values = np.zeros((I, R, K), np.float32)
        y = np.ones((I, R), np.float32)
        weight = np.zeros((I, R), np.float32)
        offset = np.zeros((I, R), np.float32)
        prior_mean = np.zeros((I, F), np.float64)
        map_mask = np.zeros((I, F), bool)
        map_pvi = np.ones((I, F), np.float64)
        pad_mask = np.zeros((I, F), bool)
        nrows = np.zeros(I, np.int32)

        for i, (key, rows, names, parsed, *_shape) in enumerate(bucket):
            for r, acc in enumerate(parsed):
                cols = list(acc.keys())
                indices[i, r, :len(cols)] = cols
                values[i, r, :len(cols)] = [acc[c] for c in cols]
                y[i, r] = 1.0 if rows[r]["response"] == 1 else -1.0
                w_ = rows[r].get("weight", 1.0)
                weight[i, r] = (w_ * cfg.positive_weight
                                if (y[i, r] == 1 and cfg.positive_weight != 1.0)
                                else w_)
                offset[i, r] = rows[r].get("offset", 0.0)
            nrows[i] = len(rows)
            prior_mean[i, 0] = pm_map.get(key, cfg.intercept_default_prior_mean)
            for f, name in enumerate(names):
                if f > 0 and name in lambda_map:
                    map_mask[i, f] = True
                    map_pvi[i, f] = lambda_map[name]
            pad_mask[i, len(names):] = True

        eps = cfg.liblinear_epsilon * obj.class_balance_eps_scale(y, nrows)
        fn = solve_bucket_fn(F)
        w, pvar, cov = fn(
            jnp.asarray(indices), jnp.asarray(values, dtype),
            jnp.asarray(y, dtype), jnp.asarray(weight, dtype),
            jnp.asarray(offset, dtype), jnp.asarray(prior_mean, dtype),
            jnp.asarray(map_mask), jnp.asarray(map_pvi, dtype),
            jnp.asarray(pad_mask), jnp.asarray(eps, dtype), il_arr, dl_arr)
        w = np.asarray(w, np.float64)
        pvar = np.asarray(pvar, np.float64)
        cov = np.asarray(cov, np.float64)

        for g, (il, dl) in enumerate(grid):
            for i, (key, rows, names, parsed, *_shape) in enumerate(bucket):
                out_key = f"{_lambda_key(il)}:{_lambda_key(dl)}#{key}"
                nf = len(names)
                coeffs = {names[f]: w[g, i, f] for f in range(1, nf)}
                models[out_key] = LinearModel(coeffs, intercept=w[g, i, 0])
                if cfg.compute_var:
                    pv = {names[f]: pvar[g, i, f] for f in range(1, nf)}
                    # absent lambda.map features report prior variance
                    # (LibLinear.java:385-396)
                    for k, lam_k in lambda_map.items():
                        if k not in pv:
                            pv[k] = 1.0 / lam_k
                    posterior[out_key] = LinearModel(pv,
                                                     intercept=pvar[g, i, 0])
                    if cfg.full_cov:
                        covs[out_key] = {
                            (names[a], names[b]): cov[g, i, a, b]
                            for a in range(nf) for b in range(nf)}
                else:
                    posterior[out_key] = LinearModel()

    return ItemResult(models=models, posterior_var=posterior,
                      covariances=covs)


def write_item_models(path: str, result: ItemResult,
                      intercept_key: str = INTERCEPT_NAME) -> None:
    """Write LinearModelWithVarAvro records (ItemModelTrain.java:264-273)."""
    from mlease_tpu.io import avro, schemas

    records = []
    for key, model in result.models.items():
        records.append({
            "key": key,
            "model": model.to_avro(intercept_key),
            "posteriorVar": result.posterior_var[key].to_avro(intercept_key),
        })
    avro.write_records(path, schemas.LINEAR_MODEL_WITH_VAR, records)


# Full posterior covariance persistence. The reference computes the full
# Laplace covariance (LibLinear.java:317-327, getPostVarMatrixMap) but never
# writes it to disk; this schema fills that gap: row-major covariance over
# the listed feature order (intercept first).
COVARIANCE_SCHEMA = {
    "type": "record",
    "name": "LinearModelCovarianceAvro",
    "namespace": "com.linkedin.mlease.avro",
    "fields": [
        {"name": "key", "type": "string"},
        {"name": "features", "type": {"type": "array", "items": "string"}},
        {"name": "cov", "type": {"type": "array", "items": "float"}},
    ],
}


def write_item_covariances(path: str, result: ItemResult,
                           intercept_key: str = INTERCEPT_NAME) -> None:
    if result.covariances is None:
        raise ValueError("train with compute_var=True, full_cov=True")
    from mlease_tpu.io import avro

    records = []
    for key, cov in result.covariances.items():
        internal = [INTERCEPT_NAME] + list(result.models[key].coefficients)
        display = [intercept_key] + internal[1:]
        flat = [float(cov.get((a, b), 0.0))
                for a in internal for b in internal]
        records.append({"key": key, "features": display, "cov": flat})
    avro.write_records(path, COVARIANCE_SCHEMA, records)


def read_item_covariances(path: str):
    """-> {key: (names list, cov ndarray (F, F))}."""
    import numpy as _np

    from mlease_tpu.io import avro

    out = {}
    for rec in avro.read_records(path):
        names = list(rec["features"])
        F = len(names)
        out[rec["key"]] = (names,
                           _np.asarray(rec["cov"],
                                       _np.float64).reshape(F, F))
    return out
