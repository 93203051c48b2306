"""Feature-sharded consensus ADMM: 2-D (block x feat) mesh model parallelism.

Removes the reference's hard model-size ceiling: every reference solve holds
the full coefficient vector in one reducer heap
(reference: src/main/java/com/linkedin/mlease/regression/liblinearfunc/LibLinear.java:340-420,
RegressionAdmmTrain.java:553-568 ships whole models through the shuffle), so
n is bounded by a single JVM / a single chip's HBM in the plain trainer
(train/admm.py replicates z per device). Here the coefficient axis is sharded
over the mesh's `feat` axis:

  * every device holds one column shard of its block row's data with
    shard-LOCAL ids (core/feature_shard.py, round-robin for balance) and the
    matching (n/S)-sized slices of z, u, priors and lambda vectors;
  * the TRON solve runs inside shard_map with
    tron_multi(..., axis_name=FEAT_AXIS): one psum over `feat` per Xv
    assembles full score rows; X'v, the Jacobi diagonal and the z-update are
    column-local; every (L,) trust-region scalar is psum-replicated so the
    lock-step while_loops stay in step across shards by construction;
  * consensus is one psum over `block` per ADMM iteration (the meanModel
    reduce, RegressionAdmmTrain.java:362-364); no all-gather of z ever
    happens on the training path — per-chip coefficient HBM is n/S.

Layout: feat is the fast (innermost) mesh axis so the per-Xv psum rides the
fastest ICI links; the once-per-iteration block psum tolerates slower hops.
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mlease_tpu.core.dataset import BlockedData, pack_rows
from mlease_tpu.core.feature_shard import (FeatureShardedData,
                                           shard_feature_vector,
                                           shard_features,
                                           unshard_feature_vector,
                                           with_intercept)
from mlease_tpu.core.linear_model import LinearModel
from mlease_tpu.ops import admm_math, objective as obj
from mlease_tpu.parallel.mesh import BLOCK_AXIS, FEAT_AXIS, pad_blocks
from mlease_tpu.train.admm import (MAX_NTEST_EVENTS, AdmmConfig, AdmmResult,
                                   _lambda_key, build_loglik_fn)

logger = logging.getLogger(__name__)


class FeatureShardedAdmmTrainer:
    """AdmmTrainer semantics on a 2-D (block, feat) mesh.

    Config knobs follow AdmmConfig; the hybrid dense head and dual layout are
    single-chip data layouts and are ignored here (the ELL shard is the
    distributed layout). Per-iteration sample loglik gathers z to the host —
    a test-scale convenience; disable test_loglik_per_iter for >HBM runs (the
    training path itself never assembles the full z).
    """

    def __init__(self, data: BlockedData, vocab, config: AdmmConfig,
                 test_rows: Sequence[Mapping] | None = None, *, mesh):
        if tuple(mesh.axis_names) != (BLOCK_AXIS, FEAT_AXIS):
            raise ValueError(
                f"mesh axes must be ({BLOCK_AXIS!r}, {FEAT_AXIS!r}); "
                f"got {mesh.axis_names}")
        self.vocab = vocab
        self.config = config
        self.mesh = mesh
        self.nblocks = data.nblocks
        dtype = config.dtype
        db, df = mesh.devices.shape

        data, block_valid = pad_blocks(data, db)
        fs = with_intercept(shard_features(data, df), vocab.intercept_index)
        self.fs = fs
        self.dim = fs.dim
        self.lambdas = [float(l) for l in config.lambdas]
        self.rhos = config.resolved_rhos()
        S, nl = fs.n_shards, fs.n_local

        def put(a, spec):
            return jax.device_put(a, NamedSharding(mesh, spec))

        self.indices = put(fs.indices, P(FEAT_AXIS, BLOCK_AXIS))
        self.values = put(np.asarray(fs.values, dtype),
                          P(FEAT_AXIS, BLOCK_AXIS))
        self.present = put(fs.present, P(FEAT_AXIS, BLOCK_AXIS))
        weight = np.asarray(fs.weight, dtype)
        if config.positive_weight != 1.0:
            weight = np.where(fs.y == 1, config.positive_weight * weight,
                              weight).astype(dtype)
        self.y = put(np.asarray(fs.y, dtype), P(BLOCK_AXIS))
        self.weight = put(weight, P(BLOCK_AXIS))
        self.offset = put(np.asarray(fs.offset, dtype), P(BLOCK_AXIS))
        self.block_valid = put(np.asarray(block_valid, dtype), P(BLOCK_AXIS))
        self.eps_scale = put(np.asarray(
            obj.class_balance_eps_scale(fs.y, fs.nrows), dtype),
            P(BLOCK_AXIS))

        lam = np.stack([
            admm_math.per_feature_lambda(l, self.dim, config.lambda_map,
                                         vocab, dtype=np.float64)
            for l in self.lambdas])                     # (L, n)
        self.lam = put(np.asarray(
            shard_feature_vector(lam, S, nl, fill=lam.flat[0]), dtype),
            P(FEAT_AXIS))                               # (S, L, nl)

        icpt_mask = np.zeros((S, nl), bool)
        if (vocab.intercept_index is not None
                and not config.penalize_intercept):
            icpt_mask[fs.intercept_shard, fs.intercept_local] = True
        self.icpt_mask = put(icpt_mask, P(FEAT_AXIS))

        self.step = self._build_step()

        self.test_arrays = None
        if test_rows:
            rows = list(test_rows)[:MAX_NTEST_EVENTS]
            blk = pack_rows(rows, vocab)
            self.test_arrays = (
                jnp.asarray(blk.indices), jnp.asarray(blk.values, dtype),
                jnp.asarray(blk.y, dtype), jnp.asarray(blk.weight, dtype),
                jnp.asarray(blk.offset, dtype))
            self.loglik_fn = build_loglik_fn()

    # ------------------------------------------------------------------
    def _build_step(self):
        cfg = self.config
        nblocks = self.nblocks
        if cfg.regularizer not in (1, 2):
            raise ValueError("Only L1 and L2 regularization supported!")
        from mlease_tpu.ops.tron_multi import MultiProblem, tron_multi

        def solve_block(idx, val, yb, wb, ob, pm_T, pvi_T, W0, eps_b):
            prob = MultiProblem(indices=idx, values=val, y=yb, weight=wb,
                                offset=ob, prior_mean=pm_T,
                                prior_var_inv=pvi_T)
            res = tron_multi(prob, W0, eps_b, max_iter=cfg.max_newton_iter,
                             max_cg_iter=cfg.max_cg_iter,
                             precondition=cfg.pcg, axis_name=FEAT_AXIS)
            return res.w, res.newton_trips, res.cg_trips

        solve = jax.vmap(solve_block,
                         in_axes=(0, 0, 0, 0, 0, 0, None, None, 0))

        def step_local(indices, values, y, weight, offset, present,
                       block_valid, z, u, lam, icpt_mask, rho_eff, rho_base,
                       eps):
            # local shapes: indices (1,Bd,R,Kf), y (Bd,R), z (1,L,nl),
            # u (1,L,Bd,nl), lam (1,L,nl), icpt_mask (1,nl), eps (Bd,)
            z_l, u_l, lam_l = z[0], u[0], lam[0]
            mask = icpt_mask[0]
            dtype = z_l.dtype
            L, nl = z_l.shape
            prior_mean = z_l[:, None, :] - u_l            # (L, Bd, nl)
            prior_var_inv = (rho_eff[:, None]
                             * jnp.ones((1, nl), dtype))
            x_T, nt, cg = solve(indices[0], values[0], y, weight, offset,
                                prior_mean.transpose(1, 2, 0),  # (Bd, nl, L)
                                prior_var_inv.T, z_l.T, eps)
            x = x_T.transpose(2, 0, 1)                     # (L, Bd, nl)
            x = jnp.where(present[0][None], x, prior_mean)
            if cfg.relaxation != 1.0:
                x = (cfg.relaxation * x
                     + (1.0 - cfg.relaxation) * z_l[:, None, :])

            bv = block_valid[None, :, None]
            # consensus: ONE psum over the block axis per iteration
            xbar = jax.lax.psum(jnp.sum(x * bv, axis=1),
                                BLOCK_AXIS) / nblocks      # (L, nl)
            ubar = jax.lax.psum(jnp.sum(u_l * bv, axis=1),
                                BLOCK_AXIS) / nblocks
            v = xbar + ubar

            def zup(v_l, lam_vec, rho_l):
                if cfg.regularizer == 2:
                    return admm_math.z_update_l2_masked(
                        v_l, lam_vec, rho_l, nblocks, mask)
                return admm_math.z_update_l1_masked(
                    v_l, lam_vec, rho_l, nblocks, mask,
                    reference_compat=cfg.reference_l1_compat)

            z_new = jax.vmap(zup)(v, lam_l, rho_base)
            u_new = admm_math.u_update(u_l, x, z_new[:, None, :]) * bv
            diffs = admm_math.max_abs_diff(z_new, z_l, axis=-1)  # (L,) local
            return (z_new[None], u_new[None], diffs[None],
                    jnp.max(nt)[None], jnp.max(cg)[None])

        smap = jax.shard_map(
            step_local, mesh=self.mesh,
            in_specs=(P(FEAT_AXIS, BLOCK_AXIS), P(FEAT_AXIS, BLOCK_AXIS),
                      P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS),
                      P(FEAT_AXIS, BLOCK_AXIS), P(BLOCK_AXIS),
                      P(FEAT_AXIS), P(FEAT_AXIS, None, BLOCK_AXIS),
                      P(FEAT_AXIS), P(FEAT_AXIS), P(), P(), P(BLOCK_AXIS)),
            # diffs/trip counters come back per-shard/per-block-row
            # ((S,L) / (db,)) and reduce on the host: cheaper than proving
            # replication to the checker (check_vma=False: the z/u outputs
            # are block-replicated by the consensus psum; trip counters are
            # feat-replicated by solver lock-step)
            out_specs=(P(FEAT_AXIS), P(FEAT_AXIS, None, BLOCK_AXIS),
                       P(FEAT_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS)),
            check_vma=False)
        return jax.jit(smap, donate_argnums=(8,))

    # ------------------------------------------------------------------
    def _gather_z(self, z) -> np.ndarray:
        """(S, L, nl) device -> (L, n) host (test/serialization only)."""
        return unshard_feature_vector(np.asarray(z, np.float64), self.dim)

    def sample_loglik(self, z, z_host: np.ndarray | None = None) -> np.ndarray:
        """z_host: pass a pre-gathered (L, n) copy to avoid a second full
        device->host transfer of the model per iteration."""
        idx, val, y, w, off = self.test_arrays
        if z_host is None:
            z_host = self._gather_z(z)
        z_full = jnp.asarray(z_host, self.config.dtype)
        return np.asarray(self.loglik_fn(idx, val, y, w, off, z_full))

    # ------------------------------------------------------------------
    def run(self, z0: np.ndarray | None = None) -> AdmmResult:
        """Host driver loop — same schedules/stop rule as AdmmTrainer.run
        (RegressionAdmmTrain.java:281-497)."""
        cfg = self.config
        fs = self.fs
        L, S, nl = len(self.lambdas), fs.n_shards, fs.n_local
        dtype = cfg.dtype
        mesh = self.mesh

        def put(a, spec):
            return jax.device_put(a, NamedSharding(mesh, spec))

        if z0 is None:
            z = put(np.zeros((S, L, nl), dtype), P(FEAT_AXIS))
        else:
            z_full = np.broadcast_to(z0, (L, self.dim))
            z = put(np.asarray(
                shard_feature_vector(z_full, S, nl), dtype), P(FEAT_AXIS))
        u = put(np.zeros((S, L, fs.nblocks, nl), dtype),
                P(FEAT_AXIS, None, BLOCK_AXIS))
        rho_base = jnp.asarray(self.rhos, dtype)

        inner_eps = cfg.liblinear_epsilon
        mindiff = 99999999.0
        best_loglik = -9999999.0
        best_model = None
        best_lambda = None
        loglik_history: list[dict] = []
        diff_history: list[dict[str, float]] = []
        iter_times: list[float] = []
        solver_stats: list[dict] = []
        converged = False
        t_start = time.monotonic()

        if (z0 is not None and self.test_arrays is not None
                and cfg.test_loglik_per_iter):
            for lam, ll in zip(self.lambdas, self.sample_loglik(z)):
                loglik_history.append({"lambda": _lambda_key(lam), "iter": 0,
                                       "testLoglik": float(ll)})

        iteration = 0
        for iteration in range(1, cfg.num_iters + 1):
            t_iter = time.monotonic()
            inner_eps = admm_math.inner_eps_schedule(
                inner_eps, iteration, mindiff,
                aggressive=cfg.aggressive_liblinear_epsilon_decay)
            rho_eff = jnp.asarray([
                admm_math.rho_effective(
                    r, iteration,
                    initialize_boost_rate=(cfg.initialize_boost_rate
                                           if z0 is not None else 0.0),
                    rho_adapt_coefficient=cfg.rho_adapt_coefficient)
                for r in self.rhos], dtype)
            eps = inner_eps * self.eps_scale

            z, u, diffs_fs, nt, cg = self.step(
                self.indices, self.values, self.y, self.weight, self.offset,
                self.present, self.block_valid, z, u, self.lam,
                self.icpt_mask, rho_eff, rho_base, eps)
            diffs_np = np.asarray(diffs_fs, np.float64).max(axis=0)  # (L,)
            iter_times.append(time.monotonic() - t_iter)
            solver_stats.append({
                "newton_trips": int(np.asarray(nt).max()),
                "cg_trips": int(np.asarray(cg).max())})
            mindiff = float(diffs_np.min())
            maxdiff = float(diffs_np.max())
            diff_history.append({_lambda_key(l): float(d)
                                 for l, d in zip(self.lambdas, diffs_np)})
            logger.info(
                "fs iter %d: inner_eps=%g maxdiff=%g mindiff=%g (%.2fs)",
                iteration, inner_eps, maxdiff, mindiff, iter_times[-1])

            if self.test_arrays is not None and cfg.test_loglik_per_iter:
                z_host = self._gather_z(z)
                lls = self.sample_loglik(z, z_host=z_host)
                for li, (lam, ll) in enumerate(zip(self.lambdas, lls)):
                    ll = float(ll)
                    loglik_history.append({"lambda": _lambda_key(lam),
                                           "iter": iteration,
                                           "testLoglik": ll})
                    if ll > best_loglik:
                        best_loglik = ll
                        best_lambda = _lambda_key(lam)
                        best_model = LinearModel.from_dense(z_host[li],
                                                            self.vocab)

            if admm_math.should_stop(maxdiff, inner_eps, cfg.epsilon,
                                     cfg.inner_eps_floor):
                converged = True
                break

        z_np = self._gather_z(z)
        u_np = unshard_feature_vector(
            np.asarray(u, np.float64), self.dim)[:, :self.nblocks]
        models = {
            _lambda_key(lam): LinearModel.from_dense(z_np[i], self.vocab)
            for i, lam in enumerate(self.lambdas)}
        return AdmmResult(
            models=models, best_model=best_model, best_lambda=best_lambda,
            best_loglik=best_loglik, iterations=iteration,
            sample_loglik_history=loglik_history, diff_history=diff_history,
            iter_times=iter_times, solver_stats=solver_stats,
            z=z_np, u=u_np, converged=converged,
            wall_time=time.monotonic() - t_start)
