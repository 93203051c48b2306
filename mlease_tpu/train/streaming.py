"""Streaming ADMM for datasets larger than device memory.

The reference streams each reducer's partition from disk per iteration
(Hadoop re-reads everything every MapReduce round). Here the steady-state
fast path keeps all blocks HBM-resident (mlease_tpu.train.admm); this module
is the >HBM mode: blocks live in host RAM as packed groups, and each ADMM
iteration runs

  phase 1: for each group g: transfer -> batched TRON x-update -> partial
           consensus sums (x_g kept on host for the dual update)
  phase 2: z-update from the accumulated xbar/ubar (host, O(L*n))
  phase 3: u_g += x_g - z per group (host numpy)

Per-iteration host<->device traffic is the data groups themselves — the same
volume per iteration the reference reads from HDFS, but over PCIe. The
consensus math is shared bit-for-bit with the in-memory trainer
(mlease_tpu.ops.admm_math), and results match it exactly (see
tests/test_streaming.py).
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mlease_tpu.core.dataset import BlockedData
from mlease_tpu.core.linear_model import LinearModel
from mlease_tpu.ops import admm_math, objective as obj
from mlease_tpu.ops.tron import tron
from mlease_tpu.train.admm import AdmmConfig, AdmmResult, _lambda_key

logger = logging.getLogger(__name__)


def build_group_solver(max_newton_iter: int, max_cg_iter: int,
                       use_head: bool = False, multi_rhs: bool = False,
                       pcg: bool = False):
    """Jitted (lambda x block) x-update for one data group (no consensus)."""
    solver = partial(tron, max_iter=max_newton_iter, max_cg_iter=max_cg_iter)

    def solve_one(indices, values, y, weight, offset, head, prior_mean,
                  prior_var_inv, w0, eps):
        head_x, head_ids, t_rows, t_cols, t_vals = head
        prob = obj.LRProblem(indices=indices, values=values, y=y,
                             weight=weight, offset=offset,
                             prior_mean=prior_mean,
                             prior_var_inv=prior_var_inv,
                             head_x=head_x, head_ids=head_ids,
                             tail_rows=t_rows, tail_cols=t_cols,
                             tail_vals=t_vals)
        return solver(prob, w0, eps).w

    head_inner = (0, None, 0, 0, 0) if use_head else None
    solve_blocks = jax.vmap(solve_one,
                            in_axes=(0, 0, 0, 0, 0, head_inner, 0, None,
                                     None, 0))
    solve_grid = jax.vmap(solve_blocks,
                          in_axes=(None, None, None, None, None, None,
                                   0, 0, 0, None))

    if multi_rhs:
        from mlease_tpu.ops.tron_multi import MultiProblem, tron_multi

        def solve_block_multi(indices, values, y, weight, offset, head,
                              prior_mean_T, prior_var_inv_T, W0, eps):
            head_x, head_ids, t_rows, t_cols, t_vals = head
            prob = MultiProblem(indices=indices, values=values, y=y,
                                weight=weight, offset=offset,
                                prior_mean=prior_mean_T,
                                prior_var_inv=prior_var_inv_T,
                                head_x=head_x, head_ids=head_ids,
                                tail_rows=t_rows, tail_cols=t_cols,
                                tail_vals=t_vals)
            return tron_multi(prob, W0, eps, max_iter=max_newton_iter,
                              max_cg_iter=max_cg_iter, precondition=pcg).w

        solve_multi = jax.vmap(solve_block_multi,
                               in_axes=(0, 0, 0, 0, 0, head_inner,
                                        0, None, None, 0))

    def run(indices, values, y, weight, offset, head, present, z, u,
            rho_eff, eps):
        dtype = z.dtype
        L, n = z.shape
        prior_mean = z[:, None, :] - u
        prior_var_inv = rho_eff[:, None] * jnp.ones((1, n), dtype)
        if multi_rhs:
            x_T = solve_multi(indices, values, y, weight, offset, head,
                              prior_mean.transpose(1, 2, 0),
                              prior_var_inv.T, z.T, eps)
            x = x_T.transpose(2, 0, 1)
        else:
            x = solve_grid(indices, values, y, weight, offset, head,
                           prior_mean, prior_var_inv, z, eps)
        x = jnp.where(present[None, :, :], x, prior_mean)
        return x

    return jax.jit(run)


class StreamingAdmmTrainer:
    """ADMM over a list of host-resident block groups.

    groups: list of BlockedData whose block counts sum to the logical
    num.blocks. Groups may have different padded shapes (each gets its own
    compiled solver specialization).
    """

    def __init__(self, groups: Sequence[BlockedData], vocab,
                 config: AdmmConfig):
        if config.dual_layout:
            raise NotImplementedError("dual layout in streaming mode")
        if config.head_size > 0:
            from mlease_tpu.core.dataset import to_hybrid
            groups = [to_hybrid(g, config.head_size) if g.head is None else g
                      for g in groups]
        self.groups = list(groups)
        self.vocab = vocab
        self.config = config
        self.nblocks = sum(g.nblocks for g in self.groups)
        self.dim = self.groups[0].dim
        self.lambdas = [float(l) for l in config.lambdas]
        self.rhos = config.resolved_rhos()
        self.use_head = self.groups[0].head is not None
        self.solver = build_group_solver(
            config.max_newton_iter, config.max_cg_iter,
            use_head=self.use_head,
            multi_rhs=config.multi_rhs, pcg=config.pcg)
        self.eps_scales = [obj.class_balance_eps_scale(g.y, g.nrows)
                           for g in self.groups]
        self.lam_vec = np.stack([
            admm_math.per_feature_lambda(l, self.dim, config.lambda_map,
                                         vocab)
            for l in self.lambdas])

    def run(self) -> AdmmResult:
        cfg = self.config
        dtype = cfg.dtype
        L, n, N = len(self.lambdas), self.dim, self.nblocks
        if cfg.regularizer not in (1, 2):
            raise ValueError("Only L1 and L2 regularization supported!")

        z = np.zeros((L, n))
        u_groups = [np.zeros((L, g.nblocks, n)) for g in self.groups]
        inner_eps = cfg.liblinear_epsilon
        mindiff = 99999999.0
        diff_history: list[dict] = []
        converged = False
        t_start = time.monotonic()
        iteration = 0

        for iteration in range(1, cfg.num_iters + 1):
            inner_eps = admm_math.inner_eps_schedule(
                inner_eps, iteration, mindiff,
                aggressive=cfg.aggressive_liblinear_epsilon_decay)
            rho_eff = jnp.asarray([
                admm_math.rho_effective(
                    r, iteration,
                    rho_adapt_coefficient=cfg.rho_adapt_coefficient)
                for r in self.rhos], dtype)
            z_dev = jnp.asarray(z, dtype)

            xsum = np.zeros((L, n))
            usum = np.zeros((L, n))
            x_groups = []
            for g, u_g, scale in zip(self.groups, u_groups, self.eps_scales):
                head = (None, None, None, None, None)
                if self.use_head:
                    head = (jnp.asarray(g.head, dtype),
                            jnp.asarray(g.head_ids),
                            jnp.asarray(g.tail_rows),
                            jnp.asarray(g.tail_cols),
                            jnp.asarray(g.tail_vals, dtype))
                x = self.solver(jnp.asarray(g.indices),
                                jnp.asarray(g.values, dtype),
                                jnp.asarray(g.y, dtype),
                                jnp.asarray(g.weight, dtype),
                                jnp.asarray(g.offset, dtype),
                                head,
                                jnp.asarray(g.present),
                                z_dev, jnp.asarray(u_g, dtype), rho_eff,
                                jnp.asarray(inner_eps * scale, dtype))
                x = np.asarray(x, np.float64)
                x_groups.append(x)
                xsum += x.sum(axis=1)
                usum += u_g.sum(axis=1)

            v = (xsum + usum) / N
            z_new = np.empty_like(z)
            for i, lam in enumerate(self.lambdas):
                v_i = jnp.asarray(v[i])
                lam_i = jnp.asarray(self.lam_vec[i])
                # consensus shrinkage uses the BASE rho; adaptation only
                # shapes the x-subproblem (RegressionAdmmTrain.java:368-380
                # vs :648-658)
                if cfg.regularizer == 2:
                    z_i = admm_math.z_update_l2(
                        v_i, lam_i, self.rhos[i], N,
                        self.vocab.intercept_index, cfg.penalize_intercept)
                else:
                    z_i = admm_math.z_update_l1(
                        v_i, lam_i, self.rhos[i], N,
                        self.vocab.intercept_index, cfg.penalize_intercept,
                        reference_compat=cfg.reference_l1_compat)
                z_new[i] = np.asarray(z_i)

            for x, u_g in zip(x_groups, u_groups):
                u_g += x - z_new[:, None, :]

            diffs = np.abs(z_new - z).max(axis=1)
            mindiff = float(diffs.min())
            maxdiff = float(diffs.max())
            diff_history.append({_lambda_key(l): float(d)
                                 for l, d in zip(self.lambdas, diffs)})
            z = z_new
            logger.info("stream iter %d: maxdiff=%g", iteration, maxdiff)
            if admm_math.should_stop(maxdiff, inner_eps, cfg.epsilon,
                                     cfg.inner_eps_floor):
                converged = True
                break

        models = {_lambda_key(l): LinearModel.from_dense(z[i], self.vocab)
                  for i, l in enumerate(self.lambdas)}
        u_full = np.concatenate(u_groups, axis=1)
        return AdmmResult(models=models, best_model=None, best_lambda=None,
                          best_loglik=-9999999.0, iterations=iteration,
                          sample_loglik_history=[],
                          diff_history=diff_history, z=z, u=u_full,
                          converged=converged,
                          wall_time=time.monotonic() - t_start)
