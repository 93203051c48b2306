"""Consensus-ADMM trainer — the core of the framework.

TPU-native re-design of the reference's RegressionAdmmTrain (reference:
src/main/java/com/linkedin/mlease/regression/jobs/RegressionAdmmTrain.java:129-522).
Where the reference runs one Hadoop MapReduce job per ADMM iteration — mapper
fan-out x nlambdas, shuffle to (lambda, block) reducers each running a
liblinear TRON solve, then driver-side meanModel streaming + z/u updates and
HDFS/DistributedCache round-trips — here one jitted program performs the whole
iteration on-device:

  * the per-(lambda, block) x-update is a nested-vmap batched TRON solve:
    blocks are the inner vmap axis (shardable over a device mesh), lambdas the
    outer axis with in_axes=None on the data so the regularization path reuses
    the same HBM-resident data (no record fan-out as in AdmmMapper,
    RegressionAdmmTrain.java:553-568);
  * consensus xbar/ubar are means over the block axis — under a sharded mesh
    XLA lowers them to psum over ICI, replacing meanModel + DistributedCache
    (RegressionAdmmTrain.java:362-364);
  * the z-update (L2 shrink / L1 soft-threshold, per-feature lambda.map,
    unpenalized intercept) and dual update run replicated on-device;
  * features absent from a block are pinned exactly to their prior mean
    z - u_b via the block presence mask, matching LibLinear.java:373-397.

The Python driver loop only carries the scalar schedules (inner-eps decay, rho
adaptation), per-iteration sample loglik / best-model tracking, checkpointing
and the stopping rule — a handful of host scalars per iteration.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mlease_tpu.core.dataset import BlockedData, pack_rows
from mlease_tpu.core.linear_model import LinearModel
from mlease_tpu.ops import admm_math, objective as obj
from mlease_tpu.ops.tron import tron

logger = logging.getLogger(__name__)

MAX_NTEST_EVENTS = 1_000_000  # RegressionAdmmTrain.java:122


@dataclass
class AdmmConfig:
    """Mirrors the reference's job-file keys (README.md:179-205)."""

    lambdas: Sequence[float] = (1.0,)
    rhos: Sequence[float] | None = None            # "rho"
    num_iters: int = 10                            # "num.iters" (default 10, RegressionAdmmTrain.java:139)
    regularizer: int = 2                           # "regularizer" 1|2
    epsilon: float = 1e-4                          # "epsilon"
    liblinear_epsilon: float = 0.01                # "liblinear.epsilon" start value
    aggressive_liblinear_epsilon_decay: bool = False
    penalize_intercept: bool = False
    initialize_boost_rate: float = 0.0
    rho_adapt_coefficient: float = 0.0
    num_click_replicates: int = 1
    test_loglik_per_iter: bool = False
    lambda_map: Mapping[str, float] | None = None
    positive_weight: float = 1.0
    reference_l1_compat: bool = True  # reference-exact L1 band behavior by
                                      # default (RegressionAdmmTrain.java:420-437
                                      # leaves |v|<=t unchanged); False = the
                                      # textbook soft-threshold (exact zeros)
    relaxation: float = 1.0       # ADMM over-relaxation alpha (1.0 = reference)
    dual_layout: bool = False     # CSC gather-based X'v (2x nnz storage)
    head_size: int = 0            # dense-head hybrid: top-H hot columns ride
                                  # the MXU (see DESIGN.md section 3); 0 = off
    multi_rhs: bool = True        # solve the whole lambda path per data pass
                                  # (ops/tron_multi.py); False = vmapped lanes
    pcg: Any = True               # preconditioned CG in the multi-RHS solver
                                  # (not in the reference — same converged
                                  # solution; pcg=False for the reference-
                                  # exact CG trajectory): True/"jacobi" =
                                  # diagonal (12x fewer data passes on the
                                  # benchmark), "head_block" = exact dense-
                                  # head curvature block + Jacobi tail
                                  # (requires head_size > 0)
    head_dtype: Any = None        # storage dtype for the dense head (e.g.
                                  # jnp.bfloat16 halves its HBM traffic and
                                  # memory; accumulation stays f32)
    flat_blocks: bool = True      # fold the block axis into the coefficient
                                  # axis for the multi-RHS solve (measured
                                  # ~1.9x on batched gathers/segment-sums;
                                  # single-device only — the mesh path keeps
                                  # the batch axis). Joint per-λ trust
                                  # region: same converged consensus to
                                  # solver tolerance; False for the
                                  # lock-step per-block trajectory
    dtype: Any = jnp.float32
    max_newton_iter: int = 1000
    max_cg_iter: int = 500
    inner_eps_floor: float = 1e-5

    def resolved_rhos(self) -> list[float]:
        if self.rhos is not None:
            if len(self.rhos) != len(self.lambdas):
                raise ValueError(
                    "The number of rho's should be exactly the same as the "
                    "number of lambda's. OR: don't claim rho!")
            return [float(r) for r in self.rhos]
        return [admm_math.default_rho(l) for l in self.lambdas]


@dataclass
class AdmmResult:
    models: dict[str, LinearModel]                 # final z per lambda
    best_model: LinearModel | None
    best_lambda: str | None
    best_loglik: float
    iterations: int
    sample_loglik_history: list[dict]              # [{lambda, iter, testLoglik}]
    diff_history: list[dict[str, float]]
    z: np.ndarray                                  # (L, n) final consensus
    u: np.ndarray                                  # (L, B, n) final duals
    converged: bool
    wall_time: float = 0.0
    compile_time: float = 0.0   # run_fused: AOT compile, excluded from wall
    iter_times: list[float] = field(default_factory=list)  # seconds/iteration
    solver_stats: list[dict] = field(default_factory=list)  # per-iteration
    # {"newton_trips": int, "cg_trips": int} lock-step loop-trip maxima
    # (cost-model inputs for roofline accounting; see build_admm_step)


def _EPS_DTYPE():
    """float64 when x64 is enabled, float32 otherwise — the convergence
    epsilons are host-scalar bookkeeping, and requesting f64 outright
    trips a noisy truncation warning on default (x64-off) configs."""
    import jax.dtypes
    return jax.dtypes.canonicalize_dtype(jnp.float64)


def _lambda_key(lam: float) -> str:
    """Reference model keys are Java Float.toString of the (float) lambda
    ("1.0", "0.5", "1.0E-4", "1.2345678E7"): plain decimal for
    1e-3 <= |v| < 1e7, computerized scientific notation otherwise, always
    with at least one fractional digit (RegressionAdmmTrain.java:561 keys
    via String.valueOf(float)). Digits are the shortest float32 round-trip
    (Dragon4), matching modern Java; the reference-era FloatingDecimal
    differs only on a handful of pathological subnormals."""
    f = np.float32(lam)
    if np.isnan(f):
        return "NaN"
    if np.isinf(f):
        return "Infinity" if f > 0 else "-Infinity"
    sign = "-" if np.signbit(f) else ""
    if f == 0:
        return sign + "0.0"
    sci = np.format_float_scientific(abs(f), unique=True, trim="0")
    mant, _, exp_s = sci.partition("e")
    e = int(exp_s)
    digits = mant.replace(".", "").rstrip("0") or "0"
    if -3 <= e < 7:
        if e >= 0:
            ipart = digits[:e + 1].ljust(e + 1, "0")
            fpart = digits[e + 1:] or "0"
        else:
            ipart = "0"
            fpart = "0" * (-e - 1) + digits
        return f"{sign}{ipart}.{fpart}"
    fpart = digits[1:] or "0"
    return f"{sign}{digits[0]}.{fpart}E{e}"


def build_admm_step(nblocks: int, regularizer: int, intercept_index: int | None,
                    penalize_intercept: bool, reference_l1_compat: bool,
                    max_newton_iter: int, max_cg_iter: int,
                    relaxation: float = 1.0,
                    dual_layout: bool = False,
                    use_head: bool = False,
                    multi_rhs: bool = False,
                    pcg: bool = False,
                    flat_blocks: bool = False,
                    jit: bool = True) -> Callable:
    """Build the jitted one-iteration program.

    Inputs (all jax arrays):
      data: indices (B,R,K), values (B,R,K), y/weight/offset (B,R),
            present (B,n) bool; with dual_layout also csc (cols,rows,vals)
            each (B,R*K)
      z (L,n), u (L,B,n), lam_vec (L,n), rho_eff (L,), eps (B,)
    Returns (z_new, u_new, diffs (L,), stats) where stats maps
    "newton_trips"/"cg_trips" to per-problem lock-step loop-trip counters
    (the cost model bench.py's roofline accounting consumes — every trip is
    one full pass over the data for all lanes riding the batched loop).
    """

    solver = partial(tron, max_iter=max_newton_iter, max_cg_iter=max_cg_iter)

    def solve_one(indices, values, y, weight, offset, csc, head, prior_mean,
                  prior_var_inv, w0, eps):
        cols, rows, vals = csc if dual_layout else (None, None, None)
        (head_x, head_ids, t_rows, t_cols, t_vals,
         tc_rows, tc_cols, tc_vals) = head
        prob = obj.LRProblem(indices=indices, values=values, y=y,
                             weight=weight, offset=offset,
                             prior_mean=prior_mean,
                             prior_var_inv=prior_var_inv,
                             csc_cols=cols, csc_rows=rows, csc_vals=vals,
                             head_x=head_x, head_ids=head_ids,
                             tail_rows=t_rows, tail_cols=t_cols,
                             tail_vals=t_vals, tail_c_rows=tc_rows,
                             tail_c_cols=tc_cols, tail_c_vals=tc_vals)
        res = solver(prob, w0, eps)
        return res.w, res.iterations, res.cg_iterations

    # inner vmap over blocks: data + prior_mean + eps batched, w0/prior_var
    # shared; outer vmap over lambdas: data shared (no duplication in HBM),
    # prior_mean/prior_var/w0 batched.
    csc_inner = (0, 0, 0) if dual_layout else None
    csc_outer = (None, None, None) if dual_layout else None
    head_inner = (0, None, 0, 0, 0, 0, 0, 0) if use_head else None
    solve_blocks = jax.vmap(solve_one,
                            in_axes=(0, 0, 0, 0, 0, csc_inner, head_inner,
                                     0, None, None, 0))
    solve_grid = jax.vmap(solve_blocks,
                          in_axes=(None, None, None, None, None, csc_outer,
                                   None, 0, 0, 0, None))

    if flat_blocks and not multi_rhs:
        raise ValueError("flat_blocks requires multi_rhs")
    if multi_rhs:
        if dual_layout:
            raise ValueError("multi_rhs and dual_layout are exclusive")
        from mlease_tpu.ops.tron_multi import MultiProblem, tron_multi

        def solve_block_multi(indices, values, y, weight, offset, head,
                              prior_mean_T, prior_var_inv_T, W0, eps):
            (head_x, head_ids, t_rows, t_cols, t_vals,
             tc_rows, tc_cols, tc_vals) = head
            prob = MultiProblem(indices=indices, values=values, y=y,
                                weight=weight, offset=offset,
                                prior_mean=prior_mean_T,
                                prior_var_inv=prior_var_inv_T,
                                head_x=head_x, head_ids=head_ids,
                                tail_rows=t_rows, tail_cols=t_cols,
                                tail_vals=t_vals, tail_c_rows=tc_rows,
                                tail_c_cols=tc_cols, tail_c_vals=tc_vals)
            res = tron_multi(prob, W0, eps, max_iter=max_newton_iter,
                             max_cg_iter=max_cg_iter, precondition=pcg)
            return res.w, res.newton_trips, res.cg_trips

        solve_multi = jax.vmap(solve_block_multi,
                               in_axes=(0, 0, 0, 0, 0, head_inner,
                                        0, None, None, 0))

        from mlease_tpu.ops.tron_multi import stack_blocks

        def solve_flat(indices, values, y, weight, offset, head,
                       prior_mean, z, rho_eff, eps):
            """All B blocks as ONE stacked (B*n, L) problem with offset
            column ids (ops/tron_multi.py stack_blocks). XLA's batched
            gathers/segment-sums measure ~1.9x slower than their flat
            equivalents (tools/pass_microbench.py tail_b4_vmapped vs
            tail_flat), so the block axis folds into the coefficient axis;
            only the dense head keeps its batch axis (MXU batched matmul).
            Semantics: same minimizer (the joint objective is
            block-separable), but the trust region/CG/stop rule run jointly
            per λ lane and the STRICTEST per-block eps scale applies to
            every block — the converged consensus matches the vmapped path
            to solver tolerance, not bitwise (flat_blocks=False for the
            lock-step per-block trajectory)."""
            B = indices.shape[0]
            L, n = z.shape
            prob = stack_blocks(indices, values, y, weight, offset, head,
                                prior_mean, rho_eff)
            res = tron_multi(prob, jnp.tile(z.T, (B, 1)), jnp.min(eps),
                             max_iter=max_newton_iter,
                             max_cg_iter=max_cg_iter, precondition=pcg)
            x = res.w.reshape(B, n, L).transpose(2, 0, 1)      # (L, B, n)
            return x, res.newton_trips, res.cg_trips

    def step(indices, values, y, weight, offset, csc, head, present,
             block_valid, z, u, lam_vec, rho_eff, rho_base, eps):
        # rho_eff (boost/decay-adapted) shapes only the x-subproblem prior
        # variance (the reducer's rho*adaptRate, RegressionAdmmTrain.java:648-658);
        # the consensus z-update always uses the base rho
        # (RegressionAdmmTrain.java:368-380 reads the unadapted lambdaRho map).
        dtype = z.dtype
        L, n = z.shape
        prior_mean = z[:, None, :] - u                      # (L,B,n) = z - u_b
        prior_var_inv = (rho_eff[:, None]
                         * jnp.ones((1, n), dtype))          # priorVar = 1/rho
        if multi_rhs and flat_blocks:
            # block axis folded into the coefficient axis: one un-batched
            # solve over the stacked (B*n, L) slab (see solve_flat)
            x, nt, cg = solve_flat(indices, values, y, weight, offset, head,
                                   prior_mean, z, rho_eff, eps)
        elif multi_rhs:
            # lambda path as trailing column axis: one data pass serves all
            # lambdas (see ops/tron_multi.py)
            x_T, nt, cg = solve_multi(indices, values, y, weight, offset, head,
                                      prior_mean.transpose(1, 2, 0),  # (B,n,L)
                                      prior_var_inv.T, z.T, eps)
            x = x_T.transpose(2, 0, 1)                         # (L,B,n)
        else:
            x, nt, cg = solve_grid(indices, values, y, weight, offset, csc,
                                   head, prior_mean, prior_var_inv, z,
                                   eps)                        # (L,B,n)
        stats = {"newton_trips": nt, "cg_trips": cg}
        # absent-feature exactness: features with no data in block b solve to
        # the prior mean z - u_b (LibLinear.java:373-397)
        x = jnp.where(present[None, :, :], x, prior_mean)
        if relaxation != 1.0:
            # over-relaxation x_hat = alpha*x + (1-alpha)*z (Boyd et al. 2011
            # section 3.4.3) — an acceleration the reference does not have;
            # disabled (alpha=1) by default for exact reference semantics.
            x = relaxation * x + (1.0 - relaxation) * z[:, None, :]

        # consensus means over real blocks only (mesh-padding blocks masked);
        # on a sharded mesh these are the psum collectives replacing meanModel
        # (RegressionAdmmTrain.java:362-364)
        bv = block_valid[None, :, None]
        xbar = jnp.sum(x * bv, axis=1) / nblocks             # (L,n)
        ubar = jnp.sum(u * bv, axis=1) / nblocks
        v = xbar + ubar

        def zup(v_l, lam_l, rho_l):
            if regularizer == 2:
                return admm_math.z_update_l2(
                    v_l, lam_l, rho_l, nblocks, intercept_index,
                    penalize_intercept)
            return admm_math.z_update_l1(
                v_l, lam_l, rho_l, nblocks, intercept_index,
                penalize_intercept, reference_compat=reference_l1_compat)

        z_new = jax.vmap(zup)(v, lam_vec, rho_base)
        u_new = admm_math.u_update(u, x, z_new[:, None, :]) * bv
        diffs = admm_math.max_abs_diff(z_new, z, axis=-1)     # (L,)
        return z_new, u_new, diffs, stats

    return jax.jit(step, donate_argnums=(10,)) if jit else step


def build_loglik_fn() -> Callable:
    """Jitted per-lambda mean weighted test loglik of consensus models z.

    Matches the reference's driver-side sample testloglik
    (RegressionAdmmTrain.java:766-811): sum_i w_i * -log1p(exp(-+xbeta)) / sum_i w_i.
    """

    def loglik(indices, values, y, weight, offset, z):
        def one(z_l):
            scores = jnp.sum(values * z_l[indices], axis=-1) + offset
            ll = -jnp.logaddexp(0.0, -y * scores) * weight
            return jnp.sum(ll) / jnp.sum(weight)
        return jax.vmap(one)(z)

    return jax.jit(loglik)


class AdmmTrainer:
    def __init__(self, data: BlockedData, vocab, config: AdmmConfig,
                 test_rows: Sequence[Mapping] | None = None, mesh=None):
        self.vocab = vocab
        self.config = config
        self.mesh = mesh
        self.nblocks = data.nblocks  # real block count (consensus divisor)
        dtype = config.dtype

        if config.head_size > 0 and data.head is None:
            from mlease_tpu.core.dataset import to_hybrid
            data = to_hybrid(data, config.head_size)

        block_valid = np.ones(data.nblocks, dtype=np.float64)
        if mesh is not None:
            from mlease_tpu.parallel.mesh import pad_blocks
            data, block_valid = pad_blocks(data, mesh.devices.size)
        self.data = data
        self.dim = data.dim
        self.lambdas = [float(l) for l in config.lambdas]
        self.rhos = config.resolved_rhos()

        # device arrays --------------------------------------------------
        # Under a mesh, sources stay NUMPY so shard_blocked_arrays /
        # device_put place them straight into their sharded layout: a
        # single-device jnp.asarray first would make device_put re-shard
        # FROM a device array — a `_value` fetch that doubles the transfer
        # and can deadlock flakily against the multi-virtual-device CPU
        # client's dispatch queue (observed: dryrun_multichip(16) hangs in
        # shard_device_array on a 2-core host).
        xp = np if mesh is not None else jnp

        def arr(a, t=None):
            return xp.asarray(a) if t is None else xp.asarray(a, t)

        indices = arr(data.indices)
        values = arr(data.values, dtype)
        y = arr(data.y, dtype)
        weight = arr(data.weight, dtype)
        if config.positive_weight != 1.0:
            weight = xp.where(y == 1, config.positive_weight * weight, weight)
        offset = arr(data.offset, dtype)
        present = arr(data.present)
        block_valid = arr(block_valid, dtype)

        # per-block class-balance tolerance factors (LibLinear.java:309-313)
        eps_scale = arr(
            obj.class_balance_eps_scale(data.y, data.nrows), dtype)

        # optional column-sorted dual layout (gather-based X'v)
        csc = (None, None, None)
        if config.dual_layout:
            from mlease_tpu.core.dataset import csc_arrays
            cc, cr, cv = csc_arrays(data)
            csc = (arr(cc), arr(cr), arr(cv, dtype))

        # optional dense-head hybrid (dense head + flat-COO tail, both
        # row-sorted and column-sorted tail copies)
        head = (None,) * 8
        if data.head is not None:
            head_dtype = (config.head_dtype if config.head_dtype is not None
                          else dtype)
            head = (arr(data.head, head_dtype),
                    arr(data.head_ids),
                    arr(data.tail_rows),
                    arr(data.tail_cols),
                    arr(data.tail_vals, dtype),
                    arr(data.tail_c_rows),
                    arr(data.tail_c_cols),
                    arr(data.tail_c_vals, dtype))

        if mesh is not None:
            from mlease_tpu.parallel.mesh import shard_blocked_arrays, block_sharding
            sharded = shard_blocked_arrays(mesh, {
                "indices": indices, "values": values, "y": y,
                "weight": weight, "offset": offset, "present": present,
                "eps": eps_scale, "block_valid": block_valid})
            indices, values, y = sharded["indices"], sharded["values"], sharded["y"]
            weight, offset = sharded["weight"], sharded["offset"]
            present, eps_scale = sharded["present"], sharded["eps"]
            block_valid = sharded["block_valid"]
            if config.dual_layout:
                sh = block_sharding(mesh, 0)
                csc = tuple(jax.device_put(a, sh) for a in csc)
            if head[0] is not None:
                from mlease_tpu.parallel.mesh import replicated
                bsh = block_sharding(mesh, 0)
                head = tuple(
                    jax.device_put(h, replicated(mesh) if i == 1 else bsh)
                    for i, h in enumerate(head))
        self.indices, self.values, self.y = indices, values, y
        self.weight, self.offset, self.present = weight, offset, present
        self.eps_scale, self.block_valid = eps_scale, block_valid
        self.csc = csc
        self.head = head

        # per-feature lambda vectors (lambda.map)
        lam_vecs = np.stack([
            admm_math.per_feature_lambda(l, self.dim, config.lambda_map,
                                         vocab, dtype=np.float64)
            for l in self.lambdas])
        self.lam_vec = jnp.asarray(lam_vecs, dtype)

        self.step = build_admm_step(
            nblocks=self.nblocks,
            regularizer=config.regularizer,
            intercept_index=vocab.intercept_index,
            penalize_intercept=config.penalize_intercept,
            reference_l1_compat=config.reference_l1_compat,
            max_newton_iter=config.max_newton_iter,
            max_cg_iter=config.max_cg_iter,
            relaxation=config.relaxation,
            dual_layout=config.dual_layout,
            use_head=data.head is not None,
            multi_rhs=config.multi_rhs and not config.dual_layout,
            pcg=config.pcg,
            flat_blocks=self._use_flat(),
        )

        # sample-test loglik arrays (first MAX_NTEST_EVENTS rows)
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
    def _use_flat(self) -> bool:
        """Flat-blocks applies on single-device multi-RHS solves only: the
        sharded mesh path needs the batch axis to shard over, and
        head_block preconditioning needs per-block (R,H) heads."""
        cfg = self.config
        return (bool(cfg.flat_blocks) and self.mesh is None
                and cfg.multi_rhs and not cfg.dual_layout
                and cfg.pcg != "head_block"
                # stacked column AND row ids live in int32
                and self.data.nblocks * self.dim < 2**31
                and self.data.nblocks * self.data.padded_rows < 2**31)

    # ------------------------------------------------------------------
    def sample_loglik(self, z) -> np.ndarray:
        idx, val, y, w, off = self.test_arrays
        return np.asarray(self.loglik_fn(idx, val, y, w, off, z))

    # ------------------------------------------------------------------
    def run_fused(self, z0: np.ndarray | None = None, *,
                  checkpoint_every: int | None = None,
                  callback: Callable | None = None) -> AdmmResult:
        """The whole ADMM driver loop as on-device lax.while_loop chunks.

        The reference's driver round-trips to HDFS/the cluster every
        iteration; the host-loop `run()` below round-trips to the device
        every iteration (a ~24 ms dispatch+fetch tax per iteration on a
        tunneled chip). Here the inner-eps ladder, rho boost/adapt schedule,
        stopping rule (RegressionAdmmTrain.java:281-497), per-iteration
        sample loglik and best-model tracking (:766-845) all run on-device.
        Semantics match run() exactly (same schedules, same stop rule).

        checkpoint_every=None runs the whole training as ONE dispatch and
        ONE fetch. checkpoint_every=C pauses every C iterations to fire
        `callback(iteration=, z=, u=, diffs=, inner_eps=, logliks=)` (the
        run() callback contract, once per chunk with the latest state) —
        per-chunk checkpointing at 1/C of the host round-trip tax.
        """
        cfg = self.config
        L, n = len(self.lambdas), self.dim
        dtype = cfg.dtype
        if cfg.regularizer not in (1, 2):
            raise ValueError("Only L1 and L2 regularization supported!")
        max_it = cfg.num_iters
        aggressive = bool(cfg.aggressive_liblinear_epsilon_decay)
        boost = float(cfg.initialize_boost_rate if z0 is not None else 0.0)
        adapt = float(cfg.rho_adapt_coefficient)
        track_ll = (self.test_arrays is not None
                    and cfg.test_loglik_per_iter)

        if not hasattr(self, "_step_raw"):
            self._step_raw = build_admm_step(
                nblocks=self.nblocks, regularizer=cfg.regularizer,
                intercept_index=self.vocab.intercept_index,
                penalize_intercept=cfg.penalize_intercept,
                reference_l1_compat=cfg.reference_l1_compat,
                max_newton_iter=cfg.max_newton_iter,
                max_cg_iter=cfg.max_cg_iter,
                relaxation=cfg.relaxation,
                dual_layout=cfg.dual_layout,
                use_head=self.data.head is not None,
                multi_rhs=cfg.multi_rhs and not cfg.dual_layout,
                pcg=cfg.pcg, flat_blocks=self._use_flat(), jit=False)
        step_raw = self._step_raw

        rho_base = jnp.asarray(self.rhos, dtype)
        NEG = jnp.asarray(-9999999.0, dtype)
        # per-iteration rho_eff schedule, precomputed host-side via the
        # same admm_math.rho_effective the non-fused driver loop calls
        # (row i = iteration i; row 0 aliases iteration 1, never hit)
        rho_tab = None
        if boost > 0 or adapt > 0:
            rho_tab = jnp.asarray(
                [[admm_math.rho_effective(
                    r, max(i, 1), initialize_boost_rate=boost,
                    rho_adapt_coefficient=adapt) for r in self.rhos]
                 for i in range(max_it + 1)], dtype)

        # the dataset rides as jit OPERANDS, not closure captures: closing
        # over device arrays bakes them into the program as constants (at
        # 1M-row shapes >2 GB of literals — slow lowering, bloated
        # executables, and the persistent compile cache keys on them)
        ops = (self.indices, self.values, self.y, self.weight, self.offset,
               self.csc, self.head, self.present, self.block_valid,
               self.lam_vec, self.eps_scale, rho_base,
               self.test_arrays if track_ll else None)

        @partial(jax.jit, donate_argnums=(0,))
        def fused(state, ops):
            (indices, values, y, weight, offset, csc, head, present,
             block_valid, lam_vec, eps_scale, rho_b, test_arrays) = ops

            def loglik_dev(z):
                idx, val, yv, wv, off = test_arrays
                def one(z_l):
                    s = jnp.sum(val * z_l[idx], axis=-1) + off
                    ll = -jnp.logaddexp(0.0, -yv * s) * wv
                    return jnp.sum(ll) / jnp.sum(wv)
                return jax.vmap(one)(z)

            def body(state):
                (z, u, inner_eps, mindiff, it, done, chunk_end, diffs_h,
                 ll_h, best_ll, best_z, best_lam, best_it, nt_tot,
                 cg_tot) = state
                if aggressive:
                    inner_eps = jnp.where(it > 5, inner_eps / 10.0, inner_eps)
                else:
                    inner_eps = jnp.where((it > 1) & (mindiff < 1e-3),
                                          inner_eps / 10.0, inner_eps)
                if boost > 0 or adapt > 0:
                    # precomputed host-side schedule, gathered by iteration:
                    # the in-loop exp() variant of this program reproducibly
                    # faulted the TPU worker at the 1M-row shape (round-5
                    # conv sweep — three crashes, exp-free variants fine at
                    # the identical shape); the table is also exact in f64
                    # where the on-device f32 exp was not
                    rho_eff = rho_tab[jnp.minimum(it, max_it)]
                else:
                    rho_eff = rho_b      # byte-identical default program
                eps = inner_eps * eps_scale

                z, u, diffs, stats = step_raw(
                    indices, values, y, weight, offset, csc, head, present,
                    block_valid, z, u, lam_vec, rho_eff, rho_b, eps)
                mindiff = jnp.min(diffs).astype(_EPS_DTYPE())
                maxdiff = jnp.max(diffs)
                diffs_h = diffs_h.at[it].set(diffs)
                nt_tot += jnp.max(stats["newton_trips"])
                cg_tot += jnp.max(stats["cg_trips"])

                if track_ll:
                    ll = loglik_dev(z)
                    ll_h = ll_h.at[it].set(ll)
                    bi = jnp.argmax(ll).astype(jnp.int32)
                    better = ll[bi] > best_ll
                    best_ll = jnp.where(better, ll[bi], best_ll)
                    best_z = jnp.where(better, z[bi], best_z)
                    best_lam = jnp.where(better, bi, best_lam)
                    best_it = jnp.where(better, it, best_it)

                done = (maxdiff < cfg.epsilon) & (inner_eps
                                                  <= cfg.inner_eps_floor)
                return (z, u, inner_eps, mindiff, it + 1, done, chunk_end,
                        diffs_h, ll_h,
                        best_ll, best_z, best_lam, best_it, nt_tot, cg_tot)

            def cond(state):
                it, done, chunk_end = state[4], state[5], state[6]
                return (it <= jnp.minimum(chunk_end, max_it)) & ~done

            return jax.lax.while_loop(cond, body, state)

        z = (jnp.zeros((L, n), dtype) if z0 is None
             else jnp.asarray(np.broadcast_to(z0, (L, n)), dtype))
        u = jnp.zeros((L, self.data.nblocks, n), dtype)
        if self.mesh is not None:
            from mlease_tpu.parallel.mesh import block_sharding, replicated
            z = jax.device_put(z, replicated(self.mesh))
            u = jax.device_put(u, block_sharding(self.mesh, 1))

        chunk = (max_it if checkpoint_every is None
                 else max(int(checkpoint_every), 1))
        state = (z, u,
                 jnp.asarray(cfg.liblinear_epsilon, _EPS_DTYPE()),
                 jnp.asarray(99999999.0, _EPS_DTYPE()),
                 jnp.asarray(1, jnp.int32), jnp.asarray(False),
                 jnp.asarray(chunk, jnp.int32),
                 jnp.full((max_it + 1, L), jnp.nan, dtype),
                 jnp.full((max_it + 1, L), jnp.nan, dtype),
                 NEG, jnp.zeros(n, dtype), jnp.asarray(0, jnp.int32),
                 jnp.asarray(0, jnp.int32),
                 jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))

        t_compile = time.monotonic()
        compiled = fused.lower(state, ops).compile()
        compile_time = time.monotonic() - t_compile
        t_start = time.monotonic()
        seen_ll_iters = 0
        while True:
            state = compiled(state, ops)
            it_now = int(np.asarray(state[4]))
            done_now = bool(np.asarray(state[5]))
            if callback is not None:
                diffs_chunk = np.asarray(state[7], np.float64)
                logliks = None
                if track_ll:
                    ll_chunk = np.asarray(state[8], np.float64)
                    logliks = [
                        {"lambda": _lambda_key(lam), "iter": i,
                         "testLoglik": float(ll)}
                        for i in range(seen_ll_iters + 1, it_now)
                        for lam, ll in zip(self.lambdas, ll_chunk[i])]
                    seen_ll_iters = it_now - 1
                callback(iteration=it_now - 1, z=state[0], u=state[1],
                         diffs=diffs_chunk[it_now - 1],
                         inner_eps=float(np.asarray(state[2])),
                         logliks=logliks)
            if done_now or it_now > max_it:
                break
            # next chunk: bump the device-side chunk bound
            state = tuple(
                jnp.asarray(min(it_now + chunk - 1, max_it), jnp.int32)
                if i == 6 else s for i, s in enumerate(state))
        (z, u, inner_eps, mindiff, it, done, _ce, diffs_h, ll_h, best_ll,
         best_z, best_lam, best_it, nt_tot, cg_tot) = state
        diffs_np = np.asarray(diffs_h, np.float64)   # host sync
        wall = time.monotonic() - t_start
        iterations = int(it) - 1
        converged = bool(done)

        ll_np = np.asarray(ll_h, np.float64)
        loglik_history = []
        if z0 is not None and track_ll:
            for lam, ll in zip(self.lambdas,
                               self.sample_loglik(
                                   jnp.asarray(np.broadcast_to(
                                       z0, (L, n)), dtype))):
                loglik_history.append({"lambda": _lambda_key(lam), "iter": 0,
                                       "testLoglik": float(ll)})
        diff_history = []
        for i in range(1, iterations + 1):
            diff_history.append({_lambda_key(lam): float(d) for lam, d
                                 in zip(self.lambdas, diffs_np[i])})
            if track_ll:
                for lam, ll in zip(self.lambdas, ll_np[i]):
                    loglik_history.append({"lambda": _lambda_key(lam),
                                           "iter": i,
                                           "testLoglik": float(ll)})
        best_model = None
        best_lambda = None
        best_loglik = float(np.asarray(best_ll))
        if track_ll and best_loglik > -9999998.0:
            best_model = LinearModel.from_dense(
                np.asarray(best_z, np.float64), self.vocab)
            best_lambda = _lambda_key(self.lambdas[int(best_lam)])
        else:
            best_loglik = -9999999.0

        z_np = np.asarray(z, np.float64)
        models = {
            _lambda_key(lam): LinearModel.from_dense(z_np[i], self.vocab)
            for i, lam in enumerate(self.lambdas)}
        return AdmmResult(
            models=models, best_model=best_model, best_lambda=best_lambda,
            best_loglik=best_loglik, iterations=iterations,
            sample_loglik_history=loglik_history, diff_history=diff_history,
            iter_times=[wall / max(iterations, 1)] * iterations,
            solver_stats=[{"newton_trips": int(nt_tot),
                           "cg_trips": int(cg_tot)}],
            z=z_np, u=np.asarray(u, np.float64)[:, :self.nblocks],
            converged=converged, wall_time=wall, compile_time=compile_time)

    # ------------------------------------------------------------------
    def run(self, z0: np.ndarray | None = None,
            u0: np.ndarray | None = None, *, start_iteration: int = 1,
            inner_eps0: float | None = None, mindiff0: float = 99999999.0,
            best_loglik0: float = -9999999.0,
            callback: Callable | None = None) -> AdmmResult:
        """Run the driver loop.

        z0/u0/start_iteration/inner_eps0/mindiff0/best_loglik0 resume from a
        checkpoint (mlease_tpu.utils.checkpoint) — the analogue of restarting
        from the reference's iter-i/ HDFS state.
        """
        cfg = self.config
        L, n = len(self.lambdas), self.dim
        dtype = cfg.dtype
        if cfg.regularizer not in (1, 2):
            raise ValueError("Only L1 and L2 regularization supported!")

        # NUMPY sources under a mesh — device_put from a single-device jax
        # array re-shards through a `_value` fetch that can deadlock against
        # the multi-virtual-device CPU client (see __init__'s note)
        xp = np if self.mesh is not None else jnp
        z = (xp.zeros((L, n), dtype) if z0 is None
             else xp.asarray(np.broadcast_to(z0, (L, n)), dtype))
        if u0 is None:
            u = xp.zeros((L, self.data.nblocks, n), dtype)
        else:
            u_np = np.zeros((L, self.data.nblocks, n), dtype)
            u_np[:, :u0.shape[1], :] = np.asarray(u0, dtype)
            u = u_np if self.mesh is not None else jnp.asarray(u_np, dtype)
        if self.mesh is not None:
            from mlease_tpu.parallel.mesh import block_sharding, replicated
            z = jax.device_put(z, replicated(self.mesh))
            u = jax.device_put(u, block_sharding(self.mesh, 1))
        else:
            z, u = jnp.asarray(z, dtype), jnp.asarray(u, dtype)

        inner_eps = (cfg.liblinear_epsilon if inner_eps0 is None
                     else float(inner_eps0))
        mindiff = mindiff0
        best_loglik = best_loglik0
        best_model: LinearModel | None = None
        best_lambda: str | None = None
        loglik_history: list[dict] = []
        diff_history: list[dict[str, float]] = []
        iter_times: list[float] = []
        solver_stats: list[dict] = []
        converged = False
        t_start = time.monotonic()

        # iteration-0 loglik when warm-started (RegressionAdmmTrain.java:277-280)
        if z0 is not None and self.test_arrays is not None and cfg.test_loglik_per_iter:
            for lam, ll in zip(self.lambdas, self.sample_loglik(z)):
                loglik_history.append({"lambda": _lambda_key(lam), "iter": 0,
                                       "testLoglik": float(ll)})

        iteration = start_iteration - 1
        for iteration in range(start_iteration, cfg.num_iters + 1):
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
            rho_base = jnp.asarray(self.rhos, dtype)
            eps = inner_eps * self.eps_scale

            z, u, diffs, stats = self.step(
                self.indices, self.values, self.y,
                self.weight, self.offset, self.csc,
                self.head, self.present,
                self.block_valid, z, u,
                self.lam_vec, rho_eff, rho_base, eps)
            diffs_np = np.asarray(diffs, np.float64)  # also a host sync point
            iter_times.append(time.monotonic() - t_iter)
            solver_stats.append({
                "newton_trips": int(np.asarray(stats["newton_trips"]).max()),
                "cg_trips": int(np.asarray(stats["cg_trips"]).max())})
            mindiff = float(diffs_np.min())
            maxdiff = float(diffs_np.max())
            diff_history.append({_lambda_key(l): float(d)
                                 for l, d in zip(self.lambdas, diffs_np)})
            logger.info("iter %d: inner_eps=%g maxdiff=%g mindiff=%g (%.2fs)",
                        iteration, inner_eps, maxdiff, mindiff,
                        iter_times[-1])

            iter_logliks = None
            if self.test_arrays is not None and cfg.test_loglik_per_iter:
                lls = self.sample_loglik(z)
                iter_logliks = []
                for li, (lam, ll) in enumerate(zip(self.lambdas, lls)):
                    ll = float(ll)
                    entry = {"lambda": _lambda_key(lam), "iter": iteration,
                             "testLoglik": ll}
                    loglik_history.append(entry)
                    iter_logliks.append(entry)
                    # best-model tracking (RegressionAdmmTrain.java:812-845)
                    if ll > best_loglik:
                        best_loglik = ll
                        best_lambda = _lambda_key(lam)
                        best_model = LinearModel.from_dense(
                            np.asarray(z[li], np.float64), self.vocab)

            if callback is not None:
                callback(iteration=iteration, z=z, u=u, diffs=diffs_np,
                         inner_eps=inner_eps, logliks=iter_logliks)

            if admm_math.should_stop(maxdiff, inner_eps, cfg.epsilon,
                                     cfg.inner_eps_floor):
                converged = True
                break

        z_np = np.asarray(z, np.float64)
        models = {
            _lambda_key(lam): LinearModel.from_dense(z_np[i], self.vocab)
            for i, lam in enumerate(self.lambdas)}
        return AdmmResult(
            models=models, best_model=best_model, best_lambda=best_lambda,
            best_loglik=best_loglik, iterations=iteration,
            sample_loglik_history=loglik_history, diff_history=diff_history,
            iter_times=iter_times, solver_stats=solver_stats,
            z=z_np, u=np.asarray(u, np.float64)[:, :self.nblocks],
            converged=converged, wall_time=time.monotonic() - t_start)
