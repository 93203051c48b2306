"""Weighted logistic regression with a Gaussian prior — the x-update objective.

The math matches the reference objective exactly (reference:
src/main/java/com/linkedin/mlease/regression/liblinearfunc/LogisticRegressionL2.java:31-46):

    score_i(w) = w'x[i] + offset[i]
    loss(w)  = 1/2 * sum_k (w[k]-priorMean[k])^2 / priorVar[k]
             + sum_i weight[i] * log(1 + exp(-y[i] * score_i(w)))
    loss'(w) = (w-priorMean)/priorVar + sum_i weight[i]*(p_i - 1)*y_i*x[i]
    loss''(w)= diag(1/priorVar) + X' D X,  D_ii = weight[i]*p_i*(1-p_i)
    with p_i = sigmoid(y_i * score_i(w))

but on a padded ELL block layout (see mlease_tpu.core.dataset): the hot
Xv / X'v sparse matvecs (LogisticRegressionL2.java:115-150) become a gather +
row-reduction and a flat scatter-add, both of which XLA maps onto the TPU VPU;
padding slots carry value 0 and therefore contribute nothing to either pass.
Per-class weights Cp/Cn (LogisticRegressionL2.java:93-99) are folded into
`weight` at problem-construction time.

Everything here is shape-static, jit-safe and vmappable over a leading
(lambda x block) problem axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class LRProblem(NamedTuple):
    """One x-update problem over one padded data block.

    All arrays may carry leading batch dims when used under vmap.

    The optional csc_* arrays are the column-sorted dual layout of the same
    nonzeros: when present, X'v is computed as a gather + sorted segment-sum
    instead of a scatter-add — TPU scatter is several times slower than
    gather, so the dual layout trades 2x nonzero storage for the faster
    transpose pass (see SURVEY.md section 7 "sparse irregularity on TPU").
    """

    indices: jax.Array      # (R, K) int32 — vocab columns (tail-only in hybrid)
    values: jax.Array       # (R, K) — 0.0 on padding
    y: jax.Array            # (R,) — +1/-1 (+1 on padding rows)
    weight: jax.Array       # (R,) — Cp/Cn-folded instance weight, 0 on padding
    offset: jax.Array       # (R,)
    prior_mean: jax.Array   # (n,)
    prior_var_inv: jax.Array  # (n,)
    csc_cols: jax.Array | None = None   # (R*K,) int32 sorted ascending
    csc_rows: jax.Array | None = None   # (R*K,) int32 row of each nonzero
    csc_vals: jax.Array | None = None   # (R*K,)
    head_x: jax.Array | None = None     # (R, H) dense hot columns (MXU path)
    head_ids: jax.Array | None = None   # (H,) int32 vocab ids of head slots
    tail_rows: jax.Array | None = None  # (T,) int32 flat-COO tail (hybrid),
                                        # sorted ascending (row-major order)
    tail_cols: jax.Array | None = None  # (T,) int32
    tail_vals: jax.Array | None = None  # (T,)
    # column-sorted tail copy: X'v / diag(H) as sorted segment-sums
    tail_c_rows: jax.Array | None = None  # (T,) int32
    tail_c_cols: jax.Array | None = None  # (T,) int32 sorted ascending
    tail_c_vals: jax.Array | None = None  # (T,)

    @property
    def dim(self) -> int:
        return self.prior_mean.shape[-1]


def make_problem(block, prior_mean, prior_var_inv, *, positive_weight: float = 1.0,
                 dtype=None) -> LRProblem:
    """Build an LRProblem from a packed Block/BlockedData slice.

    positive_weight is the reference's Cp (LibLinear.java option
    `positive_weight`, applied in LogisticRegressionL2.java:93-99); Cn = 1.
    """
    values = jnp.asarray(block.values, dtype=dtype)
    dtype = values.dtype
    y = jnp.asarray(block.y, dtype=dtype)
    weight = jnp.asarray(block.weight, dtype=dtype)
    if positive_weight != 1.0:
        weight = jnp.where(y == 1, positive_weight * weight, weight)
    return LRProblem(
        indices=jnp.asarray(block.indices),
        values=values,
        y=y,
        weight=weight,
        offset=jnp.asarray(block.offset, dtype=dtype),
        prior_mean=jnp.asarray(prior_mean, dtype=dtype),
        prior_var_inv=jnp.asarray(prior_var_inv, dtype=dtype),
    )


# ---------------------------------------------------------------------------
# Sparse matvecs (the hot loops; reference Xv/XTv LogisticRegressionL2.java:115-150)
# ---------------------------------------------------------------------------

def xv(prob: LRProblem, v: jax.Array) -> jax.Array:
    """X @ v : (R,) scores.

    ELL path: gather + row reduction. Hybrid: one (R, H) @ (H,) MXU matvec
    over the hot head columns (the bulk of power-law nonzeros) plus a short
    flat-COO pass over the padding-free tail.
    """
    R = prob.y.shape[-1]
    if prob.indices.shape[-1] > 0:
        out = jnp.sum(prob.values * v[prob.indices], axis=-1)
    else:
        out = jnp.zeros(R, dtype=prob.values.dtype)
    if prob.head_x is not None:
        out = out + jnp.dot(prob.head_x, v[prob.head_ids],
                            precision=jax.lax.Precision.HIGHEST)
    if prob.tail_cols is not None:
        contrib = prob.tail_vals * v[prob.tail_cols]
        out = out + jax.ops.segment_sum(contrib, prob.tail_rows,
                                        num_segments=R,
                                        indices_are_sorted=True)
    return out


def xtv(prob: LRProblem, d: jax.Array) -> jax.Array:
    """X' @ d : (n,) accumulation.

    Default: flat scatter-add over nonzeros. With the CSC dual layout:
    gather d by row, segment-sum over the (sorted) column ids — no scatter.
    """
    if prob.csc_cols is not None:
        out = jax.ops.segment_sum(prob.csc_vals * d[prob.csc_rows],
                                  prob.csc_cols, num_segments=prob.dim,
                                  indices_are_sorted=True)
    elif prob.indices.shape[-1] > 0:
        contrib = (prob.values * d[:, None]).reshape(-1)
        flat_idx = prob.indices.reshape(-1)
        out = jnp.zeros(prob.dim,
                        dtype=prob.values.dtype).at[flat_idx].add(contrib)
    else:
        out = jnp.zeros(prob.dim, dtype=prob.values.dtype)
    if prob.head_x is not None:
        # (H,) head accumulation via one MXU matvec + an H-sized scatter
        out = out.at[prob.head_ids].add(
            jnp.dot(prob.head_x.T, d, precision=jax.lax.Precision.HIGHEST))
    if prob.tail_c_cols is not None:
        out = out + jax.ops.segment_sum(
            prob.tail_c_vals * d[prob.tail_c_rows], prob.tail_c_cols,
            num_segments=prob.dim, indices_are_sorted=True)
    elif prob.tail_cols is not None:
        out = out.at[prob.tail_cols].add(prob.tail_vals * d[prob.tail_rows])
    return out


def scores(prob: LRProblem, w: jax.Array) -> jax.Array:
    return xv(prob, w) + prob.offset


# ---------------------------------------------------------------------------
# Objective value / gradient / Hessian products
# ---------------------------------------------------------------------------

def fun(prob: LRProblem, w: jax.Array) -> jax.Array:
    """loss(w). Stable log1p(exp(-yz)) via logaddexp (the reference's two-branch
    form, LogisticRegressionL2.java:170-177)."""
    yz = prob.y * scores(prob, w)
    data_loss = jnp.sum(prob.weight * jnp.logaddexp(0.0, -yz))
    dw = w - prob.prior_mean
    prior_loss = 0.5 * jnp.sum(dw * dw * prob.prior_var_inv)
    return data_loss + prior_loss


def grad_and_curvature(prob: LRProblem, w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(gradient, D) where D_ii = weight_i * p_i * (1-p_i) is the IRLS
    curvature reused by Hessian-vector products (the reference caches D inside
    grad for the same reason, LogisticRegressionL2.java:199-225)."""
    yz = prob.y * scores(prob, w)
    p = jax.nn.sigmoid(yz)
    coeff = prob.weight * (p - 1.0) * prob.y
    g = xtv(prob, coeff) + (w - prob.prior_mean) * prob.prior_var_inv
    D = prob.weight * p * (1.0 - p)
    return g, D


def grad(prob: LRProblem, w: jax.Array) -> jax.Array:
    return grad_and_curvature(prob, w)[0]


def hv(prob: LRProblem, D: jax.Array, s: jax.Array) -> jax.Array:
    """(diag(1/priorVar) + X' D X) @ s — two sparse passes
    (LogisticRegressionL2.java:231-248)."""
    wa = D * xv(prob, s)
    return xtv(prob, wa) + s * prob.prior_var_inv


def hessian_diagonal(prob: LRProblem, w: jax.Array) -> jax.Array:
    """diag(H) = 1/priorVar + sum_i D_ii x_ik^2
    (LogisticRegressionL2.java:304-327) — the Laplace diagonal posterior
    variance is 1/this (LibLinear.java:330-333)."""
    yz = prob.y * scores(prob, w)
    p = jax.nn.sigmoid(yz)
    q = prob.weight * p * (1.0 - p)
    out = jnp.asarray(prob.prior_var_inv)
    if prob.indices.shape[-1] > 0:
        contrib = (prob.values * prob.values * q[:, None]).reshape(-1)
        flat_idx = prob.indices.reshape(-1)
        out = out + (jnp.zeros(prob.dim, dtype=prob.values.dtype)
                     .at[flat_idx].add(contrib))
    if prob.head_x is not None:
        out = out.at[prob.head_ids].add(
            jnp.dot((prob.head_x * prob.head_x).T, q,
                    precision=jax.lax.Precision.HIGHEST))
    if prob.tail_c_cols is not None:
        out = out + jax.ops.segment_sum(
            prob.tail_c_vals * prob.tail_c_vals * q[prob.tail_c_rows],
            prob.tail_c_cols, num_segments=prob.dim, indices_are_sorted=True)
    elif prob.tail_cols is not None:
        out = out.at[prob.tail_cols].add(
            prob.tail_vals * prob.tail_vals * q[prob.tail_rows])
    return out


def densify(prob: LRProblem) -> jax.Array:
    """Padded sparse rows -> dense (R, n) design matrix. Used by the per-item
    dense-Newton path where n is small; X'WX then rides the MXU."""
    R, K = prob.indices.shape
    X = jnp.zeros((R, prob.dim), dtype=prob.values.dtype)
    if K > 0:
        rows = jnp.broadcast_to(jnp.arange(R)[:, None], (R, K)).reshape(-1)
        X = X.at[rows, prob.indices.reshape(-1)].add(prob.values.reshape(-1))
    if prob.head_x is not None:
        X = X.at[:, prob.head_ids].add(prob.head_x)
    if prob.tail_cols is not None:
        X = X.at[prob.tail_rows, prob.tail_cols].add(prob.tail_vals)
    return X


def dense_hessian(prob: LRProblem, w: jax.Array) -> jax.Array:
    """Full H = diag(1/priorVar) + X' D X as a dense (n, n) matmul
    (reference: LogisticRegressionL2.hessian, LogisticRegressionL2.java:258-297).
    Only sensible for small n (per-item models); inverse(H) is the Laplace
    posterior covariance (LibLinear.java:317-327)."""
    X = densify(prob)
    yz = prob.y * scores(prob, w)
    p = jax.nn.sigmoid(yz)
    D = prob.weight * p * (1.0 - p)
    H = jnp.einsum("rm,r,rn->mn", X, D, X,
                   preferred_element_type=X.dtype,
                   precision=jax.lax.Precision.HIGHEST)
    return H + jnp.diag(prob.prior_var_inv)


# ---------------------------------------------------------------------------
# Class-balance tolerance scaling (host-side, static per dataset)
# ---------------------------------------------------------------------------

def class_balance_eps_scale(y: np.ndarray, nrows) -> np.ndarray:
    """eps_effective = eps * min(pos, neg) / l, per problem (reference:
    LibLinear.java:272-276,309-313). `y` is (..., R) padded labels and `nrows`
    the per-problem real row count; padding rows (index >= nrows) are excluded.
    Returns the min(pos,neg)/l factor (1.0 when a block is empty).
    """
    y = np.asarray(y)
    nrows = np.asarray(nrows)
    R = y.shape[-1]
    mask = np.arange(R) < nrows[..., None]
    pos = np.sum((y == 1) & mask, axis=-1)
    l = np.maximum(np.sum(mask, axis=-1), 1)
    neg = np.sum(mask, axis=-1) - pos
    scale = np.minimum(pos, neg) / l
    return np.where(np.sum(mask, axis=-1) > 0, scale, 1.0)
