"""Dense Newton-Cholesky solver: the MXU path for small-dimension problems.

The per-item trainer fits thousands of tiny LRs; for those, forming the full
weighted Gram H = X' D X + diag(P) and solving the Newton system directly by
Cholesky is the speed-of-light TPU path (MXU matmuls + batched factorization)
— exactly the "X'WX + Cholesky" step named in BASELINE.md, and the same
Hessian the reference hands to commons-math CholeskyDecomposition for the
posterior covariance (reference: LibLinear.java:317-327). Armijo backtracking
keeps global convergence on the convex objective; the stop rule mirrors TRON's
relative-gradient criterion (Tron.java:56-60) so results are interchangeable
with the CG path.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mlease_tpu.ops import objective as obj


class NewtonResult(NamedTuple):
    w: jax.Array
    f: jax.Array
    gnorm: jax.Array
    iterations: jax.Array
    converged: jax.Array


def _norm(a):
    return jnp.sqrt(jnp.sum(a * a))


@partial(jax.jit, static_argnames=("max_iter", "max_backtracks"))
def newton_cholesky(prob: obj.LRProblem, w0: jax.Array, eps: jax.Array,
                    max_iter: int = 50,
                    max_backtracks: int = 30) -> NewtonResult:
    """Minimize the LR objective by damped Newton with dense Cholesky solves.

    Same objective/stop semantics as mlease_tpu.ops.tron.tron; intended for
    problems whose dense dimension fits comfortably on chip (per-item models).
    """
    dtype = w0.dtype
    eps = jnp.asarray(eps, dtype)
    X = obj.densify(prob)

    g0 = obj.grad(prob, jnp.zeros_like(w0))
    gnorm1 = _norm(g0)

    def fun(w):
        return obj.fun(prob, w)

    f = fun(w0)
    g, _D = obj.grad_and_curvature(prob, w0)
    gnorm = _norm(g)

    def cond(state):
        w, f, g, gnorm, it, active = state
        return jnp.logical_and(active, it < max_iter)

    def body(state):
        w, f, g, gnorm, it, active = state
        yz = prob.y * (jnp.dot(X, w, precision=jax.lax.Precision.HIGHEST)
                       + prob.offset)
        p = jax.nn.sigmoid(yz)
        D = prob.weight * p * (1.0 - p)
        H = (jnp.dot(X.T * D, X, precision=jax.lax.Precision.HIGHEST)
             + jnp.diag(prob.prior_var_inv))
        L = jnp.linalg.cholesky(H.astype(jnp.float32)).astype(dtype)
        s = jax.scipy.linalg.cho_solve((L, True), -g)
        gs = jnp.sum(g * s)

        # Armijo backtracking: halve t until sufficient decrease
        def bt_body(carry):
            t, fn, k = carry
            t = t * 0.5
            return t, fun(w + t * s), k + 1

        def bt_cond(carry):
            t, fn, k = carry
            return jnp.logical_and(fn > f + 1e-4 * t * gs,
                                   k < max_backtracks)

        t, fnew, _k = jax.lax.while_loop(
            bt_cond, bt_body, (jnp.asarray(2.0, dtype), jnp.inf, 0))

        improved = fnew < f
        w_new = jnp.where(improved, w + t * s, w)
        f_new = jnp.where(improved, fnew, f)
        g_new, _ = obj.grad_and_curvature(prob, w_new)
        gnorm_new = _norm(g_new)
        done = jnp.logical_or(gnorm_new <= eps * gnorm1, ~improved)
        return (w_new, f_new, g_new, gnorm_new, it + 1,
                jnp.logical_and(active, ~done))

    active0 = gnorm > eps * gnorm1
    w, f, g, gnorm, it, _ = jax.lax.while_loop(
        cond, body, (w0, f, g, gnorm, jnp.asarray(0, jnp.int32), active0))
    return NewtonResult(w=w, f=f, gnorm=gnorm, iterations=it,
                        converged=gnorm <= eps * gnorm1)
