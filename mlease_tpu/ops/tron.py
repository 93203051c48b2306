"""Batched trust-region Newton (TRON) solver with warm start.

This is the reference's inner solver — liblinear's TRON with LinkedIn's
warm-start modification (reference:
src/main/java/de/bwaldvogel/liblinear/Tron.java:30-124 for the outer
trust-region loop, :126-179 for the truncated conjugate-gradient `trcg`;
the "CHANGED BY bchen" block at :47-60 keeps the incoming w instead of
resetting to 0 and measures the relative-gradient stop against ||grad(0)||) —
re-designed for TPU execution:

  * the Newton and CG loops are `lax.while_loop`s with pure array state, so a
    single compiled program runs any number of iterations;
  * the whole solver is vmappable over a leading (lambda x block) problem
    axis; JAX's while-loop batching runs lanes in lock-step until every
    problem converges, which is exactly the masked batched solve the ADMM
    x-update needs (different blocks converge at different Newton/CG counts);
  * branchy scalar control flow (trust-region boundary handling, step
    accept/reject) becomes `jnp.where` selects on vector state.

Stopping mirrors the reference: ||g|| <= eps * ||grad(0)||, plus the guard
breaks at Tron.java:108-121 (f < -1e32, non-positive reductions, reductions
negligible relative to |f| — the 1e-12 relative threshold is scaled up for
float32).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mlease_tpu.ops import objective as obj

# Trust-region update constants (Tron.java:31-35)
ETA0, ETA1, ETA2 = 1e-4, 0.25, 0.75
SIGMA1, SIGMA2, SIGMA3 = 0.25, 0.5, 4.0


class TronResult(NamedTuple):
    w: jax.Array          # solution
    f: jax.Array          # final objective value
    gnorm: jax.Array      # final gradient norm
    iterations: jax.Array  # accepted Newton iterations
    cg_iterations: jax.Array  # total CG iterations
    converged: jax.Array  # reached ||g|| <= eps*||g0||


def _dot(a, b):
    return jnp.sum(a * b)


def _norm(a):
    return jnp.sqrt(jnp.sum(a * a))


def _trcg(prob: obj.LRProblem, D: jax.Array, g: jax.Array, delta: jax.Array,
          max_cg_iter: int):
    """Truncated CG: approximately solve H s = -g within ||s|| <= delta
    (Tron.java:126-179). Returns (s, r, cg_iters) with r the final residual."""
    dtype = g.dtype
    zero = jnp.zeros_like(g)
    cgtol = 0.1 * _norm(g)

    def cond(state):
        _s, _r, _d, _rTr, cg_iter, done = state
        return jnp.logical_and(~done, cg_iter < max_cg_iter)

    def body(state):
        s, r, d, rTr, cg_iter, done = state
        small = _norm(r) <= cgtol

        Hd = obj.hv(prob, D, d)
        dHd = _dot(d, Hd)
        # Guard: dHd <= 0 should not occur (H is PD) but protect the division.
        alpha = jnp.where(dHd > 0, rTr / jnp.where(dHd > 0, dHd, 1.0), 0.0)
        s_try = s + alpha * d
        boundary = _norm(s_try) > delta

        # Boundary case: pull back to s, then advance to the trust boundary
        # (Tron.java:146-162).
        std = _dot(s, d)
        sts = _dot(s, s)
        dtd = _dot(d, d)
        dsq = delta * delta
        rad = jnp.sqrt(jnp.maximum(std * std + dtd * (dsq - sts), 0.0))
        denom_pos = std + rad
        alpha_b = jnp.where(
            std >= 0,
            jnp.where(denom_pos != 0, (dsq - sts) / jnp.where(denom_pos != 0, denom_pos, 1.0), 0.0),
            jnp.where(dtd != 0, (rad - std) / jnp.where(dtd != 0, dtd, 1.0), 0.0),
        )

        s_bnd = s + alpha_b * d
        r_bnd = r - alpha_b * Hd

        # Interior case: normal CG update (Tron.java:163-172).
        r_int = r - alpha * Hd
        rTr_new = _dot(r_int, r_int)
        beta = jnp.where(rTr > 0, rTr_new / jnp.where(rTr > 0, rTr, 1.0), 0.0)
        d_int = r_int + beta * d

        step = jnp.logical_and(~small, ~done)
        take_bnd = jnp.logical_and(step, boundary)
        take_int = jnp.logical_and(step, ~boundary)

        s_out = jnp.where(take_bnd, s_bnd, jnp.where(take_int, s_try, s))
        r_out = jnp.where(take_bnd, r_bnd, jnp.where(take_int, r_int, r))
        d_out = jnp.where(take_int, d_int, d)
        rTr_out = jnp.where(take_int, rTr_new, rTr)
        cg_out = cg_iter + jnp.where(step, 1, 0)
        done_out = jnp.logical_or(done, jnp.logical_or(small, take_bnd))
        return (s_out, r_out, d_out, rTr_out, cg_out, done_out)

    init = (zero, -g, -g, _dot(g, g), jnp.asarray(0, jnp.int32),
            jnp.asarray(False))
    s, r, _d, _rTr, cg_iter, _done = jax.lax.while_loop(cond, body, init)
    return s, r, cg_iter


@partial(jax.jit, static_argnames=("max_iter", "max_cg_iter"))
def tron(prob: obj.LRProblem, w0: jax.Array, eps: jax.Array,
         max_iter: int = 1000, max_cg_iter: int = 500) -> TronResult:
    """Minimize the LR-with-prior objective from warm start w0.

    eps is the already class-balance-scaled tolerance (the caller applies
    eps * min(pos,neg)/l, reference LibLinear.java:309-313).
    """
    dtype = w0.dtype
    eps = jnp.asarray(eps, dtype)
    # Relative-gradient reference point: ||grad at 0|| (Tron.java:47-56).
    g0, _ = obj.grad_and_curvature(prob, jnp.zeros_like(w0))
    gnorm1 = _norm(g0)

    f = obj.fun(prob, w0)
    g, D = obj.grad_and_curvature(prob, w0)
    gnorm = _norm(g)
    delta = gnorm
    converged0 = gnorm <= eps * gnorm1

    # Relative-stall threshold: 1e-12 in the reference's float64
    # (Tron.java:117-120); loosened to ~1e-5 when solving in float32.
    stall_rtol = 1e-12 if dtype == jnp.float64 else 1e-5

    def cond(state):
        w, f, g, D, delta, gnorm, it, cg_total, active = state
        return jnp.logical_and(active, it <= max_iter)

    def body(state):
        w, f, g, D, delta, gnorm, it, cg_total, active = state

        s, r, cg_iter = _trcg(prob, D, g, delta, max_cg_iter)
        w_new = w + s
        gs = _dot(g, s)
        prered = -0.5 * (gs - _dot(s, r))
        fnew = obj.fun(prob, w_new)
        actred = f - fnew
        snorm = _norm(s)

        # First-iteration shrink of the initial step bound (Tron.java:79).
        delta = jnp.where(it == 1, jnp.minimum(delta, snorm), delta)

        denom = fnew - f - gs
        alpha = jnp.where(denom <= 0, SIGMA3,
                          jnp.maximum(SIGMA1, -0.5 * (gs / jnp.where(denom <= 0, 1.0, denom))))

        # Trust region radius update ladder (Tron.java:88-96).
        asn = alpha * snorm
        delta_new = jnp.where(
            actred < ETA0 * prered,
            jnp.minimum(jnp.maximum(alpha, SIGMA1) * snorm, SIGMA2 * delta),
            jnp.where(
                actred < ETA1 * prered,
                jnp.maximum(SIGMA1 * delta, jnp.minimum(asn, SIGMA2 * delta)),
                jnp.where(
                    actred < ETA2 * prered,
                    jnp.maximum(SIGMA1 * delta, jnp.minimum(asn, SIGMA3 * delta)),
                    jnp.maximum(delta, jnp.minimum(asn, SIGMA3 * delta)))))

        accept = actred > ETA0 * prered
        w_out = jnp.where(accept, w_new, w)
        f_out = jnp.where(accept, fnew, f)
        g_new, D_new = obj.grad_and_curvature(prob, w_out)
        g_out = jnp.where(accept, g_new, g)
        D_out = jnp.where(accept, D_new, D)
        gnorm_out = jnp.where(accept, _norm(g_new), gnorm)
        it_out = it + jnp.where(accept, 1, 0)

        # Stop conditions (Tron.java:103-121).
        done = jnp.logical_and(accept, gnorm_out <= eps * gnorm1)
        done = jnp.logical_or(done, f_out < -1.0e32)
        done = jnp.logical_or(done, jnp.logical_and(jnp.abs(actred) <= 0,
                                                    prered <= 0))
        done = jnp.logical_or(
            done,
            jnp.logical_and(jnp.abs(actred) <= stall_rtol * jnp.abs(f_out),
                            jnp.abs(prered) <= stall_rtol * jnp.abs(f_out)))

        return (w_out, f_out, g_out, D_out, delta_new, gnorm_out, it_out,
                cg_total + cg_iter, jnp.logical_and(active, ~done))

    init = (w0, f, g, D, delta, gnorm, jnp.asarray(1, jnp.int32),
            jnp.asarray(0, jnp.int32), ~converged0)
    w, f, g, D, delta, gnorm, it, cg_total, _active = jax.lax.while_loop(
        cond, body, init)

    return TronResult(w=w, f=f, gnorm=gnorm, iterations=it - 1,
                      cg_iterations=cg_total,
                      converged=gnorm <= eps * gnorm1)


def tron_batched(probs: obj.LRProblem, w0: jax.Array, eps: jax.Array,
                 max_iter: int = 1000, max_cg_iter: int = 500) -> TronResult:
    """vmap of `tron` over a leading problem axis shared by every array in
    `probs`, `w0` (B, n) and `eps` (B,)."""
    return jax.vmap(lambda p, w, e: tron(p, w, e, max_iter=max_iter,
                                         max_cg_iter=max_cg_iter))(probs, w0, eps)
