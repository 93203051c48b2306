"""Multi-RHS TRON: the whole lambda-path solved in one pass over the data.

The plain solver (mlease_tpu.ops.tron) vmaps over lambdas, which makes every
lambda lane re-read the data per Hv product (batched (L,R,H)@(L,H,1) matvecs,
L separate gathers). Since TPU sparse passes are bandwidth/gather-bound
(DESIGN.md section 3), this module rewrites the same algorithm with the
lambda path as a *trailing column axis*: coefficients are (n, L), the dense
head contributes via one (R,H)@(H,L) MXU matmul, and every gather of the
sparse tail fetches an L-wide row — one pass over the data serves all
lambdas.

Algorithmically identical to the reference TRON (Tron.java:30-179 with the
warm-start modification) run independently per lambda lane: all trust-region
scalars (f, delta, ||g||, accept/reject) are (L,) vectors with masked
updates, exactly the lock-step execution jax's while-loop batching would
produce — but with the data-efficient memory layout.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mlease_tpu.ops.segsum import (segment_offsets, sorted_segment_sum_2level,
                                   sorted_segment_sum_2level_lanes)
from mlease_tpu.ops.tron import ETA0, ETA1, ETA2, SIGMA1, SIGMA2, SIGMA3


# Minimum stream length for the boundary-diff reduce. TPU scatter-add's
# per-entry cost is SHAPE-DEPENDENT: ~60 ns/entry at 9.3M-entry production
# streams (tools/tail_locality_result.json — the 19x regime) but only a
# few ns/entry at the 128K default-bench tails, where the prefix+boundary
# machinery costs MORE than the scatter it replaces (measured: default
# bench 15.3 -> 10.4 iter/s when applied unconditionally). Shapes are
# static under jit, so the gate resolves at trace time.
BOUNDARY_DIFF_MIN_ENTRIES = 1 << 20


def _use_bd(offsets, n_entries: int) -> bool:
    return offsets is not None and n_entries >= BOUNDARY_DIFF_MIN_ENTRIES


def _tail_reduce(contrib, ids, offsets, num_segments):
    """Sorted-stream segment reduce for the tail passes: boundary-diffed
    two-level prefix on large streams when the problem carries an offset
    table (scatter-free, MXU prefix — ops/segsum.py), else XLA's
    scatter-lowered segment_sum."""
    if _use_bd(offsets, contrib.shape[0]):
        return sorted_segment_sum_2level(contrib, offsets)
    return jax.ops.segment_sum(contrib, ids, num_segments=num_segments,
                               indices_are_sorted=True)


class MultiProblem(NamedTuple):
    """One data block, L simultaneous lambda-problems (trailing axis L).

    Flat-blocks form (train/admm.py flat_blocks): B blocks stack into ONE
    problem — rows concatenate to R = B*Rb, the coefficient slab stacks to
    n = B*nb with every sparse column id offset by b*nb, and ONLY the dense
    head keeps a batch axis (head_x (B, Rb, H), head_ids (B*H,) flat ids)
    because a block-diagonal matmul would waste the MXU. Measured on-chip:
    XLA's batched gathers/segment-sums cost ~1.9x their flat equivalents
    (tools/pass_microbench.py tail_b4_vmapped vs tail_flat), so flattening
    the block axis is the single biggest per-iteration win."""

    indices: jax.Array        # (R, K) int32 (may be K=0 in hybrid mode)
    values: jax.Array         # (R, K)
    y: jax.Array              # (R,)
    weight: jax.Array         # (R,)
    offset: jax.Array         # (R,)
    prior_mean: jax.Array     # (n, L)
    prior_var_inv: jax.Array  # (n, L)
    head_x: jax.Array | None = None     # (R, H) | (B, Rb, H) flat-blocks
    head_ids: jax.Array | None = None   # (H,)   | (B*H,)     flat-blocks
    tail_rows: jax.Array | None = None  # (T,) sorted ascending (row-major)
    tail_cols: jax.Array | None = None  # (T,)
    tail_vals: jax.Array | None = None  # (T,)
    # column-sorted copy: X'v / diag(H) tails as sorted segment-sums
    tail_c_rows: jax.Array | None = None  # (T,)
    tail_c_cols: jax.Array | None = None  # (T,) sorted ascending
    tail_c_vals: jax.Array | None = None  # (T,)
    # segment boundary tables (ops/segsum.py): when present, tail reduces
    # run as two-level-prefix boundary diffs instead of scatter-lowered
    # segment_sum — measured 62 -> ~? ns/entry at production widths
    # (tools/segsum_probe.py). Loop-invariant; stack_blocks derives them.
    tail_row_offsets: jax.Array | None = None  # (R+1,) into tail_rows
    tail_col_offsets: jax.Array | None = None  # (n+1,) into tail_c_cols

    @property
    def dim(self) -> int:
        return self.prior_mean.shape[0]

    @property
    def n_rhs(self) -> int:
        return self.prior_mean.shape[1]


def stack_blocks(indices, values, y, weight, offset, head,
                 prior_mean, rho_eff) -> "MultiProblem":
    """Fold B batched blocks into ONE flat MultiProblem (flat-blocks form).

    Shared by the flat_blocks paths of train/admm.py and train/streaming.py
    — the block-offset id construction and its sortedness invariants live
    here once. indices/values are (B, R, K); y/weight/offset (B, R); `head`
    the 8-tuple of hybrid arrays (all (B, ...) or None); prior_mean
    (L, B, n); rho_eff (L,) is the per-lane scalar Gaussian-prior precision.
    Per-block sorted tails stay globally sorted because block-major offsets
    are monotone. Callers must ensure B*n and B*R fit int32."""
    (head_x, head_ids, t_rows, t_cols, t_vals,
     tc_rows, tc_cols, tc_vals) = head
    B, R, K = indices.shape
    L, _, n = prior_mean.shape
    dtype = values.dtype
    boffs_n = jnp.arange(B, dtype=jnp.int32)[:, None] * n
    kw = {}
    if head_x is not None:
        boffs_r = jnp.arange(B, dtype=jnp.int32)[:, None] * R
        kw = dict(
            head_x=head_x,
            head_ids=(head_ids[None, :] + boffs_n).reshape(-1),
            tail_rows=(t_rows + boffs_r).reshape(-1),
            tail_cols=(t_cols + boffs_n).reshape(-1),
            tail_vals=t_vals.reshape(-1),
            tail_c_rows=(tc_rows + boffs_r).reshape(-1),
            tail_c_cols=(tc_cols + boffs_n).reshape(-1),
            tail_c_vals=tc_vals.reshape(-1))
        # boundary tables for the scatter-free tail reduces; inside a
        # trace these are loop-invariant (XLA hoists them out of the
        # solver's while loops — same mechanism as ROADMAP 4c). Skipped
        # below the boundary-diff gate: small streams keep the scatter
        # path, so the searchsorted would be dead work.
        if kw["tail_vals"].shape[0] >= BOUNDARY_DIFF_MIN_ENTRIES:
            kw["tail_row_offsets"] = segment_offsets(kw["tail_rows"], B * R)
            kw["tail_col_offsets"] = segment_offsets(kw["tail_c_cols"], B * n)
    return MultiProblem(
        indices=(indices + boffs_n[..., None]).reshape(B * R, K),
        values=values.reshape(B * R, K),
        y=y.reshape(-1), weight=weight.reshape(-1),
        offset=offset.reshape(-1),
        prior_mean=prior_mean.transpose(1, 2, 0).reshape(B * n, L),
        prior_var_inv=jnp.ones((B * n, 1), dtype) * rho_eff[None, :],
        **kw)


def _psum(x: jax.Array, axis_name: str | None) -> jax.Array:
    """Feature-model-parallel hook: when the problem's coefficient axis is
    sharded over a mesh axis (each device holds a column shard with local
    ids — see core/feature_shard.py), row-space partials are summed over it;
    axis_name=None is the single-shard identity."""
    return x if axis_name is None else jax.lax.psum(x, axis_name)


def xv(prob: MultiProblem, V: jax.Array,
       axis_name: str | None = None) -> jax.Array:
    """(n, L) -> (R, L) scores for all lambda lanes in one data pass.

    Under feature sharding each device computes the partial scores of its
    columns; the psum over `axis_name` assembles full rows (the only
    collective in the matvec pair — X'v is column-local)."""
    R = prob.y.shape[0]
    L = V.shape[1]
    if prob.indices.shape[-1] > 0:
        out = jnp.sum(prob.values[..., None] * V[prob.indices], axis=1)
    else:
        out = jnp.zeros((R, L), dtype=V.dtype)
    if prob.head_x is not None:
        # HIGHEST: TPU f32 matmul defaults to one bf16 pass (~3 digits);
        # 3-pass costs only MXU cycles while the op stays bandwidth-bound
        hw = V[prob.head_ids]
        if prob.head_x.ndim == 3:      # flat-blocks: batched head matmul
            B, Rb, H = prob.head_x.shape
            out = out + jnp.einsum(
                "brh,bhl->brl", prob.head_x, hw.reshape(B, H, L),
                preferred_element_type=V.dtype,
                precision=jax.lax.Precision.HIGHEST).reshape(R, L)
        else:
            out = out + jnp.dot(prob.head_x, hw,
                                preferred_element_type=V.dtype,
                                precision=jax.lax.Precision.HIGHEST)
    if prob.tail_cols is not None:
        contrib = prob.tail_vals[:, None] * V[prob.tail_cols]
        # tail_rows are row-major sorted: scatter-free boundary-diff reduce
        out = out + _tail_reduce(contrib, prob.tail_rows,
                                 prob.tail_row_offsets, R)
    return _psum(out, axis_name)


def xtv(prob: MultiProblem, Dm: jax.Array) -> jax.Array:
    """(R, L) -> (n, L) accumulation for all lanes in one pass."""
    n, L = prob.prior_mean.shape
    out = jnp.zeros((n, L), dtype=Dm.dtype)
    if prob.indices.shape[-1] > 0:
        contrib = (prob.values[..., None] * Dm[:, None, :]).reshape(-1, L)
        out = out.at[prob.indices.reshape(-1)].add(contrib)
    if prob.head_x is not None:
        if prob.head_x.ndim == 3:      # flat-blocks: batched head
            B, Rb, H = prob.head_x.shape
            contrib = jnp.einsum(
                "brh,brl->bhl", prob.head_x, Dm.reshape(B, Rb, L),
                preferred_element_type=Dm.dtype,
                precision=jax.lax.Precision.HIGHEST)
            out = out.at[prob.head_ids].add(contrib.reshape(B * H, L))
        else:
            out = out.at[prob.head_ids].add(
                jnp.dot(prob.head_x.T, Dm, preferred_element_type=Dm.dtype,
                        precision=jax.lax.Precision.HIGHEST))
    if prob.tail_c_cols is not None:
        out = out + _tail_reduce(
            prob.tail_c_vals[:, None] * Dm[prob.tail_c_rows],
            prob.tail_c_cols, prob.tail_col_offsets, n)
    elif prob.tail_cols is not None:
        out = out.at[prob.tail_cols].add(
            prob.tail_vals[:, None] * Dm[prob.tail_rows])
    return out


def scores(prob: MultiProblem, W: jax.Array,
           axis_name: str | None = None) -> jax.Array:
    return xv(prob, W, axis_name) + prob.offset[:, None]


def fun(prob: MultiProblem, W: jax.Array,
        axis_name: str | None = None) -> jax.Array:
    """(L,) objective values.

    Sharded: the data loss is a row-space sum of already-assembled scores
    (identical on every shard), only the prior term reduces over the sharded
    feature axis."""
    yz = prob.y[:, None] * scores(prob, W, axis_name)
    data_loss = jnp.sum(prob.weight[:, None] * jnp.logaddexp(0.0, -yz),
                        axis=0)
    dw = W - prob.prior_mean
    prior = 0.5 * jnp.sum(dw * dw * prob.prior_var_inv, axis=0)
    return data_loss + _psum(prior, axis_name)


def grad_and_curvature(prob: MultiProblem, W: jax.Array,
                       axis_name: str | None = None):
    yz = prob.y[:, None] * scores(prob, W, axis_name)
    p = jax.nn.sigmoid(yz)
    coeff = prob.weight[:, None] * (p - 1.0) * prob.y[:, None]
    G = xtv(prob, coeff) + (W - prob.prior_mean) * prob.prior_var_inv
    Dm = prob.weight[:, None] * p * (1.0 - p)
    return G, Dm


def xtv_and_sqdiag(prob: MultiProblem, C: jax.Array, Dm: jax.Array):
    """(X'C, (X∘X)'Dm) in ONE combined scatter over an (n, 2L) slab.

    The gradient accumulation and the Jacobi hessian-diagonal visit the same
    nonzeros; concatenating their per-nonzero contributions lane-wise lets a
    single scatter/segment-sum read indices+values (and gather the row pair)
    once instead of twice — per-lane sums are bitwise those of xtv() and the
    data part of hessian_diagonal()."""
    n, L = prob.prior_mean.shape
    out = jnp.zeros((n, 2 * L), dtype=C.dtype)
    if prob.indices.shape[-1] > 0:
        v = prob.values[..., None]
        contrib = jnp.concatenate(
            [v * C[:, None, :], (v * v) * Dm[:, None, :]],
            axis=-1).reshape(-1, 2 * L)
        out = out.at[prob.indices.reshape(-1)].add(contrib)
    if prob.head_x is not None:
        if prob.head_x.ndim == 3:      # flat-blocks: batched head
            B, Rb, H = prob.head_x.shape
            gh = jnp.einsum("brh,brl->bhl", prob.head_x,
                            C.reshape(B, Rb, L),
                            preferred_element_type=C.dtype,
                            precision=jax.lax.Precision.HIGHEST)
            dh = jnp.einsum("brh,brl->bhl",
                            prob.head_x * prob.head_x,
                            Dm.reshape(B, Rb, L),
                            preferred_element_type=Dm.dtype,
                            precision=jax.lax.Precision.HIGHEST)
            out = out.at[prob.head_ids].add(
                jnp.concatenate([gh, dh], axis=-1).reshape(B * H, 2 * L))
        else:
            gh = jnp.dot(prob.head_x.T, C, preferred_element_type=C.dtype,
                         precision=jax.lax.Precision.HIGHEST)
            dh = jnp.dot((prob.head_x * prob.head_x).T, Dm,
                         preferred_element_type=Dm.dtype,
                         precision=jax.lax.Precision.HIGHEST)
            out = out.at[prob.head_ids].add(
                jnp.concatenate([gh, dh], axis=-1))
    if prob.tail_c_cols is not None:
        rows = jnp.concatenate([C, Dm], axis=-1)[prob.tail_c_rows]  # 1 gather
        tv = prob.tail_c_vals[:, None]
        contrib = jnp.concatenate([tv * rows[:, :L],
                                   (tv * tv) * rows[:, L:]], axis=-1)
        out = out + _tail_reduce(contrib, prob.tail_c_cols,
                                 prob.tail_col_offsets, n)
    elif prob.tail_cols is not None:
        rows = jnp.concatenate([C, Dm], axis=-1)[prob.tail_rows]
        tv = prob.tail_vals[:, None]
        out = out.at[prob.tail_cols].add(
            jnp.concatenate([tv * rows[:, :L], (tv * tv) * rows[:, L:]],
                            axis=-1))
    return out[:, :L], out[:, L:]


def fun_grad_curvature(prob: MultiProblem, W: jax.Array,
                       with_diag: bool = False,
                       axis_name: str | None = None):
    """Objective + gradient + curvature sharing ONE scores pass.

    fun() and grad_and_curvature() each run a full Xv pass over the block's
    data to form the same scores; the TRON Newton body needs all three
    quantities at the same W, so computing them together saves one Xv data
    pass per Newton trip (the workload is bandwidth-bound — DESIGN.md §3).
    Exactly equal to (fun(prob, W), *grad_and_curvature(prob, W)).

    with_diag=True additionally returns the Jacobi hessian diagonal, riding
    the gradient's scatter via xtv_and_sqdiag (equal to
    hessian_diagonal(prob, Dm)) — the whole Newton-trip state refresh in
    ~2 effective data passes."""
    yz = prob.y[:, None] * scores(prob, W, axis_name)
    dw = W - prob.prior_mean
    F = (jnp.sum(prob.weight[:, None] * jnp.logaddexp(0.0, -yz), axis=0)
         + _psum(0.5 * jnp.sum(dw * dw * prob.prior_var_inv, axis=0),
                 axis_name))
    p = jax.nn.sigmoid(yz)
    coeff = prob.weight[:, None] * (p - 1.0) * prob.y[:, None]
    Dm = prob.weight[:, None] * p * (1.0 - p)
    if with_diag:
        Gd, Hd = xtv_and_sqdiag(prob, coeff, Dm)
        return (F, Gd + dw * prob.prior_var_inv, Dm,
                Hd + prob.prior_var_inv)
    G = xtv(prob, coeff) + dw * prob.prior_var_inv
    return F, G, Dm


def grad_norm_at_zero(prob: MultiProblem, n_rhs: int,
                      axis_name: str | None = None) -> jax.Array:
    """||grad at W=0|| per lane — the reference stop rule's gnorm1
    (Tron.java:48-54) in ONE data pass: Xv(0) == 0 exactly, so the scores
    are just the offsets and the Xv gather pass is skipped."""
    yz = prob.y[:, None] * jnp.broadcast_to(
        prob.offset[:, None], (prob.y.shape[0], n_rhs)).astype(
            prob.prior_mean.dtype)
    p = jax.nn.sigmoid(yz)
    coeff = prob.weight[:, None] * (p - 1.0) * prob.y[:, None]
    G0 = xtv(prob, coeff) - prob.prior_mean * prob.prior_var_inv
    return _norm(G0, axis_name)


def hv(prob: MultiProblem, Dm: jax.Array, S: jax.Array,
       axis_name: str | None = None) -> jax.Array:
    return xtv(prob, Dm * xv(prob, S, axis_name)) + S * prob.prior_var_inv


def hessian_diagonal(prob: MultiProblem, Dm: jax.Array) -> jax.Array:
    """diag(H) per lane: prior_var_inv + sum_i D_i x_i^2 — the Jacobi
    preconditioner (one extra data pass per Newton step)."""
    n, L = prob.prior_mean.shape
    out = jnp.asarray(prob.prior_var_inv)
    if prob.indices.shape[-1] > 0:
        sq = prob.values * prob.values
        contrib = (sq[..., None] * Dm[:, None, :]).reshape(-1, L)
        out = out + (jnp.zeros((n, L), Dm.dtype)
                     .at[prob.indices.reshape(-1)].add(contrib))
    if prob.head_x is not None:
        hx2 = prob.head_x * prob.head_x
        if prob.head_x.ndim == 3:      # flat-blocks: batched head
            B, Rb, H = prob.head_x.shape
            contrib = jnp.einsum(
                "brh,brl->bhl", hx2, Dm.reshape(B, Rb, L),
                preferred_element_type=Dm.dtype,
                precision=jax.lax.Precision.HIGHEST)
            out = out.at[prob.head_ids].add(contrib.reshape(B * H, L))
        else:
            out = out.at[prob.head_ids].add(
                jnp.dot(hx2.T, Dm,
                        preferred_element_type=Dm.dtype,
                        precision=jax.lax.Precision.HIGHEST))
    if prob.tail_c_cols is not None:
        tv = prob.tail_c_vals[:, None]
        out = out + _tail_reduce(
            tv * tv * Dm[prob.tail_c_rows], prob.tail_c_cols,
            prob.tail_col_offsets, n)
    elif prob.tail_cols is not None:
        out = out.at[prob.tail_cols].add(
            prob.tail_vals[:, None] * prob.tail_vals[:, None]
            * Dm[prob.tail_rows])
    return out


# ---------------------------------------------------------------------------
# Lanes-major internals (round-3 layout fix)
#
# The solver STATE (W, G, CG's s/r/z/d, the Jacobi M) used to live lanes-
# minor, (n, L) with L≈3: TPU HBM tiling T(8,128) pads the minor dim to 128
# lanes, so every state op moved ~42x its useful bytes. A device profile of
# the production iteration showed those loop fusions running at ~20 GB/s
# USEFUL bandwidth (≈850 GB/s physical — all padding), ~2.4 ms of the
# 6.4 ms CG trip. Lanes-major (L, n) pads only 8/L≈2.7x; the sparse tail
# passes are gather-bound and measured layout-insensitive
# (tools/lane_layout_probe.py: vmap-over-L parity with lanes-minor, flat
# offset-id form 5x slower), so the whole solve now runs lanes-major
# internally. The public contract is unchanged — (n, L) in, (n, L) out,
# one boundary transpose per SOLVE, not per trip. The lanes-minor pass
# functions above are kept for probes/microbenches and callers.
# ---------------------------------------------------------------------------

def _xv_lm(prob: MultiProblem, V: jax.Array,
           axis_name: str | None = None) -> jax.Array:
    """(L, n) -> (L, R) scores, lanes-major (prob priors also lanes-major)."""
    R = prob.y.shape[0]
    L = V.shape[0]
    if prob.indices.shape[-1] > 0:
        out = jax.vmap(
            lambda v: jnp.sum(prob.values * v[prob.indices], axis=-1))(V)
    else:
        out = jnp.zeros((L, R), dtype=V.dtype)
    if prob.head_x is not None:
        hw = V[:, prob.head_ids]                    # (L, H) | (L, B*H)
        if prob.head_x.ndim == 3:                   # flat-blocks head
            B, Rb, H = prob.head_x.shape
            out = out + jnp.einsum(
                "lbh,brh->lbr", hw.reshape(L, B, H), prob.head_x,
                preferred_element_type=V.dtype,
                precision=jax.lax.Precision.HIGHEST).reshape(L, R)
        else:
            out = out + jnp.einsum(
                "lh,rh->lr", hw, prob.head_x,
                preferred_element_type=V.dtype,
                precision=jax.lax.Precision.HIGHEST)
    if prob.tail_cols is not None:
        if _use_bd(prob.tail_row_offsets, prob.tail_vals.shape[0]):
            out = out + sorted_segment_sum_2level_lanes(
                prob.tail_vals[None, :] * V[:, prob.tail_cols],
                prob.tail_row_offsets)
        else:
            def one(v):
                return jax.ops.segment_sum(
                    prob.tail_vals * v[prob.tail_cols], prob.tail_rows,
                    num_segments=R, indices_are_sorted=True)
            out = out + jax.vmap(one)(V)
    return _psum(out, axis_name)


def _xtv_lm(prob: MultiProblem, D: jax.Array) -> jax.Array:
    """(L, R) -> (L, n) accumulation, lanes-major."""
    n = prob.prior_mean.shape[-1]
    L = D.shape[0]
    out = jnp.zeros((L, n), dtype=D.dtype)
    if prob.indices.shape[-1] > 0:
        flat_idx = prob.indices.reshape(-1)

        def one(d):
            return jnp.zeros(n, d.dtype).at[flat_idx].add(
                (prob.values * d[:, None]).reshape(-1))
        out = out + jax.vmap(one)(D)
    if prob.head_x is not None:
        if prob.head_x.ndim == 3:                   # flat-blocks head
            B, Rb, H = prob.head_x.shape
            contrib = jnp.einsum(
                "brh,lbr->lbh", prob.head_x, D.reshape(L, B, Rb),
                preferred_element_type=D.dtype,
                precision=jax.lax.Precision.HIGHEST)
            out = out.at[:, prob.head_ids].add(contrib.reshape(L, B * H))
        else:
            out = out.at[:, prob.head_ids].add(jnp.einsum(
                "rh,lr->lh", prob.head_x, D,
                preferred_element_type=D.dtype,
                precision=jax.lax.Precision.HIGHEST))
    if prob.tail_c_cols is not None:
        if _use_bd(prob.tail_col_offsets, prob.tail_c_vals.shape[0]):
            out = out + sorted_segment_sum_2level_lanes(
                prob.tail_c_vals[None, :] * D[:, prob.tail_c_rows],
                prob.tail_col_offsets)
        else:
            def one_t(d):
                return jax.ops.segment_sum(
                    prob.tail_c_vals * d[prob.tail_c_rows],
                    prob.tail_c_cols, num_segments=n,
                    indices_are_sorted=True)
            out = out + jax.vmap(one_t)(D)
    elif prob.tail_cols is not None:
        def one_s(d):
            return jnp.zeros(n, d.dtype).at[prob.tail_cols].add(
                prob.tail_vals * d[prob.tail_rows])
        out = out + jax.vmap(one_s)(D)
    return out


def _xtv_and_sqdiag_lm(prob: MultiProblem, C: jax.Array, Dm: jax.Array):
    """Lanes-major (X'C, (X∘X)'Dm): stacks the 2L lanes so indices/values
    are read once per nonzero (same trick as xtv_and_sqdiag)."""
    n = prob.prior_mean.shape[-1]
    L = C.shape[0]
    out = jnp.zeros((2 * L, n), dtype=C.dtype)
    if prob.indices.shape[-1] > 0:
        flat_idx = prob.indices.reshape(-1)
        v = prob.values
        vv = v * v

        def one(d_and_sq):
            d, use_sq = d_and_sq
            vals = jnp.where(use_sq, vv, v)
            return jnp.zeros(n, d.dtype).at[flat_idx].add(
                (vals * d[:, None]).reshape(-1))
        sel = jnp.concatenate([jnp.zeros(L, bool), jnp.ones(L, bool)])
        out = out + jax.vmap(one)((jnp.concatenate([C, Dm], axis=0), sel))
    if prob.head_x is not None:
        if prob.head_x.ndim == 3:                   # flat-blocks head
            B, Rb, H = prob.head_x.shape
            gh = jnp.einsum("brh,lbr->lbh", prob.head_x,
                            C.reshape(L, B, Rb),
                            preferred_element_type=C.dtype,
                            precision=jax.lax.Precision.HIGHEST)
            dh = jnp.einsum("brh,lbr->lbh", prob.head_x * prob.head_x,
                            Dm.reshape(L, B, Rb),
                            preferred_element_type=Dm.dtype,
                            precision=jax.lax.Precision.HIGHEST)
            out = out.at[:, prob.head_ids].add(
                jnp.concatenate([gh.reshape(L, B * H),
                                 dh.reshape(L, B * H)], axis=0))
        else:
            gh = jnp.einsum("rh,lr->lh", prob.head_x, C,
                            preferred_element_type=C.dtype,
                            precision=jax.lax.Precision.HIGHEST)
            dh = jnp.einsum("rh,lr->lh", prob.head_x * prob.head_x, Dm,
                            preferred_element_type=Dm.dtype,
                            precision=jax.lax.Precision.HIGHEST)
            out = out.at[:, prob.head_ids].add(
                jnp.concatenate([gh, dh], axis=0))
    if prob.tail_c_cols is not None:
        tv = prob.tail_c_vals
        tvv = tv * tv
        sel = jnp.concatenate([jnp.zeros(L, bool), jnp.ones(L, bool)])
        if _use_bd(prob.tail_col_offsets, tv.shape[0]):
            vals2 = jnp.where(sel[:, None], tvv[None, :], tv[None, :])
            out = out + sorted_segment_sum_2level_lanes(
                vals2 * jnp.concatenate([C, Dm], axis=0)[:, prob.tail_c_rows],
                prob.tail_col_offsets)
        else:
            def one_t(d_and_sq):
                d, use_sq = d_and_sq
                vals = jnp.where(use_sq, tvv, tv)
                return jax.ops.segment_sum(vals * d[prob.tail_c_rows],
                                           prob.tail_c_cols, num_segments=n,
                                           indices_are_sorted=True)
            out = out + jax.vmap(one_t)(
                (jnp.concatenate([C, Dm], axis=0), sel))
    elif prob.tail_cols is not None:
        tv = prob.tail_vals
        tvv = tv * tv

        def one_s(d_and_sq):
            d, use_sq = d_and_sq
            vals = jnp.where(use_sq, tvv, tv)
            return jnp.zeros(n, d.dtype).at[prob.tail_cols].add(
                vals * d[prob.tail_rows])
        sel = jnp.concatenate([jnp.zeros(L, bool), jnp.ones(L, bool)])
        out = out + jax.vmap(one_s)((jnp.concatenate([C, Dm], axis=0), sel))
    return out[:L], out[L:]


def _fun_grad_curvature_lm(prob: MultiProblem, W: jax.Array,
                           with_diag: bool = False,
                           axis_name: str | None = None):
    """Lanes-major f/g/D(+diag); prob.prior_mean/prior_var_inv are (L, n)."""
    yz = prob.y[None, :] * (_xv_lm(prob, W, axis_name)
                            + prob.offset[None, :])
    dw = W - prob.prior_mean
    F = (jnp.sum(prob.weight[None, :] * jnp.logaddexp(0.0, -yz), axis=1)
         + _psum(0.5 * jnp.sum(dw * dw * prob.prior_var_inv, axis=1),
                 axis_name))
    p = jax.nn.sigmoid(yz)
    coeff = prob.weight[None, :] * (p - 1.0) * prob.y[None, :]
    Dm = prob.weight[None, :] * p * (1.0 - p)
    if with_diag:
        Gd, Hd = _xtv_and_sqdiag_lm(prob, coeff, Dm)
        return (F, Gd + dw * prob.prior_var_inv, Dm,
                Hd + prob.prior_var_inv)
    G = _xtv_lm(prob, coeff) + dw * prob.prior_var_inv
    return F, G, Dm


def _grad_norm_at_zero_lm(prob: MultiProblem, n_rhs: int,
                          axis_name: str | None = None) -> jax.Array:
    yz = prob.y[None, :] * jnp.broadcast_to(
        prob.offset[None, :], (n_rhs, prob.y.shape[0])).astype(
            prob.prior_mean.dtype)
    p = jax.nn.sigmoid(yz)
    coeff = prob.weight[None, :] * (p - 1.0) * prob.y[None, :]
    G0 = _xtv_lm(prob, coeff) - prob.prior_mean * prob.prior_var_inv
    return _norm_lm(G0, axis_name)


def _hv_lm(prob: MultiProblem, Dm: jax.Array, S: jax.Array,
           axis_name: str | None = None) -> jax.Array:
    return (_xtv_lm(prob, Dm * _xv_lm(prob, S, axis_name))
            + S * prob.prior_var_inv)


def _dot_lm(a, b, axis_name: str | None = None):
    return _psum(jnp.sum(a * b, axis=1), axis_name)       # (L,)


def _norm_lm(a, axis_name: str | None = None):
    return jnp.sqrt(_psum(jnp.sum(a * a, axis=1), axis_name))


class HeadBlockPrecond(NamedTuple):
    """M = (exact dense-head Hessian block) ⊕ (Jacobi diagonal on the tail).

    On power-law data the head columns carry most of the curvature mass, so
    preconditioning CG with the head block solved EXACTLY (one (L,H,H)
    Cholesky per Newton trip, bf16 MXU build) plus the Jacobi diagonal
    elsewhere cuts CG trips vs diagonal-only. Any SPD M preserves TRON's
    convergence guarantees; the outer ||g|| stop rule is unchanged.
    """

    chol: jax.Array       # (L, H, H) lower Cholesky factors per lane
    diag: jax.Array       # (n, L) Jacobi diagonal; entries at head_ids are
                          # SET TO 1 and overridden by the block solve
    head_mask: jax.Array  # (n, 1) 1.0 at head coords (for apply/mdot)
    head_ids: jax.Array   # (H,)


def build_head_precond(prob: MultiProblem, Dm: jax.Array,
                       Hdiag: jax.Array) -> HeadBlockPrecond:
    """Head block A_l = head_x' diag(Dm_l) head_x + diag(pvi_head_l).

    The (H,R)@(R,H) build rides the MXU in default (bf16) precision — it
    only shapes a preconditioner, so 3 digits are plenty; the Cholesky runs
    f32. Hdiag is the full Jacobi diagonal already computed by the fused
    f/g/D+diag pass (its head entries are replaced, not reused).
    """
    H = prob.head_x.shape[1]
    n, L = Hdiag.shape
    # (L, H, H): einsum over rows with per-lane Dm scaling
    A = jnp.einsum("ri,rl,rj->lij", prob.head_x, Dm, prob.head_x)
    pvi_head = prob.prior_var_inv[prob.head_ids]          # (H, L)
    A = A + jax.vmap(jnp.diag, in_axes=1)(pvi_head)       # (L, H, H)
    chol = jnp.linalg.cholesky(A.astype(jnp.float32)).astype(Hdiag.dtype)
    head_mask = jnp.zeros((n, 1), Hdiag.dtype).at[prob.head_ids].set(1.0)
    diag = jnp.where(head_mask > 0, 1.0, jnp.maximum(Hdiag, 1e-12))
    return HeadBlockPrecond(chol=chol, diag=diag, head_mask=head_mask,
                            head_ids=prob.head_ids)


def _head_solve(pc: HeadBlockPrecond, r: jax.Array) -> jax.Array:
    """M^{-1} r: cho_solve on the head coords, divide on the tail."""
    r_head = r[pc.head_ids]                                # (H, L)
    sol = jax.vmap(
        lambda c, b: jax.scipy.linalg.cho_solve((c, True), b),
        in_axes=(0, 1), out_axes=1)(pc.chol, r_head)       # (H, L)
    return (r / pc.diag).at[pc.head_ids].set(sol)


def _head_apply(pc: HeadBlockPrecond, v: jax.Array) -> jax.Array:
    """M v (for the M-norm trust-region dots)."""
    v_head = v[pc.head_ids]                                # (H, L)
    Av = jnp.einsum("lij,jl->il", pc.chol, jnp.einsum(
        "lji,jl->il", pc.chol, v_head))                    # L L' v
    tail = v * pc.diag * (1.0 - pc.head_mask)
    return tail.at[pc.head_ids].set(Av)


class MultiTronResult(NamedTuple):
    w: jax.Array             # (n, L)
    f: jax.Array             # (L,)
    gnorm: jax.Array         # (L,)
    iterations: jax.Array    # (L,) accepted Newton steps per lane
    converged: jax.Array     # (L,)
    # lock-step loop-trip counters — the honest cost model: every trip is a
    # full pass over the block's data serving all L lanes, regardless of how
    # many lanes are still active (used by bench.py's roofline accounting)
    newton_trips: jax.Array = jnp.int32(0)  # outer while_loop body executions
    cg_trips: jax.Array = jnp.int32(0)      # total CG body executions (1 Hv each)


def _dot(a, b, axis_name: str | None = None):
    return _psum(jnp.sum(a * b, axis=0), axis_name)        # (L,)


def _norm(a, axis_name: str | None = None):
    return jnp.sqrt(_psum(jnp.sum(a * a, axis=0), axis_name))


def _trcg(prob: MultiProblem, Dm, G, delta, max_cg_iter: int,
          M: jax.Array | None = None, axis_name: str | None = None):
    """Per-lane truncated CG with lock-step data passes (Tron.java:126-179).

    LANES-MAJOR: all state (s/r/z/d, G, Dm, Jacobi M) is (L, ·); per-lane
    scalars are (L,) and broadcast with [:, None]. See the lanes-major
    layout note above — this removes the 42x lane-padding tax the (·, L)
    state paid on every CG-trip loop fusion.

    With a Jacobi preconditioner M = diag(H) (Hsia et al. 2018, as adopted by
    liblinear >= 2.30 — an improvement over the reference's unpreconditioned
    TRON), the trust region is measured in the M-norm and the residual test
    uses ||r||_{M^-1}; M=None reproduces the reference exactly.

    M may be None (no preconditioning — the reference path), an (L, n)
    Jacobi diagonal, or a HeadBlockPrecond (exact dense-head block ⊕ Jacobi
    tail — its small H-sized solves run lanes-minor via boundary
    transposes; H ≈ 512, so those transposes are noise).

    Sharded CG state (s/r/z/d and M) is column-local; every scalar reduction
    goes through the psum'd dots, so all (L,) trust-region scalars stay
    replicated across shards and the while_loop lock-steps by construction.
    """
    zero = jnp.zeros_like(G)

    if M is None:
        def precond(r):
            return r
        def mdot(a, b):
            return _dot_lm(a, b, axis_name)
    elif isinstance(M, HeadBlockPrecond):
        def precond(r):
            return _head_solve(M, r.T).T
        def mdot(a, b):
            return _psum(jnp.sum(a * _head_apply(M, b.T).T, axis=1),
                         axis_name)
    else:
        def precond(r):
            return r / M
        def mdot(a, b):
            return _psum(jnp.sum(a * M * b, axis=1), axis_name)

    z0 = precond(-G)
    cgtol = 0.1 * jnp.sqrt(_dot_lm(-G, z0, axis_name))

    def cond(state):
        s, r, z, d, rz, it, done = state
        return jnp.logical_and(jnp.any(~done), it < max_cg_iter)

    def body(state):
        s, r, z, d, rz, it, done = state
        small = jnp.sqrt(jnp.maximum(_dot_lm(r, z, axis_name), 0.0)) <= cgtol

        Hd = _hv_lm(prob, Dm, d, axis_name)
        dHd = _dot_lm(d, Hd, axis_name)
        alpha = jnp.where(dHd > 0, rz / jnp.where(dHd > 0, dHd, 1.0), 0.0)
        s_try = s + alpha[:, None] * d
        boundary = jnp.sqrt(mdot(s_try, s_try)) > delta

        std = mdot(s, d)
        sts = mdot(s, s)
        dtd = mdot(d, d)
        dsq = delta * delta
        rad = jnp.sqrt(jnp.maximum(std * std + dtd * (dsq - sts), 0.0))
        denom_pos = std + rad
        alpha_b = jnp.where(
            std >= 0,
            jnp.where(denom_pos != 0,
                      (dsq - sts) / jnp.where(denom_pos != 0, denom_pos, 1.0),
                      0.0),
            jnp.where(dtd != 0, (rad - std) / jnp.where(dtd != 0, dtd, 1.0),
                      0.0))

        s_bnd = s + alpha_b[:, None] * d
        r_bnd = r - alpha_b[:, None] * Hd
        r_int = r - alpha[:, None] * Hd
        z_int = precond(r_int)
        rz_new = _dot_lm(r_int, z_int, axis_name)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        d_int = z_int + beta[:, None] * d

        step = jnp.logical_and(~small, ~done)
        take_bnd = jnp.logical_and(step, boundary)
        take_int = jnp.logical_and(step, ~boundary)

        bnd2, int2 = take_bnd[:, None], take_int[:, None]
        s_out = jnp.where(bnd2, s_bnd, jnp.where(int2, s_try, s))
        r_out = jnp.where(bnd2, r_bnd, jnp.where(int2, r_int, r))
        z_out = jnp.where(int2, z_int, z)
        d_out = jnp.where(int2, d_int, d)
        rz_out = jnp.where(take_int, rz_new, rz)
        done_out = jnp.logical_or(done, jnp.logical_or(small, take_bnd))
        return (s_out, r_out, z_out, d_out, rz_out, it + 1, done_out)

    init = (zero, -G, z0, z0, _dot_lm(-G, z0, axis_name),
            jnp.asarray(0, jnp.int32), jnp.zeros(G.shape[0], bool))
    s, r, _z, _d, _rz, it, _done = jax.lax.while_loop(cond, body, init)
    snorm = jnp.sqrt(jnp.maximum(mdot(s, s), 0.0))
    return s, r, snorm, it


@partial(jax.jit,
         static_argnames=("max_iter", "max_cg_iter", "precondition",
                          "axis_name"))
def tron_multi(prob: MultiProblem, W0: jax.Array, eps: jax.Array,
               max_iter: int = 1000, max_cg_iter: int = 500,
               precondition: bool = False,
               axis_name: str | None = None) -> MultiTronResult:
    """Warm-started TRON over L simultaneous lambda-problems (Tron.java:30-124
    per lane; stall thresholds as in mlease_tpu.ops.tron).

    precondition=True (or "jacobi") enables the Jacobi-preconditioned CG
    with M-norm trust region (one hessian-diagonal pass per Newton step buys
    fewer CG data passes); "head_block" additionally solves the dense-head
    curvature block exactly (HeadBlockPrecond — requires the hybrid layout).
    The outer stopping rule (euclidean ||g|| <= eps*||g0||) is unchanged for
    every kind, so converged results match the reference path within
    tolerance.

    axis_name names a mesh axis over which the coefficient/feature dimension
    is sharded (feature model parallelism for n that exceed one chip's HBM):
    the problem's column arrays carry shard-local ids, W0/prior_* are the
    local (n_shard, L) slices, and the solve inserts exactly one psum per Xv
    plus psum'd scalar dots — every (L,) trust-region scalar is replicated,
    so the while_loops lock-step across shards by construction. Requires
    running inside shard_map (see train/feature_sharded.py)."""
    dtype = W0.dtype
    L = W0.shape[1]
    eps = jnp.broadcast_to(jnp.asarray(eps, dtype), (L,))
    kind = {False: "none", True: "jacobi"}.get(precondition, precondition)
    if kind not in ("none", "jacobi", "head_block"):
        # an unrecognized value must NOT fall through to the no-precond
        # branch: the placeholder M would reach _trcg and divide-by-zero the
        # residual, silently turning every solve into a 0-iteration no-op
        raise ValueError(
            f"precondition must be False/True/'jacobi'/'head_block'; "
            f"got {precondition!r}")
    if kind == "head_block" and (prob.head_x is None
                                 or prob.head_x.ndim == 3):
        raise ValueError("head_block preconditioning needs the hybrid "
                         "dense-head layout (head_size > 0, non-flat)")

    # lanes-major boundary: ONE transpose per solve of the (n, L) inputs;
    # everything inside runs (L, ·) (see the layout note above)
    prob_mm = prob  # lanes-minor view for the HeadBlockPrecond build
    prob = prob._replace(
        prior_mean=prob.prior_mean.T,
        prior_var_inv=jnp.broadcast_to(
            prob.prior_var_inv, prob.prior_mean.shape).T)
    W0 = W0.T                                         # (L, n)

    gnorm1 = _grad_norm_at_zero_lm(prob, L, axis_name)

    # the preconditioner is a pure function of the carried Dm; computing it
    # fused with f/g/D (xtv_and_sqdiag) and carrying it in loop state spends
    # ~half a data pass per Newton trip instead of a full standalone
    # hessian_diagonal pass
    if kind == "head_block":
        F, G, Dm, Hd0 = _fun_grad_curvature_lm(prob, W0, with_diag=True,
                                               axis_name=axis_name)
        M0 = build_head_precond(prob_mm, Dm.T, Hd0.T)
        gnorm = _norm_lm(G, axis_name)
        delta = jnp.sqrt(_psum(jnp.sum(G * _head_solve(M0, G.T).T, axis=1),
                               axis_name))
    elif kind == "jacobi":
        F, G, Dm, Hd0 = _fun_grad_curvature_lm(prob, W0, with_diag=True,
                                               axis_name=axis_name)
        M0 = jnp.maximum(Hd0, 1e-12)
        gnorm = _norm_lm(G, axis_name)
        delta = jnp.sqrt(_dot_lm(G, G / M0, axis_name))
    else:
        F, G, Dm = _fun_grad_curvature_lm(prob, W0, axis_name=axis_name)
        M0 = jnp.zeros((1, 1), dtype)  # placeholder: never read
        gnorm = _norm_lm(G, axis_name)
        delta = gnorm
    stall_rtol = 1e-12 if dtype == jnp.float64 else 1e-5

    def cond(state):
        W, F, G, Dm, M, delta, gnorm, it, active, trips, cg_trips = state
        return jnp.any(jnp.logical_and(active, it <= max_iter))

    def body(state):
        W, F, G, Dm, M, delta, gnorm, it, active, trips, cg_trips = state

        S, Rres, snorm, cg_it = _trcg(prob, Dm, G, delta, max_cg_iter,
                                      M if kind != "none" else None,
                                      axis_name)
        W_new = W + S
        gs = _dot_lm(G, S, axis_name)
        prered = -0.5 * (gs - _dot_lm(S, Rres, axis_name))
        # one fused data pass yields f/g/D (+ diag) at the trial point; on
        # rejection the accept select below discards them, exactly as the
        # unfused code discarded its recomputation at the old W
        if kind == "head_block":
            F_new, G_new, Dm_new, Hd_new = _fun_grad_curvature_lm(
                prob, W_new, with_diag=True, axis_name=axis_name)
            M_new = build_head_precond(prob_mm, Dm_new.T, Hd_new.T)
        elif kind == "jacobi":
            F_new, G_new, Dm_new, Hd_new = _fun_grad_curvature_lm(
                prob, W_new, with_diag=True, axis_name=axis_name)
            M_new = jnp.maximum(Hd_new, 1e-12)
        else:
            F_new, G_new, Dm_new = _fun_grad_curvature_lm(
                prob, W_new, axis_name=axis_name)
            M_new = M
        actred = F - F_new

        delta = jnp.where(it == 1, jnp.minimum(delta, snorm), delta)
        denom = F_new - F - gs
        alpha = jnp.where(denom <= 0, SIGMA3,
                          jnp.maximum(SIGMA1,
                                      -0.5 * (gs / jnp.where(denom <= 0, 1.0,
                                                             denom))))
        asn = alpha * snorm
        delta_new = jnp.where(
            actred < ETA0 * prered,
            jnp.minimum(jnp.maximum(alpha, SIGMA1) * snorm, SIGMA2 * delta),
            jnp.where(
                actred < ETA1 * prered,
                jnp.maximum(SIGMA1 * delta, jnp.minimum(asn, SIGMA2 * delta)),
                jnp.where(
                    actred < ETA2 * prered,
                    jnp.maximum(SIGMA1 * delta,
                                jnp.minimum(asn, SIGMA3 * delta)),
                    jnp.maximum(delta, jnp.minimum(asn, SIGMA3 * delta)))))
        delta_new = jnp.where(active, delta_new, delta)

        accept = jnp.logical_and(active, actred > ETA0 * prered)
        acc2 = accept[:, None]
        W_out = jnp.where(acc2, W_new, W)
        F_out = jnp.where(accept, F_new, F)
        G_out = jnp.where(acc2, G_new, G)
        Dm_out = jnp.where(acc2, Dm_new, Dm)
        if kind == "head_block":
            M_out = HeadBlockPrecond(
                chol=jnp.where(accept[:, None, None], M_new.chol, M.chol),
                diag=jnp.where(accept[None, :], M_new.diag, M.diag),
                head_mask=M.head_mask, head_ids=M.head_ids)
        elif kind == "jacobi":
            M_out = jnp.where(acc2, M_new, M)
        else:
            M_out = M
        gnorm_out = jnp.where(accept, _norm_lm(G_new, axis_name), gnorm)
        it_out = it + jnp.where(accept, 1, 0)

        done = jnp.logical_and(accept, gnorm_out <= eps * gnorm1)
        done = jnp.logical_or(done, F_out < -1.0e32)
        done = jnp.logical_or(done, jnp.logical_and(jnp.abs(actred) <= 0,
                                                    prered <= 0))
        done = jnp.logical_or(
            done,
            jnp.logical_and(jnp.abs(actred) <= stall_rtol * jnp.abs(F_out),
                            jnp.abs(prered) <= stall_rtol * jnp.abs(F_out)))
        done = jnp.logical_and(done, active)  # frozen lanes keep their state
        return (W_out, F_out, G_out, Dm_out, M_out, delta_new, gnorm_out,
                it_out, jnp.logical_and(active, ~done), trips + 1,
                cg_trips + cg_it)

    active0 = gnorm > eps * gnorm1
    init = (W0, F, G, Dm, M0, delta, gnorm,
            jnp.ones(L, jnp.int32), active0,
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    W, F, G, Dm, _M, delta, gnorm, it, _active, trips, cg_trips = \
        jax.lax.while_loop(cond, body, init)
    return MultiTronResult(w=W.T, f=F, gnorm=gnorm, iterations=it - 1,
                           converged=gnorm <= eps * gnorm1,
                           newton_trips=trips, cg_trips=cg_trips)
