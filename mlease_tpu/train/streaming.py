"""Streaming ADMM for datasets larger than device memory.

The reference streams each reducer's partition from disk per iteration
(Hadoop re-reads everything every MapReduce round). Here the steady-state
fast path keeps all blocks HBM-resident (mlease_tpu.train.admm); this module
is the >HBM mode: blocks live in host RAM as packed groups, and each ADMM
iteration runs

  phase 1: for each group g: transfer -> batched TRON x-update -> partial
           consensus sums; the NEXT group's host->device transfer is issued
           right after the current solve is dispatched, so the wire rides
           under the solve (double buffering)
  phase 2: z-update from the accumulated xbar/ubar
  phase 3: u_g += x_g - z per group

Two consensus-state placements, picked by budget:

  * device-resident consensus (the default whenever 2*L*N*n*dtype fits the
    budget): z, every group's dual u_g and the iteration's x_g stay in HBM;
    phases 1-3 are chained async device dispatches and the ONLY per-iteration
    host sync is one (2L,)-scalar fetch of (diffs, loglik). Per-iteration
    wire for a group is just its invariant data (nothing at all for pinned
    groups) — where the reference re-reads every byte from HDFS per
    MapReduce round (RegressionAdmmTrain.java:281-355), and where the
    round-2 host-consensus loop shipped u up + x down per group per
    iteration (the measured 2.68 s/iter floor at 262K x 200K, dominated by
    per-group consensus transfers + a per-iteration device re-sort).
  * host-resident consensus (consensus state exceeds the budget — models
    so large that L*nblocks*n alone outgrows HBM): u/x live in host numpy,
    x is fetched per group and the z/u updates run as before.

Invariant work is computed once: the column-sorted tail copy is built on the
HOST at construction (to_hybrid(column_sorted=True)) — never re-derived on
device per iteration (the round-2 design re-sorted every non-resident
group's tail every iteration; at 200K features that vmapped stable argsort
was the measured per-iteration floor, ROADMAP 4d). Residency ladder under
`resident_head_budget_gb`: (tier 1) dense heads PER GROUP while they fit —
the dominant transfer (at 100M-row scale total heads exceed HBM, so
all-or-nothing head pinning would pin zero bytes);
(tier 2) whole groups; (tier 3) remaining groups' column-sorted
tail triplets. Groups past the budget stream both tail copies from host
(12 B/nnz more wire than round 2, zero sort — the wire is measured NOT to
be the bottleneck on the tunneled chip, and is even cheaper on local PCIe).

The consensus math is shared with the in-memory trainer
(mlease_tpu.ops.admm_math); warm start (initialize.boost.rate),
per-iteration sample test loglik and best-model tracking follow
RegressionAdmmTrain.java:236-280, 766-845 exactly as the in-memory trainer
does (see tests/test_streaming.py). A `callback` with the AdmmTrainer.run
contract enables per-iteration checkpointing and the write.train.output
interop dump (fetches z/u to host — the documented cost of the dump,
exactly the state the reference writes per iteration,
RegressionAdmmTrain.java:707-711).

Deliberately unsupported here: the CSC dual layout (it doubles per-iteration
PCIe traffic for a gather-path experiment that only pays off HBM-resident).
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mlease_tpu.core.dataset import BlockedData
from mlease_tpu.core.linear_model import LinearModel
from mlease_tpu.ops import admm_math, objective as obj
from mlease_tpu.ops.tron import tron
from mlease_tpu.train.admm import AdmmConfig, AdmmResult, _lambda_key

logger = logging.getLogger(__name__)


def _group_stream_bytes(g) -> int:
    """Device bytes a fully-resident group pins: every per-iteration data
    transfer (both tail layouts included)."""
    total = 0
    for f in ("indices", "values", "y", "weight", "offset", "present",
              "tail_rows", "tail_cols", "tail_vals",
              "tail_c_rows", "tail_c_cols", "tail_c_vals"):
        a = getattr(g, f, None)
        if a is not None:
            total += int(a.nbytes)
    return total


def _ctail_bytes(g) -> int:
    return sum(int(getattr(g, f).nbytes)
               for f in ("tail_c_rows", "tail_c_cols", "tail_c_vals")
               if getattr(g, f, None) is not None)


# ---- compact wire format (host->device transfer compression) ----------
# The per-iteration transfer of a streamed group is wire-bandwidth bound
# (on the tunneled chip ~40-80 MB/s effective; even on local PCIe it is
# the >HBM mode's floor). Two exact, bit-parity re-encodings shrink it:
#
#   * the dense (B, R, H) head is ~96% zeros (only nonzeros on the H
#     hottest columns land in it) — ship its COO triplet (int32 flat row,
#     uint8 head column, head-dtype value: 7 B/nnz vs 2 B x H/row dense)
#     and scatter into the dense form on device;
#   * the two tail layouts (row-sorted + column-sorted, 24 B/nnz) are the
#     same triplet in two orders — ship the column-sorted one plus the
#     int32 inverse permutation (16 B/nnz) and gather the row-sorted
#     copy on device (exact: a permutation of identical values; with the
#     column-sorted triplet pinned in HBM, only the 4 B/nnz permutation
#     ships).
#
# Reconstruction is jitted and dispatches async like the puts, so it
# overlaps the in-flight solve exactly as the raw transfers did.
# Single-device only (under a mesh the rebuilt arrays would need sharded
# scatter/gather); no counterpart in the reference — its per-iteration
# re-read is the HDFS stream in RegressionAdmmTrain.java:677-690.

def _head_coo(head) -> tuple:
    """Host-side COO of the dense head (once at construction)."""
    B, R, H = head.shape
    b, r, h = np.nonzero(head != 0)
    rows = (b.astype(np.int64) * R + r).astype(np.int32)
    cols = h.astype(np.uint8 if H <= 256 else np.int32)
    return rows, cols, head[b, r, h]


def _device_hbm_bytes() -> int:
    """Device memory capacity (bytes). memory_stats when the backend
    exposes it; 16 GB (v5e) otherwise, overridable via MLEASE_HBM_GB."""
    import os
    env = os.environ.get("MLEASE_HBM_GB")
    if env:
        return int(float(env) * (1 << 30))
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return 16 * (1 << 30)


def _pad_group_tails(g, T_max: int):
    """Pad one group's tail layouts from T to T_max columns, bit-exactly.

    BOTH triplets APPEND (row R-1, col n-1, val 0.0) entries — the same
    padding convention core/dataset.to_hybrid uses inside a block: row
    R-1 / col n-1 keep the appended padding truly SORTED in each stream
    (the boundary-diff reduce in ops/segsum.py requires ascending ids),
    and appending (never prepending) means real entries keep their
    positions, so prefix-tile groupings — and therefore every float —
    are unchanged by the padding. Each added entry contributes +0.0 to
    the last row/column slot: a float-exact no-op."""
    B, T = g.tail_rows.shape
    P = T_max - T
    if P <= 0:
        return g

    def app(a, fill=0):
        return (None if a is None
                else np.concatenate(
                    [a, np.full((B, P), fill, a.dtype)], axis=1))

    return g._replace(tail_rows=app(g.tail_rows, g.padded_rows - 1),
                      tail_cols=app(g.tail_cols, g.dim - 1),
                      tail_vals=app(g.tail_vals),
                      tail_c_rows=app(g.tail_c_rows, g.padded_rows - 1),
                      tail_c_cols=app(g.tail_c_cols, g.dim - 1),
                      tail_c_vals=app(g.tail_c_vals))


def _tail_inv_perm(tail_cols) -> np.ndarray:
    """Per-block inverse of the stable column sort: row-sorted tail =
    column-sorted tail indexed by this permutation (exactly — same argsort
    as core/dataset.to_hybrid builds the tail_c_* copy with)."""
    B, T = tail_cols.shape
    inv = np.empty((B, T), np.int32)
    ar = np.arange(T, dtype=np.int32)
    for b in range(B):
        ordc = np.argsort(tail_cols[b], kind="stable")
        inv[b, ordc] = ar
    return inv


def _pad_head_coo_shared(wire: dict) -> None:
    """Pad every compact head-COO triplet to one shared length so the
    device scatter compiles ONCE per run instead of once per group (each
    distinct COO length is its own program shape). Pads are (0, 0, 0.0)
    entries — exact no-ops under _scatter_head_dense's additive scatter."""
    lens = [w["head_coo"][0].shape[0] for w in wire.values()
            if "head_coo" in w]
    if len(lens) <= 1 or max(lens) == min(lens):
        return
    target = max(lens)
    for w in wire.values():
        coo = w.get("head_coo")
        if coo is None or coo[0].shape[0] == target:
            continue
        pad = target - coo[0].shape[0]
        w["head_coo"] = tuple(
            np.concatenate([a, np.zeros(pad, a.dtype)]) for a in coo)


@jax.jit
def _gather_row_sorted(tc_rows, tc_cols, tc_vals, inv):
    take = lambda a: jnp.take_along_axis(a, inv, axis=1)  # noqa: E731
    return take(tc_rows), take(tc_cols), take(tc_vals)


@partial(jax.jit, static_argnums=(3,))
def _scatter_head_dense(hrows, hcols, hvals, shape):
    # .add, not .set(unique_indices=True): shared-length COO padding ships
    # duplicate (0, 0, 0.0) entries, which add nothing into slot (0, 0) —
    # exact — while real entries are unique nonzeros of a zero base, so
    # add == set bit-for-bit
    B, R, H = shape
    flat = jnp.zeros((B * R, H), hvals.dtype)
    flat = flat.at[hrows, hcols.astype(jnp.int32)].add(hvals)
    return flat.reshape(B, R, H)


@jax.jit
def _sort_tail_by_column(rows, cols, vals):
    """Column-sorted copy of a (B, T) COO tail, computed ON DEVICE.

    A stable argsort of tail_cols produces the bit-identical permutation the
    host pack (core/dataset.to_hybrid) would have produced, so downstream
    segment-sums see the exact same summation order. Kept as the fallback
    for callers that hand-construct groups without host-sorted tails; the
    trainer itself sorts ONCE on the host at construction (re-deriving this
    every iteration from iteration-invariant data was the round-2 streaming
    floor)."""
    def one(r, c, v):
        order = jnp.argsort(c, stable=True)
        return r[order], c[order], v[order]
    return jax.vmap(one)(rows, cols, vals)


@partial(jax.jit, static_argnames=("regularizer", "nblocks",
                                   "intercept_index", "penalize_intercept",
                                   "reference_compat"))
def _z_update_all(v, lam_vec, rhos, *, regularizer, nblocks, intercept_index,
                  penalize_intercept, reference_compat):
    """All lambda lanes' consensus z-updates in ONE dispatch.

    The per-lane math is exactly admm_math.z_update_l{1,2}; batching the L
    lanes avoids L sequential dispatch+fetch round trips per iteration in
    the streaming host loop (each a full tunnel/PCIe round trip)."""
    def one(v_i, lam_i, rho_i):
        if regularizer == 2:
            return admm_math.z_update_l2(v_i, lam_i, rho_i, nblocks,
                                         intercept_index, penalize_intercept)
        return admm_math.z_update_l1(v_i, lam_i, rho_i, nblocks,
                                     intercept_index, penalize_intercept,
                                     reference_compat=reference_compat)
    return jax.vmap(one)(v, lam_vec, rhos)


@partial(jax.jit, static_argnames=("regularizer", "nblocks",
                                   "intercept_index", "penalize_intercept",
                                   "reference_compat"))
def _z_update_from_sums(xsum, usum, z, lam_vec, rhos, *, regularizer,
                        nblocks, intercept_index, penalize_intercept,
                        reference_compat):
    """Device-consensus phase 2: v = (sum x + sum u)/N, per-lane z-update,
    per-lane max|dz| — one dispatch, nothing fetched."""
    v = (xsum + usum) / nblocks
    z_new = _z_update_all(v, lam_vec, rhos, regularizer=regularizer,
                          nblocks=nblocks, intercept_index=intercept_index,
                          penalize_intercept=penalize_intercept,
                          reference_compat=reference_compat)
    diffs = admm_math.max_abs_diff(z_new, z.astype(z_new.dtype), axis=-1)
    return z_new, diffs


@jax.jit
def _partial_sums(x, u, bv):
    """Per-group consensus partials (sum over REAL blocks), on device."""
    m = bv[None, :, None]
    return jnp.sum(x * m, axis=1), jnp.sum(u * m, axis=1)


@partial(jax.jit, donate_argnums=(0,))
def _u_update_dev(u, x, z_new, bv):
    """Phase 3 on device: u += x - z (padded mesh blocks masked to 0);
    donates the old dual buffer."""
    return (u + x - z_new[:, None, :]) * bv[None, :, None]


def build_group_solver(max_newton_iter: int, max_cg_iter: int,
                       use_head: bool = False, multi_rhs: bool = False,
                       pcg: bool = False, flat_blocks: bool = False,
                       relaxation: float = 1.0):
    """Jitted (lambda x block) x-update for one data group (no consensus).

    flat_blocks: fold the group's block axis into the coefficient axis (one
    stacked (Bg*n, L) solve — see train/admm.py solve_flat; batched gathers
    measure ~1.9x their flat equivalents). Joint per-λ trust region and the
    strictest per-block eps scale; same converged x to solver tolerance."""
    solver = partial(tron, max_iter=max_newton_iter, max_cg_iter=max_cg_iter)

    def solve_one(indices, values, y, weight, offset, head, prior_mean,
                  prior_var_inv, w0, eps):
        (head_x, head_ids, t_rows, t_cols, t_vals,
         tc_rows, tc_cols, tc_vals) = head
        prob = obj.LRProblem(indices=indices, values=values, y=y,
                             weight=weight, offset=offset,
                             prior_mean=prior_mean,
                             prior_var_inv=prior_var_inv,
                             head_x=head_x, head_ids=head_ids,
                             tail_rows=t_rows, tail_cols=t_cols,
                             tail_vals=t_vals, tail_c_rows=tc_rows,
                             tail_c_cols=tc_cols, tail_c_vals=tc_vals)
        r = solver(prob, w0, eps)
        return r.w, r.iterations, r.cg_iterations

    head_inner = (0, None, 0, 0, 0, 0, 0, 0) if use_head else None
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
            r = tron_multi(prob, W0, eps, max_iter=max_newton_iter,
                           max_cg_iter=max_cg_iter, precondition=pcg)
            return r.w, r.newton_trips, r.cg_trips

        solve_multi = jax.vmap(solve_block_multi,
                               in_axes=(0, 0, 0, 0, 0, head_inner,
                                        0, None, None, 0))

        from mlease_tpu.ops.tron_multi import stack_blocks

        def solve_flat(indices, values, y, weight, offset, head,
                       prior_mean, z, rho_eff, eps):
            B = indices.shape[0]
            L, n = z.shape
            prob = stack_blocks(indices, values, y, weight, offset, head,
                                prior_mean, rho_eff)
            r = tron_multi(prob, jnp.tile(z.T, (B, 1)), jnp.min(eps),
                           max_iter=max_newton_iter,
                           max_cg_iter=max_cg_iter, precondition=pcg)
            # (L, B, n) solution + this group's solver trip counters
            return (r.w.reshape(B, n, L).transpose(2, 0, 1),
                    r.newton_trips, r.cg_trips)

    def run(indices, values, y, weight, offset, head, present, z, u,
            rho_eff, eps):
        dtype = z.dtype
        L, n = z.shape
        prior_mean = z[:, None, :] - u
        prior_var_inv = rho_eff[:, None] * jnp.ones((1, n), dtype)
        if multi_rhs and flat_blocks:
            x, nt, cg = solve_flat(indices, values, y, weight, offset, head,
                                   prior_mean, z, rho_eff, eps)
        elif multi_rhs:
            x_T, nt_b, cg_b = solve_multi(indices, values, y, weight, offset,
                                          head, prior_mean.transpose(1, 2, 0),
                                          prior_var_inv.T, z.T, eps)
            x = x_T.transpose(2, 0, 1)
            nt, cg = jnp.sum(nt_b), jnp.sum(cg_b)
        else:
            x, nt_lb, cg_lb = solve_grid(indices, values, y, weight, offset,
                                         head, prior_mean, prior_var_inv, z,
                                         eps)
            nt, cg = jnp.sum(nt_lb), jnp.sum(cg_lb)
        x = jnp.where(present[None, :, :], x, prior_mean)
        if relaxation != 1.0:
            # over-relaxation x_hat = alpha*x + (1-alpha)*z, exactly as the
            # in-memory trainer applies it post-masking (train/admm.py);
            # the consensus and u-updates then see the relaxed x
            x = relaxation * x + (1.0 - relaxation) * z[:, None, :]
        # trips ride the iteration's single scalar fetch (explains where a
        # big-shape iteration's time goes: trips x per-pass cost)
        return x, jnp.stack([nt, cg]).astype(jnp.int32)

    return jax.jit(run)


class StreamingAdmmTrainer:
    """ADMM over a list of host-resident block groups.

    groups: list of BlockedData whose block counts sum to the logical
    num.blocks. Groups may have different padded shapes (each gets its own
    compiled solver specialization).

    consensus_device: "auto" (default) keeps z / u / x in device memory
    whenever 2*L*nblocks*n*itemsize fits resident_head_budget_gb (checked
    against the FULL budget — consensus state is solver state like the TRON
    workspace, not data, and does not consume the data-residency ladder's
    budget); True forces it; False forces host-resident consensus (the
    fallback for models whose dual state alone outgrows HBM).
    """

    def __init__(self, groups: Sequence[BlockedData], vocab,
                 config: AdmmConfig, test_rows=None, mesh=None,
                 resident_head: str | bool = "auto",
                 resident_head_budget_gb: float = 8.0,
                 consensus_device: str | bool = "auto",
                 compact_wire: str | bool = "auto",
                 pad_tails: str | bool = "auto"):
        if config.dual_layout:
            raise NotImplementedError(
                "dual layout in streaming mode: the CSC arrays double the "
                "per-iteration PCIe transfer; use the HBM-resident trainer")
        # one-time wire-format normalization: value arrays convert to the
        # compute dtype (and the dense head to head_dtype — e.g. bfloat16
        # halves the head's wire bytes, by far the largest transfer) ONCE
        # here instead of per transfer per iteration; _put_group ships
        # arrays exactly as stored.
        # IN PLACE, group by group: at the 100M shape the hybrid heads are
        # the largest host allocation — converting via list comprehensions
        # would hold every group's pre-conversion arrays alive until the
        # whole list is rebuilt (observed ~2x peak RSS at 25M rows).
        def _conv(a, t):
            if a is None:
                return None
            return a if a.dtype == t else np.asarray(a, t)

        dt, hdt = config.dtype, (config.head_dtype or config.dtype)
        groups = list(groups)
        if config.head_size > 0:
            from mlease_tpu.core.dataset import to_hybrid
            # column_sorted=True: the sorted-tail copy is derived ONCE on
            # the host — the round-2 design derived it on device EVERY
            # iteration (a vmapped stable argsort of iteration-invariant
            # data; the measured streaming floor at wide-feature shapes).
            # head_dtype passed down so the dense head is never
            # materialized at full f32 width across all groups at once.
            for i, g in enumerate(groups):
                if g.head is None:
                    groups[i] = to_hybrid(g, config.head_size,
                                          column_sorted=True,
                                          head_dtype=hdt)
        for i, g in enumerate(groups):
            groups[i] = g._replace(
                values=_conv(g.values, dt),
                y=_conv(g.y, dt), weight=_conv(g.weight, dt),
                offset=_conv(g.offset, dt), head=_conv(g.head, hdt),
                tail_vals=_conv(g.tail_vals, dt),
                tail_c_vals=_conv(g.tail_c_vals, dt))
        # hand-constructed hybrid groups without a host-sorted tail copy:
        # sort once here (np stable argsort per block — identical
        # permutation to core/dataset.to_hybrid)
        for i, g in enumerate(groups):
            if g.tail_cols is not None and g.tail_c_cols is None:
                B = g.tail_cols.shape[0]
                tc_r = np.empty_like(g.tail_rows)
                tc_c = np.empty_like(g.tail_cols)
                tc_v = np.empty_like(g.tail_vals)
                for b in range(B):
                    order = np.argsort(g.tail_cols[b], kind="stable")
                    tc_r[b] = g.tail_rows[b][order]
                    tc_c[b] = g.tail_cols[b][order]
                    tc_v[b] = g.tail_vals[b][order]
                groups[i] = g._replace(tail_c_rows=tc_r, tail_c_cols=tc_c,
                                       tail_c_vals=tc_v)
        # ---- shared tail shapes (cold-compile tax) -------------------
        # Per-group to_hybrid rounds each group's tail width T to its own
        # multiple of 128, so every group shape costs its own solver +
        # compact-wire gather/scatter compile — through the tunnel each is
        # ~20-60 s (25M cold start measured 560 s dense -> 880 s compact,
        # ROADMAP r4). Padding every group's tails to the run-wide max T
        # collapses those programs to one per distinct block count, with
        # bit-exact results (padding entries add 0.0 into slot (0, 0)).
        # "auto" pads unless the extra wire/storage exceeds 25% of the
        # tail bytes (pathologically heterogeneous groups keep their own
        # shapes — per-group compiles beat shipping mostly-padding).
        self._tail_orig_T: dict[int, int] = {}
        tails_ok = all(g.tail_rows is not None for g in groups)
        if pad_tails in ("auto", True) and tails_ok and len(groups) > 1:
            widths = [g.tail_rows.shape[1] for g in groups]
            T_max = max(widths)
            orig = sum(w * g.nblocks for w, g in zip(widths, groups))
            padded = sum(T_max * g.nblocks for g in groups)
            if T_max > min(widths) and (
                    pad_tails is True or padded <= 1.25 * orig):
                for i, g in enumerate(groups):
                    if g.tail_rows.shape[1] < T_max:
                        self._tail_orig_T[i] = g.tail_rows.shape[1]
                        groups[i] = _pad_group_tails(g, T_max)
                logger.info(
                    "tail shapes harmonized to T=%d across %d groups "
                    "(%d padded; +%.1f%% tail bytes) — one solver/wire "
                    "program per block count instead of per group",
                    T_max, len(groups), len(self._tail_orig_T),
                    100.0 * (padded - orig) / max(orig, 1))
        # consensus divisor = real blocks only (padding masked below)
        self.nblocks = sum(g.nblocks for g in groups)
        self.real_nblocks = [g.nblocks for g in groups]
        self.mesh = mesh
        if mesh is not None:
            from mlease_tpu.parallel.mesh import pad_blocks
            padded, valids = [], []
            for g in groups:
                g2, bv = pad_blocks(g, mesh.devices.size)
                padded.append(g2)
                valids.append(bv)
            groups = padded
            self.block_valid = valids
        else:
            self.block_valid = [np.ones(g.nblocks) for g in groups]
        self.groups = list(groups)
        self.vocab = vocab
        self.config = config
        self.dim = self.groups[0].dim
        self.lambdas = [float(l) for l in config.lambdas]
        self.rhos = config.resolved_rhos()
        self.use_head = self.groups[0].head is not None

        # ---- consensus placement ------------------------------------
        # device-resident consensus: z, u_g and the in-flight x_g stay in
        # HBM; per-iteration host traffic collapses to one scalar fetch.
        # Gated by the SAME GB number as the data ladder but not subtracted
        # from it (solver state, not data).
        budget_gb = (float("inf") if resident_head is True
                     else float(resident_head_budget_gb))
        L = len(self.lambdas)
        itemsize = np.dtype(config.dtype).itemsize
        blocks_total = sum(g.nblocks for g in self.groups)
        consensus_bytes = 2 * L * blocks_total * self.dim * itemsize
        if consensus_device == "auto":
            self._consensus_device = (consensus_bytes
                                      <= budget_gb * (1 << 30))
        else:
            self._consensus_device = bool(consensus_device)
        self._u_dev: list | None = None   # built lazily in run()

        # ---- HBM safety cap on the pin budget -------------------------
        # The pinned tiers share HBM with the DOUBLE-BUFFERED streamed
        # working set (2 groups in flight), the consensus/dual state, the
        # per-iteration x slab, and reconstruction transients. A budget
        # that ignores them OOMs the chip at iteration 1 (observed: the
        # 100M config's 10 GB budget + 0.72 GB consensus + 2 x 3.7 GB
        # groups on a 16 GB v5e). Cap the budget so a too-large request
        # degrades to less pinning instead of a crash.
        if (self.use_head and resident_head in ("auto", True)
                and mesh is None
                and jax.devices()[0].platform != "cpu"):  # host RAM: no cliff
            group_dev = max(
                _group_stream_bytes(g) + int(g.head.nbytes)
                + int(g.head_ids.nbytes) for g in self.groups)
            x_bytes = L * blocks_total * self.dim * itemsize
            hbm = _device_hbm_bytes()
            # transients: one extra dense head (scatter output before the
            # previous buffer frees) + wire arrays; reserve ~12% of HBM
            # for XLA scratch/fragmentation
            slack = int(max(g.head.nbytes for g in self.groups)
                        + 0.12 * hbm)
            avail = (hbm - slack - 2 * group_dev - x_bytes
                     - (consensus_bytes if self._consensus_device else 0))
            if budget_gb * (1 << 30) > max(avail, 0):
                logger.warning(
                    "resident budget %.1f GB exceeds safe HBM headroom "
                    "%.1f GB (HBM %.1f GB - 2x%.2f GB streamed buffers "
                    "- %.2f GB consensus+x - %.2f GB slack); capping",
                    budget_gb, max(avail, 0) / (1 << 30), hbm / (1 << 30),
                    group_dev / (1 << 30),
                    (consensus_bytes + x_bytes) / (1 << 30),
                    slack / (1 << 30))
                budget_gb = max(avail, 0) / (1 << 30)

        # ---- tiered data residency (resident_head_budget_gb) ---------
        #   tier 1 — every group's dense head (the dominant transfer);
        #   tier 2 — whole groups (both tail layouts + y/weight/offset/
        #            present/ELL), in order, while they fit;
        #   tier 3 — remaining groups' column-sorted tail triplets (kills
        #            12 B/nnz of wire per group while budget lasts).
        # A fully-resident group's per-iteration wire is ZERO under device
        # consensus. Groups past the budget stream both host-precomputed
        # tail layouts — never a per-iteration sort.
        self._resident_heads: dict[int, tuple] = {}
        self._resident_groups: dict[int, tuple] = {}
        self._resident_ctails: dict[int, tuple] = {}
        self._wire: dict[int, dict] = {}   # populated after the ladder
        if self.use_head and resident_head in ("auto", True):
            budget = budget_gb * (1 << 30)
            pinned = 0
            # tier 1 — dense heads PER GROUP while they fit (at 100M-row
            # scale total heads exceed HBM outright; pinning the first K
            # groups' heads still saves K/G of the dominant transfer —
            # all-or-nothing here would pin zero bytes)
            for gi, g in enumerate(self.groups):
                hb = int(g.head.nbytes) + int(g.head_ids.nbytes)
                if hb <= budget:
                    self._resident_heads[gi] = (self._put_b(g.head),
                                                self._put_r(g.head_ids))
                    budget -= hb
                    pinned += hb
            # tier 2 — whole groups (only where the head is already
            # pinned: _pin_group reuses the tier-1 device arrays)
            for gi, g in enumerate(self.groups):
                if gi not in self._resident_heads:
                    continue
                gb = _group_stream_bytes(g)
                if gb > budget:
                    break
                self._resident_groups[gi] = self._pin_group(gi)
                budget -= gb
                pinned += gb
            # tier 3 — remaining groups' column-sorted tail triplets
            for gi, g in enumerate(self.groups):
                if gi in self._resident_groups:
                    continue
                cb = _ctail_bytes(g)
                if 0 < cb <= budget:
                    self._resident_ctails[gi] = (
                        self._put_b(g.tail_c_rows),
                        self._put_b(g.tail_c_cols),
                        self._put_b(g.tail_c_vals))
                    budget -= cb
                    pinned += cb
            logger.info(
                "resident mode: %.2f GB pinned in device memory "
                "(%d/%d heads + %d/%d full groups + %d sorted tails); "
                "consensus state (%.2f GB) %s",
                pinned / (1 << 30), len(self._resident_heads),
                len(self.groups),
                len(self._resident_groups), len(self.groups),
                len(self._resident_ctails),
                consensus_bytes / (1 << 30),
                "device-resident" if self._consensus_device
                else "host-resident")
        # ---- compact wire format (see _head_coo/_tail_inv_perm) -------
        # built AFTER the residency ladder: pinned tiers never re-ship, so
        # only streamed components get a compact encoding
        if compact_wire is True and mesh is not None:
            raise ValueError("compact_wire=True requires a single device "
                             "(the rebuilt arrays would need sharded "
                             "scatter/gather under a mesh)")
        if (self.use_head and mesh is None
                and (compact_wire is True or compact_wire == "auto")):
            for gi, g in enumerate(self.groups):
                if gi in self._resident_groups:
                    continue
                w: dict = {}
                if gi not in self._resident_heads:
                    hrows, hcols, hvals = _head_coo(g.head)
                    coo_b = hrows.nbytes + hcols.nbytes + hvals.nbytes
                    # only a win while the head is actually sparse
                    if coo_b < int(g.head.nbytes) // 2:
                        w["head_coo"] = (hrows, hcols, hvals)
                if g.tail_c_cols is not None:
                    w["tail_inv"] = self._tail_inv(gi)
                if w:
                    self._wire[gi] = w
            # one scatter program per run: each distinct COO length is its
            # own compiled shape (~20-60 s each through the tunnel)
            _pad_head_coo_shared(self._wire)
            if self._wire:
                logger.info(
                    "compact wire: %d/%d streamed groups re-encoded "
                    "(%.2f GB -> %.2f GB per iteration)",
                    len(self._wire), len(self.groups),
                    self._dense_wire_bytes() / (1 << 30),
                    self.stream_wire_bytes() / (1 << 30))

        self.solver = build_group_solver(
            config.max_newton_iter, config.max_cg_iter,
            use_head=self.use_head, relaxation=config.relaxation,
            multi_rhs=config.multi_rhs, pcg=config.pcg,
            flat_blocks=(bool(config.flat_blocks) and mesh is None
                         and config.multi_rhs
                         and config.pcg != "head_block"
                         # stacked column AND row ids live in int32
                         and max(g.nblocks for g in self.groups)
                         * self.dim < 2**31
                         and max(g.nblocks * g.padded_rows
                                 for g in self.groups) < 2**31))
        self.eps_scales = [obj.class_balance_eps_scale(g.y, g.nrows)
                           for g in self.groups]
        self.lam_vec = np.stack([
            admm_math.per_feature_lambda(l, self.dim, config.lambda_map,
                                         vocab)
            for l in self.lambdas])

        # sample-test loglik arrays (first MAX_NTEST_EVENTS rows), as in
        # AdmmTrainer (RegressionAdmmTrain.java:122, 766-811)
        self.test_arrays = None
        if test_rows:
            from mlease_tpu.core.dataset import pack_rows
            from mlease_tpu.train.admm import (MAX_NTEST_EVENTS,
                                               build_loglik_fn)
            rows = list(test_rows)[:MAX_NTEST_EVENTS]
            blk = pack_rows(rows, vocab)
            dtype = config.dtype
            self.test_arrays = (
                jnp.asarray(blk.indices), jnp.asarray(blk.values, dtype),
                jnp.asarray(blk.y, dtype), jnp.asarray(blk.weight, dtype),
                jnp.asarray(blk.offset, dtype))
            self.loglik_fn = build_loglik_fn()

    # ------------------------------------------------------------------
    def residency_report(self) -> dict:
        """The ACTUAL pinned state (bench accounting; not the requested
        mode — the ladder may have skipped tiers that did not fit)."""
        return {
            "consensus_device": bool(self._consensus_device),
            "heads_pinned": len(self._resident_heads),
            "full_groups_pinned": len(self._resident_groups),
            "sorted_tails_pinned": len(self._resident_ctails),
            "compact_wire_groups": len(self._wire),
            "n_groups": len(self.groups),
        }

    def _dense_wire_bytes(self) -> int:
        """Per-iteration host->device bytes WITHOUT compact re-encoding
        (pinned tiers still excluded) — the comparison baseline."""
        total = 0
        for gi, g in enumerate(self.groups):
            if gi in self._resident_groups:
                continue
            for f in ("indices", "values", "y", "weight", "offset",
                      "present", "tail_rows", "tail_cols", "tail_vals"):
                a = getattr(g, f, None)
                if a is not None:
                    total += int(a.nbytes)
            if gi not in self._resident_ctails:
                total += _ctail_bytes(g)
            if self.use_head and gi not in self._resident_heads:
                total += int(g.head.nbytes) + int(g.head_ids.nbytes)
        return total

    def stream_wire_bytes(self) -> int:
        """Actual per-iteration host->device bytes: pinned tiers never
        re-ship; compact-wire groups ship COO heads and one tail layout
        plus the permutation instead of two layouts."""
        total = 0
        for gi, g in enumerate(self.groups):
            if gi in self._resident_groups:
                continue
            w = self._wire.get(gi, {})
            for f in ("indices", "values", "y", "weight", "offset",
                      "present"):
                a = getattr(g, f, None)
                if a is not None:
                    total += int(a.nbytes)
            # tails: compact wire derives the row-sorted copy from the
            # column-sorted triplet (pinned or shipped) + the permutation
            if "tail_inv" in w:
                total += int(w["tail_inv"].nbytes)
            else:
                total += sum(int(getattr(g, f).nbytes)
                             for f in ("tail_rows", "tail_cols",
                                       "tail_vals")
                             if getattr(g, f, None) is not None)
            if gi not in self._resident_ctails:
                total += _ctail_bytes(g)
            if not self.use_head or gi in self._resident_heads:
                continue
            if "head_coo" in w:
                total += sum(int(a.nbytes) for a in w["head_coo"])
                total += int(g.head_ids.nbytes)
            else:
                total += int(g.head.nbytes) + int(g.head_ids.nbytes)
        return total

    def _tail_inv(self, gi: int) -> np.ndarray:
        """Inverse column-sort permutation for group gi.

        _pad_group_tails APPENDS (row R-1, col n-1) pads to BOTH triplets,
        so a padded group satisfies the same tc == tail[stable-argsort]
        relation as an unpadded one (pads are the final members of the
        col n-1 tie group in both constructions) — one plain inverse over
        the padded arrays reproduces the padded row-sorted triplet
        bit-exactly on device."""
        return _tail_inv_perm(self.groups[gi].tail_cols)

    def sample_loglik(self, z) -> np.ndarray:
        idx, val, y, w, off = self.test_arrays
        return np.asarray(self.loglik_fn(
            idx, val, y, w, off, jnp.asarray(z, self.config.dtype)))

    def _put_group(self, gi: int, dtype):
        """Issue the host->device transfers for group gi (async: jax device
        puts return immediately; the copies overlap the in-flight solve).
        Under a mesh, arrays shard over the block axis; head_ids replicate.

        All float arrays ship exactly as stored (one-time dtype conversion
        in __init__ — with head_dtype=bfloat16 the dense head, the largest
        transfer, ships at half width). Both tail layouts were computed on
        the host once at construction; pinned tiers (full group / sorted
        tail / heads) return their device arrays outright."""
        if gi in self._resident_groups:
            return self._resident_groups[gi]
        g = self.groups[gi]
        put_b, put_r = self._put_b, self._put_r
        head = (None,) * 8
        if self.use_head:
            w = self._wire.get(gi, {})
            if gi in self._resident_ctails:
                tc_rows, tc_cols, tc_vals = self._resident_ctails[gi]
            else:
                tc_rows, tc_cols = put_b(g.tail_c_rows), put_b(g.tail_c_cols)
                tc_vals = put_b(g.tail_c_vals)
            if "tail_inv" in w:
                # row-sorted copy derived ON DEVICE: exact permutation of
                # the column-sorted triplet, 4 B/nnz wire instead of 12
                t_rows, t_cols, t_vals = _gather_row_sorted(
                    tc_rows, tc_cols, tc_vals, put_b(w["tail_inv"]))
            else:
                t_rows, t_cols = put_b(g.tail_rows), put_b(g.tail_cols)
                t_vals = put_b(g.tail_vals)
            if gi in self._resident_heads:
                head_x, head_ids = self._resident_heads[gi]
            elif "head_coo" in w:
                hrows, hcols, hvals = w["head_coo"]
                head_x = _scatter_head_dense(put_b(hrows), put_b(hcols),
                                             put_b(hvals), g.head.shape)
                head_ids = put_r(g.head_ids)
            else:
                head_x, head_ids = put_b(g.head), put_r(g.head_ids)
            head = (head_x, head_ids,
                    t_rows, t_cols, t_vals, tc_rows, tc_cols, tc_vals)
        return (put_b(g.indices), put_b(g.values),
                put_b(g.y), put_b(g.weight),
                put_b(g.offset), head, put_b(g.present))

    def _pin_group(self, gi: int):
        """Transfer group gi once and keep the device tuple (tier-2
        residency)."""
        return self._put_group(gi, self.config.dtype)

    def _put_b(self, a):
        """Host->device put of a block-leading array (sharded under a mesh)."""
        if self.mesh is not None:
            from mlease_tpu.parallel.mesh import block_sharding
            return jax.device_put(np.asarray(a),
                                  block_sharding(self.mesh, 0))
        return jnp.asarray(a)

    def _put_u(self, a):
        """Dual state: block axis is axis 1 ((L, B, n))."""
        if self.mesh is not None:
            from mlease_tpu.parallel.mesh import block_sharding
            return jax.device_put(np.asarray(a),
                                  block_sharding(self.mesh, 1))
        return jnp.asarray(a)

    def _put_r(self, a):
        """Host->device put, replicated under a mesh."""
        if self.mesh is not None:
            from mlease_tpu.parallel.mesh import replicated
            return jax.device_put(np.asarray(a), replicated(self.mesh))
        return jnp.asarray(a)

    # ------------------------------------------------------------------
    def run(self, z0: np.ndarray | None = None, *,
            u0: np.ndarray | None = None, start_iteration: int = 1,
            inner_eps0: float | None = None, mindiff0: float = 99999999.0,
            best_loglik0: float = -9999999.0,
            callback: Callable | None = None) -> AdmmResult:
        """Run the streaming driver loop.

        z0/u0/start_iteration/inner_eps0/mindiff0/best_loglik0 resume from a
        checkpoint (mlease_tpu.utils.checkpoint), exactly as
        AdmmTrainer.run. `callback(iteration=, z=, u=, diffs=, inner_eps=,
        logliks=)` fires per iteration with HOST state (device-consensus
        mode fetches z/u for it — the cost of checkpointing/interop dumps).
        """
        cfg = self.config
        dtype = cfg.dtype
        L, n, N = len(self.lambdas), self.dim, self.nblocks
        if cfg.regularizer not in (1, 2):
            raise ValueError("Only L1 and L2 regularization supported!")

        z = (np.zeros((L, n)) if z0 is None
             else np.broadcast_to(np.asarray(z0, np.float64), (L, n)).copy())
        u_groups = [np.zeros((L, g.nblocks, n)) for g in self.groups]
        if u0 is not None:
            u0 = np.asarray(u0, np.float64)
            off = 0
            for gi, real in enumerate(self.real_nblocks):
                u_groups[gi][:, :real] = u0[:, off:off + real]
                off += real
        inner_eps = (cfg.liblinear_epsilon if inner_eps0 is None
                     else float(inner_eps0))
        mindiff = mindiff0
        best_loglik = best_loglik0
        best_model: LinearModel | None = None
        best_lambda: str | None = None
        loglik_history: list[dict] = []
        diff_history: list[dict] = []
        iter_times: list[float] = []
        # per-iteration (G, 2) newton/cg counters per group — consumed by
        # the pass-floor decomposition (bench.py streaming roofline)
        self.trip_log: list[np.ndarray] = []
        converged = False
        t_start = time.monotonic()
        iteration = start_iteration - 1
        track_ll = self.test_arrays is not None and cfg.test_loglik_per_iter

        dev = self._consensus_device
        if dev:
            z_dev = self._put_r(np.asarray(z, dtype))
            self._u_dev = [self._put_u(np.asarray(u_g, dtype))
                           for u_g in u_groups]
            bv_dev = [self._put_r(np.asarray(bv, dtype))
                      for bv in self.block_valid]
            lam_dev = self._put_r(np.asarray(self.lam_vec, dtype))
            rhob_dev = self._put_r(np.asarray(self.rhos, dtype))

        # iteration-0 loglik when warm-started (RegressionAdmmTrain.java:277-280)
        if z0 is not None and track_ll and start_iteration == 1:
            for lam, ll in zip(self.lambdas, self.sample_loglik(z)):
                loglik_history.append({"lambda": _lambda_key(lam), "iter": 0,
                                       "testLoglik": float(ll)})

        zup_static = dict(regularizer=cfg.regularizer, nblocks=N,
                          intercept_index=self.vocab.intercept_index,
                          penalize_intercept=cfg.penalize_intercept,
                          reference_compat=cfg.reference_l1_compat)

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

            G = len(self.groups)
            if dev:
                # ---- device-resident consensus iteration -------------
                # every dispatch below is async; the single host sync is
                # the (diffs, loglik) scalar fetch at the end
                xsum = usum = None
                trips_per_group = []       # per-group (2,) counters
                x_keep = []
                pending = self._put_group(0, dtype)
                for gi, scale in enumerate(self.eps_scales):
                    arrs = pending
                    indices, values, y, weight, offset, head, present = arrs
                    x_dev, g_trips = self.solver(
                        indices, values, y, weight, offset,
                        head, present, z_dev,
                        self._u_dev[gi], rho_eff,
                        jnp.asarray(inner_eps * scale, dtype))
                    if gi + 1 < len(self.groups):
                        pending = self._put_group(gi + 1, dtype)
                    xs, us = _partial_sums(x_dev, self._u_dev[gi],
                                           bv_dev[gi])
                    xsum = xs if xsum is None else xsum + xs
                    usum = us if usum is None else usum + us
                    trips_per_group.append(g_trips)
                    x_keep.append(x_dev)
                z_new, diffs_dev = _z_update_from_sums(
                    xsum, usum, z_dev, lam_dev, rhob_dev, **zup_static)
                for gi in range(len(self.groups)):
                    self._u_dev[gi] = _u_update_dev(
                        self._u_dev[gi], x_keep[gi], z_new, bv_dev[gi])
                del x_keep
                # float32 unconditionally: a bfloat16 compute dtype would
                # round trip counts above 256 (concatenate promotes);
                # PER-GROUP counters ride the same single scalar fetch
                # (the pass-floor decomposition composes per-group floors
                # by per-group trip counts)
                trips_f = jnp.stack(trips_per_group).astype(
                    jnp.float32).reshape(-1)
                if track_ll:
                    idx, val, yv, wv, offv = self.test_arrays
                    ll_dev = self.loglik_fn(idx, val, yv, wv, offv, z_new)
                    out = np.asarray(
                        jnp.concatenate([diffs_dev, ll_dev, trips_f]),
                        np.float64)
                    diffs, lls = out[:L], out[L:2 * L]
                else:
                    out = np.asarray(
                        jnp.concatenate([diffs_dev, trips_f]), np.float64)
                    diffs, lls = out[:L], None
                trip_mat = out[-2 * G:].reshape(G, 2).astype(np.int64)
                trips = trip_mat.sum(axis=0)
                z_dev = z_new
            else:
                # ---- host-resident consensus iteration ---------------
                z_put = jnp.asarray(z, dtype)
                if self.mesh is not None:
                    z_put = self._put_r(np.asarray(z, dtype))
                xsum_h = np.zeros((L, n))
                usum_h = np.zeros((L, n))
                x_devs = []
                trips_devs = []
                pending = self._put_group(0, dtype)
                for gi, (u_g, scale) in enumerate(zip(u_groups,
                                                      self.eps_scales)):
                    arrs = pending
                    indices, values, y, weight, offset, head, present = arrs
                    u_dev = self._put_u(np.asarray(u_g, dtype))
                    x_dev, g_trips = self.solver(
                        indices, values, y, weight, offset,
                        head, present, z_put, u_dev, rho_eff,
                        jnp.asarray(inner_eps * scale, dtype))
                    trips_devs.append(g_trips)
                    # double buffering: issue the next group's transfer
                    # while the current solve runs; the host syncs ONCE
                    # after the last group
                    if gi + 1 < len(self.groups):
                        pending = self._put_group(gi + 1, dtype)
                    try:
                        x_dev.copy_to_host_async()
                    except Exception:
                        pass
                    x_devs.append(x_dev)
                x_groups = [np.asarray(xd, np.float64) for xd in x_devs]
                for gi, (x, u_g) in enumerate(zip(x_groups, u_groups)):
                    real = self.real_nblocks[gi]  # mesh padding is a suffix
                    xsum_h += x[:, :real].sum(axis=1)
                    usum_h += u_g[:, :real].sum(axis=1)

                v = (xsum_h + usum_h) / N
                # consensus shrinkage uses the BASE rho; adaptation only
                # shapes the x-subproblem (RegressionAdmmTrain.java:368-380
                # vs :648-658)
                v_dev = jnp.asarray(v)
                z_new = np.asarray(_z_update_all(
                    v_dev, jnp.asarray(self.lam_vec),
                    jnp.asarray(self.rhos, v_dev.dtype),
                    **zup_static), z.dtype)
                for x, u_g in zip(x_groups, u_groups):
                    u_g += x - z_new[:, None, :]
                diffs = np.abs(z_new - z).max(axis=1)
                z = z_new
                # one fetch for all groups' counters (the x fetch above was
                # the iteration's sync point, so this adds no extra wait)
                trip_mat = np.asarray(jnp.stack(trips_devs), np.int64)
                trips = trip_mat.sum(axis=0)
                lls = self.sample_loglik(z) if track_ll else None

            self.trip_log.append(trip_mat)
            mindiff = float(diffs.min())
            maxdiff = float(diffs.max())
            diff_history.append({_lambda_key(l): float(d)
                                 for l, d in zip(self.lambdas, diffs)})
            iter_times.append(time.monotonic() - t_iter)
            logger.info(
                "stream iter %d: maxdiff=%g (%.2fs, %d newton / %d cg "
                "trips over %d groups)", iteration, maxdiff, iter_times[-1],
                int(trips[0]), int(trips[1]), len(self.groups))

            # per-iteration sample loglik + best-model tracking
            # (RegressionAdmmTrain.java:766-845)
            if track_ll:
                for li, (lam, ll) in enumerate(zip(self.lambdas, lls)):
                    ll = float(ll)
                    loglik_history.append({"lambda": _lambda_key(lam),
                                           "iter": iteration,
                                           "testLoglik": ll})
                    if ll > best_loglik:
                        best_loglik = ll
                        best_lambda = _lambda_key(lam)
                        z_li = (np.asarray(z_dev[li], np.float64) if dev
                                else z[li])
                        best_model = LinearModel.from_dense(z_li, self.vocab)

            if callback is not None:
                if dev:
                    z_cb = np.asarray(z_dev, np.float64)
                    u_cb = np.concatenate(
                        [np.asarray(ud, np.float64)[:, :real]
                         for ud, real in zip(self._u_dev,
                                             self.real_nblocks)], axis=1)
                else:
                    z_cb = z
                    u_cb = np.concatenate(
                        [u_g[:, :real] for u_g, real
                         in zip(u_groups, self.real_nblocks)], axis=1)
                iter_lls = ([{"lambda": _lambda_key(lam), "iter": iteration,
                              "testLoglik": float(ll)}
                             for lam, ll in zip(self.lambdas, lls)]
                            if lls is not None else None)
                callback(iteration=iteration, z=z_cb, u=u_cb, diffs=diffs,
                         inner_eps=inner_eps, logliks=iter_lls)

            if admm_math.should_stop(maxdiff, inner_eps, cfg.epsilon,
                                     cfg.inner_eps_floor):
                converged = True
                break

        if dev:
            z = np.asarray(z_dev, np.float64)
            u_full = np.concatenate(
                [np.asarray(ud, np.float64)[:, :real]
                 for ud, real in zip(self._u_dev, self.real_nblocks)],
                axis=1)
        else:
            u_full = np.concatenate(
                [u_g[:, :real] for u_g, real
                 in zip(u_groups, self.real_nblocks)], axis=1)
        models = {_lambda_key(l): LinearModel.from_dense(z[i], self.vocab)
                  for i, l in enumerate(self.lambdas)}
        return AdmmResult(models=models, best_model=best_model,
                          best_lambda=best_lambda,
                          best_loglik=best_loglik, iterations=iteration,
                          sample_loglik_history=loglik_history,
                          diff_history=diff_history, z=np.asarray(z),
                          u=u_full,
                          converged=converged, iter_times=iter_times,
                          wall_time=time.monotonic() - t_start)
