"""Pallas TPU kernel: weighted Gram matrix G = X' diag(D) X + diag(P).

The per-block/per-item Newton step and the Laplace posterior covariance both
need the weighted Gram (reference: LogisticRegressionL2.hessian,
src/main/java/com/linkedin/mlease/regression/liblinearfunc/LogisticRegressionL2.java:258-297,
consumed by the Cholesky solve in LibLinear.java:317-327). The reference
builds it with a triple Java loop over sparse rows; here it is a tiled MXU
contraction: the row dimension R streams through VMEM in TILE_R chunks, each
chunk contributing X_tile' (D_tile * X_tile) via one 128x128-systolic matmul,
accumulated in a VMEM f32 scratch across the grid.

For small F (the per-item path) XLA's einsum is already near-optimal; this
kernel guarantees f32 accumulation regardless of input dtype (bf16 inputs
ride the MXU natively).

HARDWARE VERDICT (v5e, round 2 — win-or-delete measurement): parity with the
XLA `jnp.dot(x.T * d, x)` baseline, not a win. f32: 10.32 vs 10.35 ms at
R=131072, F=512 (4.78 vs 4.99 ms at F=256, tile_r=1024); bf16-in/f32-acc:
8.59 vs 8.72 ms. XLA already streams row tiles through the MXU optimally for
this contraction, so the kernel stays in-tree as a tested reference
implementation (and the guaranteed-f32-accumulation variant for bf16
inputs), NOT as a production fast path. `ops/pallas/tile_sum.py` reached the
same conclusion vs `jax.ops.segment_sum` (see its docstring / ROADMAP.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gram_kernel(x_ref, d_ref, out_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]                                   # (TILE_R, F)
    xd = x * d_ref[:]                              # weight rows by D
    # f32 inputs: HIGHEST precision (TPU f32 matmul runs as multi-pass bf16
    # on the MXU; the default single pass loses ~3 decimal digits on the
    # Gram entries). bf16 inputs ride the MXU natively with f32 accumulation
    # (Mosaic rejects HIGHEST on bf16 operands).
    precision = (None if x.dtype == jnp.bfloat16
                 else jax.lax.Precision.HIGHEST)
    acc_ref[:] += jax.lax.dot_general(
        x, xd, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)                       # (F, F) via MXU

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("tile_r", "interpret"))
def gram_matrix(x: jax.Array, d: jax.Array, prior_var_inv: jax.Array | None = None,
                *, tile_r: int = 256, interpret: bool = False) -> jax.Array:
    """G = x' diag(d) x (+ diag(prior_var_inv)) with f32 accumulation.

    x: (R, F) dense design matrix (f32 or bf16), d: (R,) curvature weights.
    R is padded to a tile multiple internally (padding rows carry d=0).
    """
    R, F = x.shape
    tile_r = min(tile_r, max(8, R))
    pad = (-R) % tile_r
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, F), x.dtype)], axis=0)
        d = jnp.concatenate([d, jnp.zeros((pad,), d.dtype)], axis=0)
    Rp = x.shape[0]

    out = pl.pallas_call(
        _gram_kernel,
        out_shape=jax.ShapeDtypeStruct((F, F), jnp.float32),
        grid=(Rp // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F, F), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((F, F), jnp.float32)],
        interpret=interpret,
    )(x, d[:, None].astype(x.dtype))
    if prior_var_inv is not None:
        out = out + jnp.diag(prior_var_inv.astype(jnp.float32))
    return out


def gram_batched(x: jax.Array, d: jax.Array, prior_var_inv: jax.Array,
                 *, tile_r: int = 256, interpret: bool = False) -> jax.Array:
    """vmap over a leading batch axis: x (B, R, F), d (B, R), pvi (B, F)."""
    return jax.vmap(lambda xx, dd, pp: gram_matrix(
        xx, dd, pp, tile_r=tile_r, interpret=interpret))(x, d, prior_var_inv)
