"""Pallas kernel: fused weighted normal-equation reduction.

Computes H = J^T W J (6x6), b = -J^T W r (6), err = sum(w r^2), count =
sum(valid) for one batch of pixel grids — the per-iteration reduction of
the Gauss-Newton solve (reference: done on the *host* per iteration,
``base_robust_dvo.py:187-188`` + ``gpu_…py:118-121``; XLA twin:
``ops/residuals.normal_equations``).

Kernel design (TPU):

- grid over (batch, row-tiles); each step streams a ``(TILE_H, W)`` slab
  of residuals/weights/valid and the matching ``(TILE_H, W, 6)`` Jacobian
  slab HBM -> VMEM through the pallas pipeline;
- the 21 unique entries of the symmetric 6x6 H are computed as fused
  VPU multiply-reduces over the slab — for 6-column Jacobians this beats
  an MXU path, which would need padding 6 -> 128 lanes (95% wasted MACs);
- partial results accumulate in a f32 VMEM scratch across row-tiles and
  are flushed to the per-batch output on the last tile, so the output is
  deterministic (fixed reduction order) and only 44 floats per batch
  element leave the kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dense_visual_odometry_tpu.ops.residuals import ResidualSystem

# Output layout: row 0: 36 entries of H (row-major) | rows padded to the
# f32 tile; col layout [h00..h55, b0..b5, err, count, pad...].
_OUT_COLS = 128  # one lane row: 36 + 6 + 2 = 44 used, padded to lane width


def _reduction_kernel(res_ref, wts_ref, valid_ref, jac_ref, out_ref, acc_ref):
    """One (batch, row-tile) step.

    res/wts/valid : (TILE_H, W) f32 slabs.
    jac : (6, TILE_H, W) f32 slab (column-major Jacobian planes).
    out : (1, _OUT_COLS) f32 per-batch output row.
    acc : (1, _OUT_COLS) f32 VMEM scratch persisting across row-tiles.
    """
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(t == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    res = res_ref[...]
    wts = wts_ref[...]
    valid = valid_ref[...]

    jw = [jac_ref[i] * wts for i in range(6)]
    jc = [jac_ref[i] for i in range(6)]

    # Symmetric H: 21 unique fused multiply-reduces on the VPU.
    vals = []
    flat_idx = {}
    for i in range(6):
        for j in range(i, 6):
            flat_idx[(i, j)] = len(vals)
            vals.append(jnp.sum(jw[i] * jc[j]))
    b = [-jnp.sum(jw[i] * res) for i in range(6)]
    err = jnp.sum(wts * res * res)
    cnt = jnp.sum(valid)

    # Scatter the 21 unique values into the 36-entry row-major H block.
    row = jnp.zeros((_OUT_COLS,), jnp.float32)
    for i in range(6):
        for j in range(6):
            v = vals[flat_idx[(i, j)] if i <= j else flat_idx[(j, i)]]
            row = row.at[i * 6 + j].set(v)
    for i in range(6):
        row = row.at[36 + i].set(b[i])
    row = row.at[42].set(err)
    row = row.at[43].set(cnt)

    acc_ref[...] = acc_ref[...] + row[None, :]

    @pl.when(t == n_tiles - 1)
    def _flush():
        out_ref[...] = acc_ref[...]


def _pick_tile(h: int) -> int:
    for cand in (64, 32, 16, 8):
        if h % cand == 0:
            return cand
    return h


@functools.partial(jax.jit, static_argnames=("interpret",))
def normal_equations_pallas(
    residuals: jnp.ndarray,
    jacobian: jnp.ndarray,
    weights: jnp.ndarray,
    valid: jnp.ndarray,
    interpret: bool = False,
) -> ResidualSystem:
    """Pallas twin of ``ops.residuals.normal_equations``.

    residuals/weights/valid : (B, H, W); jacobian : (B, H, W, 6).
    Returns the same ``ResidualSystem`` (hessian (B,6,6), rhs (B,6),
    error (B,), count (B,)).
    """
    squeeze = residuals.ndim == 2
    if squeeze:
        residuals, jacobian, weights, valid = (
            residuals[None], jacobian[None], weights[None], valid[None]
        )
    b, h, w = residuals.shape
    tile = _pick_tile(h)
    n_tiles = h // tile

    # Jacobian as 6 planes: (B, 6, H, W) so each plane is a clean slab.
    jac_planes = jnp.moveaxis(jacobian, -1, 1)
    validf = valid.astype(jnp.float32)

    grid = (b, n_tiles)
    slab = lambda: pl.BlockSpec(  # noqa: E731
        (1, tile, w), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _kernel_entry,
        grid=grid,
        in_specs=[
            slab(),
            slab(),
            slab(),
            pl.BlockSpec(
                (1, 6, tile, w), lambda bi, ti: (bi, 0, ti, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, _OUT_COLS), lambda bi, ti: (bi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, _OUT_COLS), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, _OUT_COLS), jnp.float32)],
        interpret=interpret,
    )(residuals, weights, validf, jac_planes)

    hess = out[:, :36].reshape(b, 6, 6)
    rhs = out[:, 36:42]
    err_sum = out[:, 42]
    count = out[:, 43]
    error = err_sum / jnp.maximum(count, 1.0)
    if squeeze:
        hess, rhs, error, count = hess[0], rhs[0], error[0], count[0]
    return ResidualSystem(hessian=hess, rhs=rhs, error=error, count=count)


def _kernel_entry(res_ref, wts_ref, valid_ref, jac_ref, out_ref, acc_ref):
    # Blocks come in with a leading singleton batch dim; strip it.
    _reduction_kernel(
        res_ref.at[0], wts_ref.at[0], valid_ref.at[0], jac_ref.at[0],
        out_ref, acc_ref,
    )
