"""Pallas kernel: one FULLY-FUSED Gauss-Newton iteration.

The round-1 pipeline still ran four HBM-bound stages per GN iteration at
the shift-stack levels: the Pallas stack accumulation (warped image out to
HBM), an XLA residual pass, the t-IRLS scale/weight passes, and the
normal-equation reduction.  This kernel is the north-star fusion: the
window parity planes, displacements, template, validity and the 6 Jacobian
planes stream HBM -> VMEM exactly once, and EVERYTHING of the iteration —
tent-weighted tap accumulation, residual, the t-distribution scale fixed
point, IRLS weights, and the H(21)/b(6)/err/count reduction — happens from
on-chip memory.  Only 45 scalars per batch element leave the kernel.

This is the TPU answer to the reference GPU backend's main flaw: it read
the full H*W x 6 Jacobian back through unified memory and reduced on the
host EVERY iteration (``/root/reference/src/dense_visual_odometry/core/
robust_dense_visual_odometry/gpu_robust_dense_visual_odometry.py:109-121``).

Semantics notes (vs the XLA path in ``models/robust.py``):

- the t-scale fixed point runs a STATIC number of unrolled steps on ALL
  valid pixels (the XLA path's ``scale_subsample`` exists only to cut HBM
  re-reads; in VMEM the full-resolution statistic is cheaper than any
  subsampling), warm-started from the carried lambda like the XLA path;
- requires a precomputed (inverse-compositional) Jacobian and covers the
  photometric term only; motion prior and depth residuals compose outside
  on the returned 6x6 system exactly as before.

Mosaic constraints honoured (hard-won in round 1, benchmarks/RESULTS.md):
``pltpu.roll`` with non-negative shifts + aligned [0:n] slices instead of
arbitrary lane-offset slicing; tap accumulation through a VMEM ref so
unrolled temporaries don't overflow VMEM; scalar results stored to an SMEM
output row.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dense_visual_odometry_tpu.ops.pallas.stackwarp import (
    prepare_shift_stack,
    residual_displacements,
)

# SMEM output row layout per batch element:
#   [0:36)  H row-major | [36:42) b | 42 err_sum | 43 count | 44 lambda
#   | with illum_bias: 45 s=sum(w) | 46 rho=sum(w r) | [47:53) g=sum(w J)
_OUT_COLS = 56


def _fused_kernel(
    radius: int,
    hp: int,
    wp: int,
    stride: int,
    dof: float,
    unroll: int,
    use_tweights: bool,
    normalize_scale: bool,
    illum_bias: bool,
):
    def kernel(
        planes_ref, du_ref, dv_ref, gray_ref, valid_ref, jac_ref, lam_ref,
        out_ref, acc_ref,
    ):
        # lam/out are FULL-array SMEM blocks (Mosaic requires SMEM block
        # dims to equal the array's); this grid step owns row `bi`.
        bi = pl.program_id(0)
        du = du_ref[0]
        dv = dv_ref[0]
        ph = planes_ref.shape[-2]
        pw = planes_ref.shape[-1]
        acc_ref[...] = jnp.zeros((hp, wp), jnp.float32)
        # Tent-weighted tap accumulation (identical to stackwarp's kernel):
        # accumulate through the ref — without the memory round-trip the
        # compiler keeps all (2r+1)^2 shifted temporaries live and
        # overflows VMEM at full-image extents.
        for ky in range(-radius, radius + 1):
            a = radius + ky
            pa = a % stride
            qa = a // stride
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(dv - ky))
            for pb in range(stride):
                plane_idx = pa * stride + pb
                row = pltpu.roll(
                    planes_ref[0, plane_idx], (ph - qa) % ph, axis=0
                )
                for kx in range(-radius, radius + 1):
                    b = radius + kx
                    if b % stride != pb:
                        continue
                    qb = b // stride
                    shifted = pltpu.roll(row, (pw - qb) % pw, axis=1)[:hp, :wp]
                    wx = jnp.maximum(0.0, 1.0 - jnp.abs(du - kx))
                    acc_ref[...] = acc_ref[...] + (wy * wx) * shifted

        valid = valid_ref[0]
        # where (not multiply): invalid pixels can carry non-finite
        # accumulator values and NaN * 0 == NaN.
        res = jnp.where(valid > 0.0, acc_ref[...] - gray_ref[0], 0.0)
        count = jnp.sum(valid)
        count_safe = jnp.maximum(count, 1.0)
        if illum_bias:
            # Valid-mean centering before the t-scale (res is already 0
            # on invalid pixels), mirroring models/robust.py's bias
            # pre-centering; the host applies the exact weighted Schur
            # elimination on the reduced scalars emitted below.
            mu0 = jnp.sum(res) / count_safe
            res = jnp.where(valid > 0.0, res - mu0, 0.0)
        rsq = res * res

        lam = lam_ref[bi, 0]
        if use_tweights:
            dofc = jnp.float32(dof)
            for _ in range(unroll):
                w_est = (dofc + 1.0) / (dofc + rsq * lam)
                sigma_sq = jnp.sum(valid * rsq * w_est)
                if normalize_scale:
                    sigma_sq = sigma_sq / count_safe
                lam = 1.0 / jnp.maximum(sigma_sq, 1e-20)
            weights = valid * (dofc + 1.0) / (dofc + rsq * lam)
        else:
            weights = valid

        jw = [jac_ref[0, i] * weights for i in range(6)]
        for i in range(6):
            for j in range(i, 6):
                hij = jnp.sum(jw[i] * jac_ref[0, j])
                out_ref[bi, i * 6 + j] = hij
                if i != j:
                    out_ref[bi, j * 6 + i] = hij
        for i in range(6):
            out_ref[bi, 36 + i] = -jnp.sum(jw[i] * res)
        out_ref[bi, 42] = jnp.sum(weights * rsq)
        out_ref[bi, 43] = count
        out_ref[bi, 44] = lam
        if illum_bias:
            out_ref[bi, 45] = jnp.sum(weights)
            out_ref[bi, 46] = jnp.sum(weights * res)
            for i in range(6):
                out_ref[bi, 47 + i] = jnp.sum(jw[i])
            for k in range(53, _OUT_COLS):
                out_ref[bi, k] = 0.0
        else:
            for k in range(45, _OUT_COLS):
                out_ref[bi, k] = 0.0

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius", "grid_stride", "dof", "unroll", "use_tweights",
        "normalize_scale", "illum_bias", "interpret",
    ),
)
def fused_iteration_pallas(
    planes: jnp.ndarray,
    du: jnp.ndarray,
    dv: jnp.ndarray,
    gray_prev: jnp.ndarray,
    valid: jnp.ndarray,
    jac_planes: jnp.ndarray,
    lam0: jnp.ndarray,
    radius: int,
    grid_stride: int = 1,
    dof: float = 5.0,
    unroll: int = 3,
    use_tweights: bool = True,
    normalize_scale: bool = True,
    illum_bias: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the fused iteration kernel over a (B,)-grid.

    planes : (B, s^2, ph, pw) f32 parity-split recentered windows.
    du, dv : (B, H', W') f32 recentered residual displacements.
    gray_prev : (B, H', W') f32 template intensities (strided grid).
    valid : (B, H', W') f32 {0, 1} full validity mask.
    jac_planes : (B, 6, H', W') f32 precomputed Jacobian columns.
    lam0 : (B, 1) f32 warm-start IRLS 1/sigma^2.
    -> (B, _OUT_COLS) f32 rows [H(36) | b(6) | err_sum | count | lambda].
    """
    b, _, ph, pw = planes.shape
    hp, wp = du.shape[-2], du.shape[-1]
    kernel = _fused_kernel(
        radius, hp, wp, grid_stride, dof, unroll, use_tweights,
        normalize_scale, illum_bias,
    )
    grid_plane = lambda i: (i, 0, 0)  # noqa: E731
    img_spec = lambda: pl.BlockSpec(  # noqa: E731
        (1, hp, wp), grid_plane, memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, grid_stride * grid_stride, ph, pw),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            img_spec(),
            img_spec(),
            img_spec(),
            img_spec(),
            pl.BlockSpec(
                (1, 6, hp, wp), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # SMEM blocks must span the full array; rows are selected by
            # program_id inside the kernel.
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (b, _OUT_COLS), lambda i: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, _OUT_COLS), jnp.float32),
        scratch_shapes=[pltpu.VMEM((hp, wp), jnp.float32)],
        # The tap loop keeps many full-plane f32 temporaries on Mosaic's
        # scoped stack; measured need at the level-0 grid inside the
        # B=128 program is 54.1 MB (compile error without this).  The
        # v5e has 128 MB VMEM/core; grant 96 MiB of headroom.
        compiler_params=(
            None
            if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
        ),
        interpret=interpret,
    )(planes, du, dv, gray_prev, valid, jac_planes, lam0)


def fused_shift_iteration(
    gray_prev: jnp.ndarray,
    gray_curr: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    valid_geom: jnp.ndarray,
    jacobian: jnp.ndarray | None = None,
    lam0: jnp.ndarray = None,
    radius: int = 4,
    grid_stride: int = 1,
    dof: float = 5.0,
    unroll: int = 3,
    use_tweights: bool = True,
    normalize_scale: bool = True,
    illum_bias: bool = False,
    interpret: bool = False,
    jacobian_planes: jnp.ndarray | None = None,
    frozen: (
        Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None
    ) = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused photometric GN iteration at a shift-stack level.

    gray_prev (..., H', W') template; gray_curr (..., H, W) current image;
    u, v (..., H', W') warp coordinates; valid_geom (..., H', W') bool;
    jacobian (..., H', W', 6) precomputed; lam0 (...) warm IRLS lambda.
    ``jacobian_planes`` (..., 6, H', W') may be passed INSTEAD of
    ``jacobian`` — the kernel consumes planes, and relaying a trailing-6
    array out to planes costs more than the kernel itself (the 6-wide
    minor axis tiles at ~95% padding); producers on the hot path should
    build planes directly (``ops.residuals.approximate_jacobian_planes``).

    ``frozen`` = (planes (..., s^2, ph, pw), cu (...,), cv (...,)) skips
    the per-call recentering + window extraction + parity split: the
    caller extracted the window ONCE (e.g. at the level's starting
    estimate) and every iteration reuses it, paying only the displacement
    math.  The estimate's drift within a level is subpixel, so the frozen
    ball loses only pixels that were already at the ball boundary (they
    are masked invalid exactly like any out-of-ball pixel).

    Returns (hessian (..., 6, 6), rhs (..., 6), error_mean (...),
    count (...), lam (...)).
    """
    if (jacobian is None) == (jacobian_planes is None):
        raise ValueError("pass exactly one of jacobian / jacobian_planes")
    if jax.default_backend() != "tpu":
        interpret = True
    squeeze = gray_curr.ndim == 2
    if squeeze:
        gray_prev, gray_curr, u, v = (
            gray_prev[None], gray_curr[None], u[None], v[None]
        )
        valid_geom = valid_geom[None]
        if jacobian is not None:
            jacobian = jacobian[None]
        else:
            jacobian_planes = jacobian_planes[None]
        lam0 = jnp.asarray(lam0)[None]
        if frozen is not None:
            frozen = tuple(jnp.asarray(x)[None] for x in frozen)
    batch_shape = gray_curr.shape[:-2]
    if len(batch_shape) != 1:
        # Flatten arbitrary leading dims onto the kernel grid.
        flat = lambda x: x.reshape((-1,) + x.shape[len(batch_shape):])  # noqa: E731
        gray_prev = flat(gray_prev)
        gray_curr = flat(gray_curr)
        u, v = flat(u), flat(v)
        valid_geom = flat(valid_geom)
        if jacobian is not None:
            jacobian = flat(jacobian)
        else:
            jacobian_planes = flat(jacobian_planes)
        lam0 = jnp.broadcast_to(lam0, batch_shape).reshape(-1)
        if frozen is not None:
            fp, fcu, fcv = frozen
            frozen = (
                fp.reshape((-1,) + fp.shape[len(batch_shape):]),
                jnp.broadcast_to(fcu, batch_shape).reshape(-1),
                jnp.broadcast_to(fcv, batch_shape).reshape(-1),
            )
    if jacobian_planes is None:
        jacobian_planes = jnp.moveaxis(jacobian, -1, 1)

    if frozen is not None:
        planes, cu, cv = frozen
        du, dv, valid = residual_displacements(
            u, v, cu, cv, radius, grid_stride,
            gray_curr.shape[-2], gray_curr.shape[-1],
        )
    else:
        planes, du, dv, valid = prepare_shift_stack(
            gray_curr, u, v, radius=radius, grid_stride=grid_stride,
            coord_mask=valid_geom,
        )
    valid = valid & valid_geom
    out = fused_iteration_pallas(
        planes, du, dv,
        gray_prev.astype(jnp.float32),
        valid.astype(jnp.float32),
        jacobian_planes.astype(jnp.float32),
        jnp.asarray(lam0, jnp.float32).reshape(-1, 1),
        radius=radius, grid_stride=grid_stride, dof=dof, unroll=unroll,
        use_tweights=use_tweights, normalize_scale=normalize_scale,
        illum_bias=illum_bias, interpret=interpret,
    )
    hess = out[:, :36].reshape(-1, 6, 6)
    rhs = out[:, 36:42]
    count = out[:, 43]
    err_sum = out[:, 42]
    if illum_bias:
        # Exact per-iteration Schur elimination of the exposure-bias
        # unknown on the kernel's reduced scalars (models/robust.
        # _bias_schur algebra): H' = H - g g^T/s, b' = b + g rho/s,
        # err' = err - rho^2/s.
        s = out[:, 45]
        rho = out[:, 46]
        g = out[:, 47:53]
        s_safe = jnp.maximum(s, 1e-6)
        hess = hess - g[:, :, None] * g[:, None, :] / s_safe[:, None, None]
        rhs = rhs + g * (rho / s_safe)[:, None]
        err_sum = err_sum - rho * rho / s_safe
    err = err_sum / jnp.maximum(count, 1.0)
    lam = out[:, 44]
    if squeeze:
        return hess[0], rhs[0], err[0], count[0], lam[0]
    if len(batch_shape) != 1:
        hess = hess.reshape(batch_shape + (6, 6))
        rhs = rhs.reshape(batch_shape + (6,))
        err = err.reshape(batch_shape)
        count = count.reshape(batch_shape)
        lam = lam.reshape(batch_shape)
    return hess, rhs, err, count, lam
