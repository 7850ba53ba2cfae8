"""The hot op: photometric residuals + 6-DoF Jacobian + normal equations.

This is the TPU-native redesign of the reference's per-iteration pixel pass:

- CPU reference: deproject -> transform -> project -> bilinear -> residual
  with separate Numba kernels and boolean compaction
  (``cpu_robust_dense_visual_odometry.py:134-254``).
- CUDA reference: one fused per-pixel kernel, but the full H*W x 6 Jacobian
  is read back through unified memory and reduced on the host every
  iteration (``gpu_robust_dense_visual_odometry.py:109-121`` — its main
  scalability flaw, SURVEY §3.4).

Here: one fused XLA computation over the dense pixel grid, fixed shapes,
validity masks instead of compaction, and the J^T W J / J^T W r reduction
happens on-device as a (N,6)^T @ (N,6) MXU contraction.  Only the 6x6
system leaves the op.

Every function is **natively batched over leading dims** — (B, H, W) images
with (B, 3, 3) intrinsics and (B, 4, 4) transforms run as one fused
program over the whole batch.  This replaces ``vmap``-of-control-flow
(which multiplies XLA compile cost) with plain bigger tensors, the shape
TPUs want.

Jacobian convention (matches the reference math, ``utils/jacobian.py:39-42``):
for the left-multiplicative update ``T <- exp(delta) @ T`` the 2x6 warp
Jacobian J_w is evaluated at the *transformed* point X' = T X (the CUDA
kernel does this correctly; the CPU path evaluates at X — SURVEY quirk).
Twist layout (upsilon, phi) = translation first.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from dense_visual_odometry_tpu.ops.interp import bilinear_sample


class ResidualSystem(NamedTuple):
    """Per-level linearized system and diagnostics (batched over ...)."""

    hessian: jnp.ndarray  # (..., 6, 6)  J^T W J
    rhs: jnp.ndarray  # (..., 6)  -J^T W r
    error: jnp.ndarray  # (...,): mean weighted squared residual
    count: jnp.ndarray  # (...,): number of valid pixels (f32)


def deproject_grid(
    depth_m: jnp.ndarray, intrinsics: jnp.ndarray, grid_stride: int = 1
) -> jnp.ndarray:
    """Dense camera-frame points from metric depth: (..., H, W) -> (..., H, W, 3).

    ``grid_stride`` declares that ``depth_m`` is a stride-s subsampling of
    the full-resolution grid: pixel (i, j) sits at full-res coordinates
    (s*j, s*i) and the intrinsics refer to the full-res grid.
    """
    h, w = depth_m.shape[-2], depth_m.shape[-1]
    k_inv = jnp.linalg.inv(intrinsics)
    u = jnp.arange(w, dtype=jnp.float32) * grid_stride
    v = jnp.arange(h, dtype=jnp.float32) * grid_stride

    def coef(i, j):
        return k_inv[..., i, j][..., None, None]

    ray_x = coef(0, 0) * u[None, :] + coef(0, 1) * v[:, None] + coef(0, 2)
    ray_y = coef(1, 0) * u[None, :] + coef(1, 1) * v[:, None] + coef(1, 2)
    x = ray_x * depth_m
    y = ray_y * depth_m
    return jnp.stack([x, y, depth_m], axis=-1)


def warp_jacobian_times_grad(
    points: jnp.ndarray,
    grad_x: jnp.ndarray,
    grad_y: jnp.ndarray,
    fx: jnp.ndarray,
    fy: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Rows of the 1x6 residual Jacobian: grad^T @ J_w, evaluated per pixel.

    points : (..., H, W, 3) 3-D points at which J_w is evaluated.
    grad_x/grad_y : (..., H, W) image gradient samples.
    fx, fy : (...,) focal lengths (scalars or per-batch).
    -> (..., H, W, 6) float32, zeroed where ``valid`` is False.

    Closed form (reference utils/jacobian.py:39-42):
      row_x = fx * [1/z, 0, -x/z^2, -xy/z^2, 1 + x^2/z^2, -y/z]
      row_y = fy * [0, 1/z, -y/z^2, -(1 + y^2/z^2), xy/z^2, x/z]
    """
    jac = jnp.stack(
        _jacobian_components(points, grad_x, grad_y, fx, fy, valid), axis=-1
    )
    return jnp.where(valid[..., None], jac, 0.0)


def _jacobian_components(points, grad_x, grad_y, fx, fy, valid):
    """The six per-pixel entries of grad^T @ J_w as a list of planes."""
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    z_safe = jnp.where(valid, z, 1.0)
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z
    fx = jnp.asarray(fx)[..., None, None]
    fy = jnp.asarray(fy)[..., None, None]
    gx = grad_x * fx
    gy = grad_y * fy

    j0 = gx * inv_z
    j1 = gy * inv_z
    j2 = -(gx * x + gy * y) * inv_z2
    j3 = -gx * x * y * inv_z2 - gy * (1.0 + y * y * inv_z2)
    j4 = gx * (1.0 + x * x * inv_z2) + gy * x * y * inv_z2
    j5 = -gx * y * inv_z + gy * x * inv_z
    return [j0, j1, j2, j3, j4, j5]


def _warp_geometry(depth_prev_m, intrinsics, transform, grid_stride=1):
    """Shared geometry: deproject -> transform -> project.

    -> (pts_t (..., H, W, 3), u, v, valid_geom) where u/v are full-res
    subpixel sample coordinates in the current image.
    """
    points = deproject_grid(depth_prev_m, intrinsics, grid_stride)
    depth_valid = depth_prev_m > 0.0

    rot = transform[..., :3, :3]
    tvec = transform[..., :3, 3]
    pts_t = jnp.einsum("...ij,...hwj->...hwi", rot, points) + tvec[..., None, None, :]

    zc = pts_t[..., 2]
    in_front = zc > 1e-6
    z_safe = jnp.where(in_front, zc, 1.0)

    def k(i, j):
        return intrinsics[..., i, j][..., None, None]

    # Skew-free pinhole projection: the closed-form warp Jacobian
    # (warp_jacobian_times_grad) assumes K[0,1] == 0, so the projection
    # must match or residuals and descent direction disagree.  Real RGB-D
    # intrinsics have zero skew; a nonzero K[0,1] is ignored here.
    u = (k(0, 0) * pts_t[..., 0] + k(0, 2) * zc) / z_safe
    v = (k(1, 1) * pts_t[..., 1] + k(1, 2) * zc) / z_safe
    return pts_t, u, v, depth_valid & in_front


def warp_residuals(
    gray_prev: jnp.ndarray,
    depth_prev_m: jnp.ndarray,
    gray_curr: jnp.ndarray,
    intrinsics: jnp.ndarray,
    transform: jnp.ndarray,
    grad_x_curr: Optional[jnp.ndarray] = None,
    grad_y_curr: Optional[jnp.ndarray] = None,
    precomputed_jacobian: Optional[jnp.ndarray] = None,
    grid_stride: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense photometric residuals + Jacobian for one pyramid level.

    All image arguments (..., H, W); ``intrinsics`` (..., 3, 3);
    ``transform`` (..., 4, 4).  Exactly one of (grad_x_curr/grad_y_curr)
    or ``precomputed_jacobian`` must be given:

    - gradients of the *current* image -> exact mode: sample grad I2 at the
      warped coordinates, J_w at the transformed points (reference
      ``approximate_image2_gradient=False`` path, done right).
    - ``precomputed_jacobian`` (..., H, W, 6) -> approximate/inverse-
      compositional mode: constant J from the previous frame's gradients
      (reference ``_setup`` precompute, cpu_…py:60-77).

    ``grid_stride`` > 1 evaluates residuals on a stride-s subsampling of
    the previous frame's pixel grid (gray_prev/depth_prev_m and the
    precomputed Jacobian already subsampled by the caller); the current
    image is always sampled at full resolution.

    Returns (residuals (..., H, W), jacobian (..., H, W, 6), valid bool),
    with residuals/jacobian zeroed outside ``valid``.
    """
    pts_t, u, v, valid_geom = _warp_geometry(
        depth_prev_m, intrinsics, transform, grid_stride
    )
    warped_intensity, warp_ok = bilinear_sample(gray_curr, u, v)
    valid = valid_geom & warp_ok

    residuals = jnp.where(valid, warped_intensity - gray_prev, 0.0)

    if precomputed_jacobian is not None:
        jacobian = jnp.where(valid[..., None], precomputed_jacobian, 0.0)
    else:
        gx, _ = bilinear_sample(grad_x_curr, u, v)
        gy, _ = bilinear_sample(grad_y_curr, u, v)
        jacobian = warp_jacobian_times_grad(
            pts_t, gx, gy, intrinsics[..., 0, 0], intrinsics[..., 1, 1], valid
        )

    return residuals, jacobian, valid


def warp_residuals_packed(
    gray_prev: jnp.ndarray,
    depth_prev_m: jnp.ndarray,
    gray_curr_packed: jnp.ndarray,
    intrinsics: jnp.ndarray,
    transform: jnp.ndarray,
    grads_packed: Optional[jnp.ndarray] = None,
    precomputed_jacobian: Optional[jnp.ndarray] = None,
    grid_stride: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gather-optimized variant of :func:`warp_residuals` for TPU.

    XLA TPU gathers cost per *index* (~8 ns each, element width free), so
    this path packs two f16 values per int32 element to halve the gather
    count: ``gray_curr_packed`` = horizontal-neighbor pairs
    (``interp.pack_neighbors``) sampled bilinearly with 2 gathers (vs 4);
    ``grads_packed`` = (gx, gy) pairs (``interp.pack_pair_f16``) sampled
    nearest-neighbour with 1 gather (vs 8 for two bilinears — image
    gradients are smooth, so NN sampling perturbs J negligibly; the
    reference GPU kernel likewise approximates gradient sampling,
    residuals_kernel.py:81-83).  f16 taps are exact for 8-bit intensities.
    """
    from dense_visual_odometry_tpu.ops.interp import (
        bilinear_sample_packed,
        nearest_sample_packed,
    )

    pts_t, u, v, valid_geom = _warp_geometry(
        depth_prev_m, intrinsics, transform, grid_stride
    )
    warped_intensity, warp_ok = bilinear_sample_packed(gray_curr_packed, u, v)
    valid = valid_geom & warp_ok

    residuals = jnp.where(valid, warped_intensity - gray_prev, 0.0)

    if precomputed_jacobian is not None:
        jacobian = jnp.where(valid[..., None], precomputed_jacobian, 0.0)
    else:
        gx, gy, _ = nearest_sample_packed(grads_packed, u, v)
        jacobian = warp_jacobian_times_grad(
            pts_t, gx, gy, intrinsics[..., 0, 0], intrinsics[..., 1, 1], valid
        )

    return residuals, jacobian, valid


def warp_residuals_shift(
    gray_prev: jnp.ndarray,
    depth_prev_m: jnp.ndarray,
    gray_curr: jnp.ndarray,
    intrinsics: jnp.ndarray,
    transform: jnp.ndarray,
    grads_packed: Optional[jnp.ndarray] = None,
    precomputed_jacobian: Optional[jnp.ndarray] = None,
    grid_stride: int = 1,
    radius: int = 3,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gather-free variant: the current image is sampled by a shift stack
    (``ops.shiftwarp``) — zero gather indices, valid while the warp
    displacement stays within ``radius`` full-res pixels.  Gradients (when
    not using a precomputed Jacobian) come from the packed plane with one
    nearest-neighbour gather.  ``use_pallas`` swaps in the fused Pallas
    accumulation kernel (same results; far faster to compile on TPU).
    """
    from dense_visual_odometry_tpu.ops.interp import nearest_sample_packed
    from dense_visual_odometry_tpu.ops.shiftwarp import shift_stack_sample

    pts_t, u, v, valid_geom = _warp_geometry(
        depth_prev_m, intrinsics, transform, grid_stride
    )
    if use_pallas:
        from dense_visual_odometry_tpu.ops.pallas.stackwarp import (
            shift_stack_sample_pallas,
        )

        warped_intensity, warp_ok = shift_stack_sample_pallas(
            gray_curr, u, v, radius=radius, grid_stride=grid_stride,
            coord_mask=valid_geom,
        )
    else:
        warped_intensity, warp_ok = shift_stack_sample(
            gray_curr, u, v, radius=radius, grid_stride=grid_stride,
            coord_mask=valid_geom,
        )
    valid = valid_geom & warp_ok

    residuals = jnp.where(valid, warped_intensity - gray_prev, 0.0)

    if precomputed_jacobian is not None:
        jacobian = jnp.where(valid[..., None], precomputed_jacobian, 0.0)
    else:
        gx, gy, _ = nearest_sample_packed(grads_packed, u, v)
        jacobian = warp_jacobian_times_grad(
            pts_t, gx, gy, intrinsics[..., 0, 0], intrinsics[..., 1, 1], valid
        )

    return residuals, jacobian, valid


def approximate_jacobian(
    gray_prev: jnp.ndarray,
    depth_prev_m: jnp.ndarray,
    intrinsics: jnp.ndarray,
    grad_x_prev: jnp.ndarray,
    grad_y_prev: jnp.ndarray,
) -> jnp.ndarray:
    """Constant residual Jacobian from previous-frame gradients.

    grad I2(w(x)) ~= grad I1(x), J_w at the untransformed points: estimate
    independent, so it is hoisted out of the Gauss-Newton loop (reference
    cpu_…py:60-77).
    """
    points = deproject_grid(depth_prev_m, intrinsics)
    valid = depth_prev_m > 0.0
    return warp_jacobian_times_grad(
        points, grad_x_prev, grad_y_prev,
        intrinsics[..., 0, 0], intrinsics[..., 1, 1], valid,
    )


def approximate_jacobian_planes(
    depth_prev_m: jnp.ndarray,
    intrinsics: jnp.ndarray,
    grad_x_prev: jnp.ndarray,
    grad_y_prev: jnp.ndarray,
    grid_stride: int = 1,
) -> jnp.ndarray:
    """:func:`approximate_jacobian` emitted as 6 LEADING planes.

    Inputs are already on the stride-``grid_stride`` grid; output is
    (..., 6, H', W').  Two TPU reasons to prefer this over the trailing-6
    layout: (1) a 6-wide minor axis occupies (8, 128) native tiles at
    ~95% padding, and relaying it out to planes for the fused kernel
    costs more than the kernel itself (measured ~16 ms/batch-32 at
    level 0); (2) computing directly on the strided grid skips the 3/4
    of full-resolution work the slice would discard.
    """
    points = deproject_grid(depth_prev_m, intrinsics, grid_stride)
    valid = depth_prev_m > 0.0
    jac = jnp.stack(
        _jacobian_components(
            points, grad_x_prev, grad_y_prev,
            intrinsics[..., 0, 0], intrinsics[..., 1, 1], valid,
        ),
        axis=-3,
    )
    return jnp.where(valid[..., None, :, :], jac, 0.0)


def depth_residuals(
    depth_prev_m: jnp.ndarray,
    depth_curr_m: jnp.ndarray,
    intrinsics: jnp.ndarray,
    transform: jnp.ndarray,
    grad_zx_prev: jnp.ndarray,
    grad_zy_prev: jnp.ndarray,
    grid_stride: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Geometric residuals: measured vs predicted depth at the warp.

    Beyond-reference capability (the reference is photometric-only;
    north-star "photometric/depth alignment"): for each valid pixel,

        r_z(p) = Z2(w(p)) - [T X(p)]_z        (meters)

    with the analytic Jacobian  d r_z / d xi = grad Z . J_w - J_z  where
    ``J_z = [0, 0, 1, y', -x', 0]`` (z-row of d(TX)/d xi at X' = TX) and
    the warped depth-map gradient is approximated by the previous frame's
    (precomputed, estimate-independent — same approximation as the
    inverse-compositional photometric path).

    Returns (residuals (..., H, W) meters, jacobian (..., H, W, 6),
    valid); rows with invalid depth in either frame are zeroed.
    """
    pts_t, u, v, valid_geom = _warp_geometry(
        depth_prev_m, intrinsics, transform, grid_stride
    )
    z_meas, warp_ok = bilinear_sample(depth_curr_m, u, v)
    # Zero depth marks invalid pixels in the current frame too.
    valid = valid_geom & warp_ok & (z_meas > 0.0)

    z_pred = pts_t[..., 2]
    residuals = jnp.where(valid, z_meas - z_pred, 0.0)

    # grad Z . J_w part (sampled-at-warp approximated by previous frame).
    jac_img = warp_jacobian_times_grad(
        pts_t, grad_zx_prev, grad_zy_prev,
        intrinsics[..., 0, 0], intrinsics[..., 1, 1], valid,
    )
    # minus d z_pred / d xi = -[0, 0, 1, y', -x', 0].
    zeros = jnp.zeros_like(z_pred)
    ones = jnp.ones_like(z_pred)
    j_z = jnp.stack(
        [zeros, zeros, ones, pts_t[..., 1], -pts_t[..., 0], zeros], axis=-1
    )
    jacobian = jnp.where(valid[..., None], jac_img - j_z, 0.0)
    return residuals, jacobian, valid


def normal_equations(
    residuals: jnp.ndarray,
    jacobian: jnp.ndarray,
    weights: jnp.ndarray,
    valid: jnp.ndarray,
) -> ResidualSystem:
    """Reduce to the 6x6 Gauss-Newton system on-device.

    H = J^T W J, b = -J^T W r, err = sum(w r^2)/count over the pixel axes
    (last two of ``residuals``); leading dims are batch.  The contraction
    is a (N,6)^T @ (N,6) matmul per batch element — MXU work, f32
    accumulation; only 36+6+2 scalars leave per element.
    """
    # Pixel axes are everything after the batch dims; the Jacobian fixes
    # the split: (..., H, W, 6) -> batch = shape[:-3].  A flat (N, 6)
    # Jacobian with (N,) residuals is one unbatched sample.
    batch_shape = jacobian.shape[:-3] if jacobian.ndim >= 3 else ()
    jac = jacobian.reshape(batch_shape + (-1, 6))
    res = residuals.reshape(batch_shape + (-1,))
    wts = weights.reshape(batch_shape + (-1,))
    vld = valid.reshape(batch_shape + (-1,))

    jw = jac * wts[..., None]
    hess = jnp.einsum("...ni,...nj->...ij", jw, jac)
    rhs = -jnp.einsum("...ni,...n->...i", jw, res)
    count = jnp.sum(vld.astype(jnp.float32), axis=-1)
    error = jnp.sum(wts * res * res, axis=-1) / jnp.maximum(count, 1.0)
    return ResidualSystem(hessian=hess, rhs=rhs, error=error, count=count)
