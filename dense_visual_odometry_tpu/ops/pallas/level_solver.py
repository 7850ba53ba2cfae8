"""Pallas kernel: an ENTIRE pyramid level's LM solve in one invocation.

Motivation (benchmarks/RESULTS.md, transport-overhead attribution): on
the target device every sequential step — a loop iteration, a dependent
custom call — costs ~0.9 ms regardless of the work inside, so the
per-iteration design (XLA warp geometry -> fused kernel -> XLA
solve/update, ~3 thunk groups x ~11 iterations per frame) spends most
of its time on scheduling.  Measured in-kernel, one LM iteration costs
microseconds.  This kernel therefore runs the WHOLE per-level
Levenberg-Marquardt loop on-chip: the frozen window planes, template,
3-D points and IC Jacobian stream HBM->VMEM once per LEVEL (not per
iteration), and warp geometry, tent-tap accumulation, t-IRLS, the
H/b reduction, the damped 6x6 Cholesky solve, the SE(3) exponential
update and the trust-region/stopping bookkeeping all execute from
on-chip memory inside a per-element ``lax.while_loop``.  Only the final
pose, anchor and diagnostics (48 scalars/element) leave the kernel.
This also removes the per-iteration HBM re-streaming (~139 MB x
iterations -> x1) on non-tunneled hardware.

Semantics: bit-compatible restatement of ``models/robust._lm_loop``
with the ``fused`` evaluate mode (frozen window), INCLUDING the motion
prior when ``sigma`` is set (H += (1/sigma) I, b += (1/sigma) log(old),
per-iteration anchor re-anchoring — the in-kernel se3.log uses a Newton
arcsin since ``atan2``/``acos`` do not lower, ``_se3_log_scalars``) and
the geometric depth-residual term when ``use_depth`` is set (a second
frozen window over the CURRENT depth map shares the tent-tap sweep, the
per-pixel depth Jacobian grad Z . J_w - [0,0,1,y',-x',0] is rebuilt from
the transformed points each iteration, and the Huber-weighted normal
equations fold into H/b/err exactly like models/robust.py's XLA
ordering: after the illumination Schur, before the prior).  Both
illumination modes ride the kernel: "bias" as a rank-1 Schur and
"affine" (round-5) as the rank-2 gain+bias Schur with the unweighted
pre-fit before the t-scale — every shipped config class now runs
in-kernel.  The damped solve uses an unrolled
Cholesky instead of ``jnp.linalg.solve`` (measured equivalent to 2e-5
relative).  Per-element loop exit replaces the batch-wide
``any(~done)`` condition — element results are identical because done
elements never update; the reported iteration count is the batch max,
which equals ``_lm_loop``'s trip count.

Mosaic constraints discovered for this kernel (benchmarks/
exp_megafeas.py): ``acos``/``atan2`` do not lower (scalar sin/cos/sqrt
do — enough for se3.exp; se3.log uses exactly such a Newton inversion,
``_se3_log_scalars``);
``tpu.iota`` only produces integers; while_loop with a ~90-scalar carry
lowers fine and an on-chip iteration costs ~microseconds.

Reference anchor: the loop being collapsed is the reference's per-level
``while`` at ``/root/reference/src/dense_visual_odometry/core/
robust_dense_visual_odometry/base_robust_dvo.py:190-240`` (one full
image pipeline per iteration); the TPU answer keeps the level resident
in VMEM across all of them.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# SMEM scalar-input row layout per batch element:
#   [0:16) est0 row-major | [16:32) anchor0 | 32 wlam0 | 33 fx | 34 fy
#   | 35 cx | 36 cy | 37 cu | 38 cv | 39 rel_tolerance (<0 = disabled)
#   | with n_blocks > 1: [40:40+nblk) per-block cu | [..+nblk) per-block cv
_IN_COLS = 40
# SMEM output row layout per batch element:
#   [0:16) est | [16:32) anchor | 32 wlam | 33 lm_lambda | 34 err
#   | 35 count | 36 iterations | 37.. zero padding
_OUT_COLS = 48

_SMALL_ANGLE_SQ = 1e-4  # so3._SMALL_ANGLE ** 2 (same series thresholds)


def _se3_exp_scalars(d):
    """se3.exp on 6 scalars (upsilon, phi) -> 12 scalars (R | t) rows.

    Mirrors utils/lie/{so3,se3}.exp: Rodrigues + left Jacobian V with the
    same series fallbacks below theta < 1e-2.
    """
    ux, uy, uz, wx, wy, wz = d
    th_sq = wx * wx + wy * wy + wz * wz
    small = th_sq < _SMALL_ANGLE_SQ
    th_safe = jnp.sqrt(jnp.where(small, 1.0, th_sq))
    sin_t = jnp.sin(th_safe)
    cos_t = jnp.cos(th_safe)
    a = jnp.where(
        small, 1.0 - th_sq / 6.0 + th_sq * th_sq / 120.0, sin_t / th_safe
    )
    b = jnp.where(
        small,
        0.5 - th_sq / 24.0 + th_sq * th_sq / 720.0,
        (1.0 - cos_t) / jnp.where(small, 1.0, th_sq),
    )
    c = jnp.where(
        small,
        1.0 / 6.0 - th_sq / 120.0 + th_sq * th_sq / 5040.0,
        (th_safe - sin_t) / jnp.where(small, 1.0, th_sq * th_safe),
    )
    # K = hat(w); R = I + a K + b K^2 ; V = I + b K + c K^2
    kxx, kyy, kzz = -(wy * wy + wz * wz), -(wx * wx + wz * wz), -(wx * wx + wy * wy)
    kxy, kxz, kyz = wx * wy, wx * wz, wy * wz
    r00 = 1.0 + b * kxx
    r11 = 1.0 + b * kyy
    r22 = 1.0 + b * kzz
    r01 = -a * wz + b * kxy
    r10 = a * wz + b * kxy
    r02 = a * wy + b * kxz
    r20 = -a * wy + b * kxz
    r12 = -a * wx + b * kyz
    r21 = a * wx + b * kyz
    v00 = 1.0 + c * kxx
    v11 = 1.0 + c * kyy
    v22 = 1.0 + c * kzz
    v01 = -b * wz + c * kxy
    v10 = b * wz + c * kxy
    v02 = b * wy + c * kxz
    v20 = -b * wy + c * kxz
    v12 = -b * wx + c * kyz
    v21 = b * wx + c * kyz
    tx = v00 * ux + v01 * uy + v02 * uz
    ty = v10 * ux + v11 * uy + v12 * uz
    tz = v20 * ux + v21 * uy + v22 * uz
    return (r00, r01, r02, tx, r10, r11, r12, ty, r20, r21, r22, tz)


def _compose(a, b):
    """(R_a|t_a) @ (R_b|t_b) on 12-scalar affine rows."""
    a00, a01, a02, ax, a10, a11, a12, ay, a20, a21, a22, az = a
    b00, b01, b02, bx, b10, b11, b12, by, b20, b21, b22, bz = b
    return (
        a00 * b00 + a01 * b10 + a02 * b20,
        a00 * b01 + a01 * b11 + a02 * b21,
        a00 * b02 + a01 * b12 + a02 * b22,
        a00 * bx + a01 * by + a02 * bz + ax,
        a10 * b00 + a11 * b10 + a12 * b20,
        a10 * b01 + a11 * b11 + a12 * b21,
        a10 * b02 + a11 * b12 + a12 * b22,
        a10 * bx + a11 * by + a12 * bz + ay,
        a20 * b00 + a21 * b10 + a22 * b20,
        a20 * b01 + a21 * b11 + a22 * b21,
        a20 * b02 + a21 * b12 + a22 * b22,
        a20 * bx + a21 * by + a22 * bz + az,
    )


def _inverse(m):
    """[R^T | -R^T t] on a 12-scalar affine row."""
    r00, r01, r02, tx, r10, r11, r12, ty, r20, r21, r22, tz = m
    return (
        r00, r10, r20, -(r00 * tx + r10 * ty + r20 * tz),
        r01, r11, r21, -(r01 * tx + r11 * ty + r21 * tz),
        r02, r12, r22, -(r02 * tx + r12 * ty + r22 * tz),
    )


def _se3_log_scalars(m):
    """se3.log on a 12-scalar affine row -> 6 scalars (upsilon, phi).

    Mirrors utils/lie/{so3,se3}.log (quaternion-route theta, V^-1 with
    the same series thresholds) with one Mosaic workaround: ``atan2``
    does not lower, so theta/2 = arcsin(|v|) is recovered by a Newton
    inversion of sin (series initial guess + 2 steps, f32-exact for
    theta <= ~2.4 rad).  Valid for theta < ~2.5 rad — the motion-prior
    anchors this kernel consumes are frame-to-frame transforms, orders
    of magnitude inside that; the trace-pivot quaternion (w > 0.3 there)
    is exact in this domain.
    """
    r00, r01, r02, tx, r10, r11, r12, ty, r20, r21, r22, tz = m
    tr = r00 + r11 + r22
    w = 0.5 * jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12))
    inv4w = 1.0 / (4.0 * w)
    vx = (r21 - r12) * inv4w
    vy = (r02 - r20) * inv4w
    vz = (r10 - r01) * inv4w
    vn_sq = vx * vx + vy * vy + vz * vz
    vn = jnp.sqrt(vn_sq)
    vn_c = jnp.minimum(vn, 0.999)  # guard the Newton cos denominator
    # arcsin via series init + Newton on f(x) = sin x - vn.
    x = vn_c * (1.0 + vn_sq * (1.0 / 6.0 + vn_sq * (3.0 / 40.0)))
    for _ in range(2):
        x = x - (jnp.sin(x) - vn_c) / jnp.maximum(jnp.cos(x), 1e-3)
    theta = 2.0 * x
    small = vn < 1e-7
    scale = jnp.where(
        small,
        2.0 / jnp.maximum(w, 0.5),
        theta / jnp.where(small, 1.0, vn),
    )
    px = vx * scale
    py = vy * scale
    pz = vz * scale
    # V^-1 = I - hat(phi)/2 + D hat(phi)^2 (se3.left_jacobian_inverse,
    # same series threshold _SMALL_ANGLE_D = 1e-1).
    t_sq = px * px + py * py + pz * pz
    small_d = t_sq < 1e-2
    t_safe = jnp.sqrt(jnp.where(small_d, 1.0, t_sq))
    t_sq_safe = jnp.where(small_d, 1.0, t_sq)
    a = jnp.sin(t_safe) / t_safe
    b2 = (1.0 - jnp.cos(t_safe)) / t_sq_safe
    d = jnp.where(
        small_d,
        1.0 / 12.0 + t_sq / 720.0 + t_sq * t_sq * (31.0 / 60480.0),
        (1.0 - a / (2.0 * b2)) / t_sq_safe,
    )
    # K = hat(phi); Vinv = I - K/2 + d K^2, applied to t.
    # K @ t and K @ (K @ t):
    k1x = py * tz - pz * ty
    k1y = pz * tx - px * tz
    k1z = px * ty - py * tx
    k2x = py * k1z - pz * k1y
    k2y = pz * k1x - px * k1z
    k2z = px * k1y - py * k1x
    ux = tx - 0.5 * k1x + d * k2x
    uy = ty - 0.5 * k1y + d * k2y
    uz = tz - 0.5 * k1z + d * k2z
    return ux, uy, uz, px, py, pz


def _chol_solve6(h21, rhs):
    """Damped-system solve via unrolled 6x6 Cholesky on scalars.

    h21: upper-triangular row-major packing h[i][j], i<=j.
    Measured equivalent to jnp.linalg.solve at 2e-5 relative
    (benchmarks/exp_tail.py).
    """
    idx = {}
    k = 0
    for i in range(6):
        for j in range(i, 6):
            idx[(i, j)] = k
            k += 1

    def H(i, j):
        return h21[idx[(i, j)]] if i <= j else h21[idx[(j, i)]]

    L = [[None] * 6 for _ in range(6)]
    for j in range(6):
        s = H(j, j)
        for t in range(j):
            s = s - L[j][t] * L[j][t]
        djj = jnp.sqrt(jnp.maximum(s, 1e-30))
        L[j][j] = djj
        inv = 1.0 / djj
        for i in range(j + 1, 6):
            s = H(i, j)
            for t in range(j):
                s = s - L[i][t] * L[j][t]
            L[i][j] = s * inv
    y = [None] * 6
    for i in range(6):
        s = rhs[i]
        for t in range(i):
            s = s - L[i][t] * y[t]
        y[i] = s / L[i][i]
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for t in range(i + 1, 6):
            s = s - L[t][i] * x[t]
        x[i] = s / L[i][i]
    return tuple(x)


def _level_kernel(
    radius: int,
    radius_y: int,
    hp: int,
    wp: int,
    stride: int,
    image_h: int,
    image_w: int,
    dof: float,
    unroll: int,
    use_tweights: bool,
    normalize_scale: bool,
    tolerance: float,
    lm_up: float,
    lm_down: float,
    lm_lambda_max: float,
    max_iterations: int,
    lm_lambda0: float,
    n_blocks: int = 1,
    block_rows: int = 0,
    halo: int = 0,
    grid_hp: int = 0,
    sigma: float | None = None,
    reference_prior_energy: bool = False,
    illum_bias: bool = False,
    use_depth: bool = False,
    depth_weight: float = 1.0,
    depth_huber_delta: float = 0.03,
    n_blocks_x: int = 1,
    block_cols: int = 0,
    halo_x: int = 0,
    grid_wp: int = 0,
    illum_affine: bool = False,
):
    fmax = float(jnp.finfo(jnp.float32).max)
    use_prior = sigma is not None
    inv_cov = 0.0 if sigma is None else 1.0 / sigma

    def kernel(planes_ref, pts_ref, gray_ref, jac_ref, *rest):
        if use_depth:
            (zplanes_ref, zgrad_ref, scal_ref, out_ref,
             acc_ref, accz_ref) = rest
        else:
            scal_ref, out_ref, acc_ref = rest
            zplanes_ref = zgrad_ref = accz_ref = None
        bi = pl.program_id(0)
        ph = planes_ref.shape[-2]
        pw = planes_ref.shape[-1]

        px = pts_ref[0, 0]
        py = pts_ref[0, 1]
        pz = pts_ref[0, 2]
        gray = gray_ref[0]
        fx = scal_ref[bi, 33]
        fy = scal_ref[bi, 34]
        cx = scal_ref[bi, 35]
        cy = scal_ref[bi, 36]
        rel = scal_ref[bi, 39]
        col_f = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1).astype(
            jnp.float32
        )
        row_f = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0).astype(
            jnp.float32
        )
        if n_blocks_x > 1:
            # 2-D TILE layout (round-4 VERDICT task 1): mosaic of
            # (t_y + halo_y, t_x + halo_x) tiles, each with its own
            # integer center in SMEM.  The per-pixel center maps are
            # built once per invocation from row/col step indicators via
            # the 2-D finite-difference expansion
            #   c(row, col) = sum_{k,l} D2[k,l] * [row >= k*slab_h]
            #                                   * [col >= l*slab_w]
            # (nby + nbx compares, nby*nbx plane FMAs — negligible next
            # to one tap sweep).
            slab_h = float(block_rows + halo)
            slab_w = float(block_cols + halo_x)
            nt = n_blocks * n_blocks_x

            def cval(base, k, l):
                if k < 0 or l < 0:
                    return 0.0
                return scal_ref[bi, base + k * n_blocks_x + l]

            ones = jnp.ones((hp, wp), jnp.float32)
            masks_y = [ones] + [
                (row_f >= k * slab_h).astype(jnp.float32)
                for k in range(1, n_blocks)
            ]
            masks_x = [ones] + [
                (col_f >= l * slab_w).astype(jnp.float32)
                for l in range(1, n_blocks_x)
            ]
            cu_row = jnp.zeros((hp, wp), jnp.float32)
            cv_row = jnp.zeros((hp, wp), jnp.float32)
            for k in range(n_blocks):
                my = masks_y[k]
                for l in range(n_blocks_x):
                    d2u = (
                        cval(40, k, l) - cval(40, k - 1, l)
                        - cval(40, k, l - 1) + cval(40, k - 1, l - 1)
                    )
                    d2v = (
                        cval(40 + nt, k, l) - cval(40 + nt, k - 1, l)
                        - cval(40 + nt, k, l - 1)
                        + cval(40 + nt, k - 1, l - 1)
                    )
                    p = my if l == 0 else my * masks_x[l]
                    cu_row = cu_row + d2u * p
                    cv_row = cv_row + d2v * p
            blk_y = jnp.zeros((hp, wp), jnp.float32)
            for k in range(1, n_blocks):
                blk_y = blk_y + masks_y[k]
            blk_x = jnp.zeros((hp, wp), jnp.float32)
            for l in range(1, n_blocks_x):
                blk_x = blk_x + masks_x[l]
            grid_row = row_f - blk_y * float(halo)
            grid_col = col_f - blk_x * float(halo_x)
            interior = (
                ((row_f - blk_y * slab_h) < float(block_rows))
                & (grid_row < float(grid_hp))
                & ((col_f - blk_x * slab_w) < float(block_cols))
                & (grid_col < float(grid_wp))
            )
            coli = grid_col * float(stride) + cu_row
            rowi = grid_row * float(stride) + cv_row
        elif n_blocks > 1:
            # Slab layout: row j belongs to block k = j // (t + halo);
            # its grid row is j - k*halo (halo rows duplicate the next
            # block's first grid rows and are masked out below).  The
            # per-block centers live in SMEM; the per-row center vectors
            # are built with nblk-1 threshold compares (static unroll).
            slab_h = float(block_rows + halo)
            blk = jnp.zeros((hp, wp), jnp.float32)
            cu_row = jnp.full((hp, wp), scal_ref[bi, 40], jnp.float32)
            cv_row = jnp.full(
                (hp, wp), scal_ref[bi, 40 + n_blocks], jnp.float32
            )
            for k in range(1, n_blocks):
                m = (row_f >= k * slab_h).astype(jnp.float32)
                blk = blk + m
                cu_row = cu_row + m * (
                    scal_ref[bi, 40 + k] - scal_ref[bi, 40 + k - 1]
                )
                cv_row = cv_row + m * (
                    scal_ref[bi, 40 + n_blocks + k]
                    - scal_ref[bi, 40 + n_blocks + k - 1]
                )
            grid_row = row_f - blk * float(halo)
            interior = (
                ((row_f - blk * slab_h) < float(block_rows))
                & (grid_row < float(grid_hp))
            )
            coli = col_f * float(stride) + cu_row
            rowi = grid_row * float(stride) + cv_row
        else:
            interior = None
            # Full-res template coordinates of the strided grid.
            coli = col_f * float(stride) + scal_ref[bi, 37]
            rowi = row_f * float(stride) + scal_ref[bi, 38]
        rad_x = jnp.float32(radius)
        rad_y = jnp.float32(radius_y)

        def affine(base):
            return tuple(scal_ref[bi, base + r * 4 + c]
                         for r in range(3) for c in range(4))

        est0 = affine(0)
        anchor0 = affine(16)

        def evaluate(est, anchor, wlam):
            (r00, r01, r02, tx, r10, r11, r12, ty,
             r20, r21, r22, tz) = est
            xp = r00 * px + r01 * py + r02 * pz + tx
            yp = r10 * px + r11 * py + r12 * pz + ty
            zp = r20 * px + r21 * py + r22 * pz + tz
            in_front = zp > 1e-6
            z_safe = jnp.where(in_front, zp, 1.0)
            u = (fx * xp + cx * zp) / z_safe
            v = (fy * yp + cy * zp) / z_safe
            du = u - coli
            dv = v - rowi
            in_ball = (
                (du > -rad_x) & (du < rad_x)
                & (dv > -rad_y) & (dv < rad_y)
            )
            x0 = jnp.floor(u)
            y0 = jnp.floor(v)
            in_bounds = (
                (x0 >= 0.0) & (y0 >= 0.0)
                & (x0 + 1.0 <= float(image_w - 1))
                & (y0 + 1.0 <= float(image_h - 1))
            )
            ok_px = in_ball & in_bounds & in_front
            if interior is not None:
                ok_px = ok_px & interior
            valid = ok_px.astype(jnp.float32)

            acc_ref[...] = jnp.zeros((hp, wp), jnp.float32)
            if use_depth:
                accz_ref[...] = jnp.zeros((hp, wp), jnp.float32)
            for ky in range(-radius_y, radius_y + 1):
                a = radius_y + ky
                pa = a % stride
                qa = a // stride
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(dv - ky))
                for pb in range(stride):
                    plane_idx = pa * stride + pb
                    row = pltpu.roll(
                        planes_ref[0, plane_idx], (ph - qa) % ph, axis=0
                    )
                    zrow = (
                        pltpu.roll(
                            zplanes_ref[0, plane_idx], (ph - qa) % ph, axis=0
                        )
                        if use_depth
                        else None
                    )
                    for kx in range(-radius, radius + 1):
                        b = radius + kx
                        if b % stride != pb:
                            continue
                        qb = b // stride
                        shifted = pltpu.roll(
                            row, (pw - qb) % pw, axis=1
                        )[:hp, :wp]
                        wx = jnp.maximum(0.0, 1.0 - jnp.abs(du - kx))
                        acc_ref[...] = acc_ref[...] + (wy * wx) * shifted
                        if use_depth:
                            # Same tent weights sample the CURRENT depth
                            # window: the accumulation IS the bilinear
                            # interpolation of depth_residuals' XLA path
                            # wherever the displacement stays in-ball.
                            zshifted = pltpu.roll(
                                zrow, (pw - qb) % pw, axis=1
                            )[:hp, :wp]
                            accz_ref[...] = (
                                accz_ref[...] + (wy * wx) * zshifted
                            )

            res = jnp.where(valid > 0.0, acc_ref[...] - gray, 0.0)
            count = jnp.sum(valid)
            count_safe = jnp.maximum(count, 1.0)
            tpl_c = None
            if illum_bias or illum_affine:
                # Valid-mean centering before the t-scale, then an exact
                # weighted Schur elimination of the exposure-bias
                # unknown below (models/robust._bias_schur semantics).
                mu0 = jnp.sum(res) / count_safe
                res = jnp.where(valid > 0.0, res - mu0, 0.0)
            if illum_affine:
                # Affine (gain + bias) pre-fit before robust weighting
                # (models/robust.py eval ordering): remove the best
                # UNWEIGHTED gain fit against the valid-mean-centered
                # template, so the t-scale sees exposure-free residuals;
                # the rank-2 Schur below then eliminates the remaining
                # WEIGHTED nuisance exactly (_affine_schur semantics).
                tpl_mu = jnp.sum(jnp.where(valid > 0.0, gray, 0.0)) \
                    / count_safe
                tpl_c = jnp.where(valid > 0.0, gray - tpl_mu, 0.0)
                alpha = jnp.sum(tpl_c * res) / jnp.maximum(
                    jnp.sum(tpl_c * tpl_c), 1e-6
                )
                res = jnp.where(valid > 0.0, res - alpha * tpl_c, 0.0)
            rsq = res * res
            lam = wlam
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
            h21 = tuple(
                jnp.sum(jw[i] * jac_ref[0, j])
                for i in range(6)
                for j in range(i, 6)
            )
            rhs = tuple(-jnp.sum(jw[i] * res) for i in range(6))
            err = jnp.sum(weights * rsq) / count_safe
            if illum_affine:
                # Rank-2 Schur onto the pose block (gain + bias pair,
                # models/robust._affine_schur): S = N^T W N with
                # N = [tpl_c, 1], G = J^T W N, t = N^T W r;
                # H' = H - G S^-1 G^T, b' = b + G S^-1 t,
                # err' = err - t^T S^-1 t / count (closed-form 2x2
                # inverse; applied BEFORE the depth term and the prior,
                # exactly like the XLA ordering).
                s_ii = jnp.sum(weights * tpl_c * tpl_c)
                s_i1 = jnp.sum(weights * tpl_c)
                s_11 = jnp.sum(weights)
                t_i = jnp.sum(weights * tpl_c * res)
                t_1 = jnp.sum(weights * res)
                det = jnp.maximum(s_ii * s_11 - s_i1 * s_i1, 1e-6)
                g_i = tuple(jnp.sum(jw[k] * tpl_c) for k in range(6))
                g_1 = tuple(jnp.sum(jw[k]) for k in range(6))
                beta_i = (s_11 * t_i - s_i1 * t_1) / det
                beta_1 = (s_ii * t_1 - s_i1 * t_i) / det
                m_i = tuple(
                    (s_11 * g_i[k] - s_i1 * g_1[k]) / det for k in range(6)
                )
                m_1 = tuple(
                    (s_ii * g_1[k] - s_i1 * g_i[k]) / det for k in range(6)
                )
                pairs = [(i, j) for i in range(6) for j in range(i, 6)]
                h21 = tuple(
                    h - (g_i[i] * m_i[j] + g_1[i] * m_1[j])
                    for (i, j), h in zip(pairs, h21)
                )
                rhs = tuple(
                    r + g_i[k] * beta_i + g_1[k] * beta_1
                    for k, r in enumerate(rhs)
                )
                err = err - (t_i * beta_i + t_1 * beta_1) / count_safe
            elif illum_bias:
                # Rank-1 Schur onto the pose block: H' = H - g g^T/s,
                # b' = b + g rho/s, err' = err - rho^2/s/count (applied
                # BEFORE the prior, exactly like the XLA path).
                s_w = jnp.sum(weights)
                rho = jnp.sum(weights * res)
                s_safe = jnp.maximum(s_w, 1e-6)
                g6 = tuple(jnp.sum(jw[i]) for i in range(6))
                pairs = [(i, j) for i in range(6) for j in range(i, 6)]
                h21 = tuple(
                    h - g6[i] * g6[j] / s_safe
                    for (i, j), h in zip(pairs, h21)
                )
                rhs = tuple(
                    r + g6[i] * rho / s_safe for i, r in enumerate(rhs)
                )
                err = err - rho * rho / s_safe / count_safe
            if use_depth:
                # Geometric term (models/robust.py eval_mode ordering:
                # after the illumination Schur, before the prior).
                # r_z = Z2(w(p)) - [T X(p)]_z with the analytic Jacobian
                # grad Z . J_w - [0, 0, 1, y', -x', 0] rebuilt from the
                # transformed points each iteration
                # (ops/residuals.depth_residuals semantics; sampling is
                # ball-limited like the photometric window).
                z_meas = accz_ref[...]
                ok_z = ok_px & (z_meas > 0.0)
                validz = ok_z.astype(jnp.float32)
                r_z = jnp.where(ok_z, z_meas - zp, 0.0)
                delta_h = jnp.float32(depth_huber_delta)
                rabs = jnp.sqrt(jnp.maximum(r_z * r_z, 1e-20))
                w_z = validz * jnp.where(
                    rabs <= delta_h, 1.0, delta_h / rabs
                )
                z_safe2 = jnp.where(ok_z, zp, 1.0)
                izz = 1.0 / z_safe2
                izz2 = izz * izz
                gzx = zgrad_ref[0, 0] * fx
                gzy = zgrad_ref[0, 1] * fy
                jz = (
                    gzx * izz,
                    gzy * izz,
                    -(gzx * xp + gzy * yp) * izz2 - 1.0,
                    -gzx * xp * yp * izz2
                    - gzy * (1.0 + yp * yp * izz2) - yp,
                    gzx * (1.0 + xp * xp * izz2)
                    + gzy * xp * yp * izz2 + xp,
                    -gzx * yp * izz + gzy * xp * izz,
                )
                jz = tuple(jnp.where(ok_z, c, 0.0) for c in jz)
                jwz = [jz[i] * w_z for i in range(6)]
                dw = jnp.float32(depth_weight)
                pairs_z = [(i, j) for i in range(6) for j in range(i, 6)]
                h21 = tuple(
                    h + dw * jnp.sum(jwz[i] * jz[j])
                    for (i, j), h in zip(pairs_z, h21)
                )
                rhs = tuple(
                    r - dw * jnp.sum(jwz[i] * r_z)
                    for i, r in enumerate(rhs)
                )
                count_z = jnp.maximum(jnp.sum(validz), 1.0)
                err = err + dw * jnp.sum(w_z * r_z * r_z) / count_z
            if use_prior:
                # Motion prior (eval_mode in models/robust.py:
                # H += (1/sigma) I, b += (1/sigma) log(anchor), plus the
                # energy term used by the stopping decisions).
                lg = _se3_log_scalars(anchor)
                icov = jnp.float32(inv_cov)
                diag_idx = (0, 6, 11, 15, 18, 20)
                h21 = tuple(
                    h + icov if k in diag_idx else h
                    for k, h in enumerate(h21)
                )
                rhs = tuple(r + icov * lg[i] for i, r in enumerate(rhs))
                sq = sum(c * c for c in lg)
                if reference_prior_energy:
                    err = err + 0.5 * jnp.float32(sigma) * jnp.sqrt(sq)
                else:
                    err = err + 0.5 * icov * sq
            return h21, rhs, err, count, lam

        zero = jnp.float32(0.0)
        carry0 = (
            jnp.int32(0),                     # it
            jnp.bool_(False),                 # done
            jnp.float32(lm_lambda0),          # trust-region lambda
            scal_ref[bi, 32],                 # weight lambda (warm IRLS)
            jnp.float32(fmax),                # err_acc
            zero,                             # count_acc
            est0, anchor0, est0, anchor0,     # est/anchor acc + try
            tuple(zero for _ in range(21)),   # hess_acc
            tuple(zero for _ in range(6)),    # rhs_acc
        )

        def cond(c):
            it, done = c[0], c[1]
            return jnp.logical_and(~done, it < max_iterations)

        def body(c):
            (it, done, lm_lam, wlam, err_acc, count_acc,
             est_acc, anchor_acc, est_try, anchor_try,
             hess_acc, rhs_acc) = c
            h21, rhs, err, count, wlam2 = evaluate(est_try, anchor_try, wlam)
            ok_eval = jax.lax.is_finite(err) & (count >= 6.0)
            take = (err < err_acc) & ok_eval

            def sel(new, old):
                return tuple(jnp.where(take, n, o) for n, o in zip(new, old))

            est_acc = sel(est_try, est_acc)
            anchor_acc = sel(anchor_try, anchor_acc)
            hess_acc = sel(h21, hess_acc)
            rhs_acc = sel(rhs, rhs_acc)
            err_acc = jnp.where(take, err, err_acc)
            count_acc = jnp.where(take, count, count_acc)
            lm_lam = jnp.where(take, lm_lam * lm_down, lm_lam * lm_up)
            lm_lam = jnp.clip(lm_lam, 1e-10, lm_lambda_max)

            trace = (
                hess_acc[0] + hess_acc[6] + hess_acc[11]
                + hess_acc[15] + hess_acc[18] + hess_acc[20]
            )
            floor = 1e-8 * (1.0 + trace)
            difn = [0, 6, 11, 15, 18, 20]
            damped = tuple(
                h + (lm_lam * h + floor if k in difn else 0.0)
                for k, h in enumerate(hess_acc)
            )
            delta = _chol_solve6(damped, rhs_acc)
            okd = jnp.bool_(True)
            for dcomp in delta:
                okd = okd & jax.lax.is_finite(dcomp)
            ok = okd & (count_acc >= 6.0)
            delta = tuple(jnp.where(ok, dcomp, 0.0) for dcomp in delta)

            pred = sum(dcomp * r for dcomp, r in zip(delta, rhs_acc))
            pred = pred / jnp.maximum(count_acc, 1.0)
            converged = pred < tolerance
            converged = converged | (
                (rel >= 0.0) & (pred < rel * jnp.abs(err_acc))
            )
            done2 = (
                done | (converged & ok_eval) | ~ok
                | (lm_lam >= lm_lambda_max)
            )

            inc = _se3_exp_scalars(delta)
            inc_inv = _inverse(inc)
            apply_final = converged & ok_eval & ok

            def sel2(pred_s, new, old):
                return tuple(
                    jnp.where(pred_s, n, o) for n, o in zip(new, old)
                )

            est_acc = sel2(apply_final, _compose(inc, est_acc), est_acc)
            anchor_acc = sel2(
                apply_final, _compose(inc_inv, anchor_acc), anchor_acc
            )
            move = ~done2
            est_try = sel2(move, _compose(inc, est_acc), est_acc)
            anchor_try = sel2(
                move, _compose(inc_inv, anchor_acc), anchor_acc
            )
            return (
                it + 1, done2, lm_lam, wlam2, err_acc, count_acc,
                est_acc, anchor_acc, est_try, anchor_try,
                hess_acc, rhs_acc,
            )

        final = jax.lax.while_loop(cond, body, carry0)
        (it, done, lm_lam, wlam, err_acc, count_acc,
         est_acc, anchor_acc, _et, _at, _h, _r) = final

        for k in range(12):
            out_ref[bi, k] = est_acc[k]
            out_ref[bi, 16 + k] = anchor_acc[k]
        for k in range(3):
            out_ref[bi, 12 + k] = 0.0
            out_ref[bi, 28 + k] = 0.0
        out_ref[bi, 15] = 1.0
        out_ref[bi, 31] = 1.0
        out_ref[bi, 32] = wlam
        out_ref[bi, 33] = lm_lam
        out_ref[bi, 34] = jnp.where(err_acc >= fmax, fmax, err_acc)
        out_ref[bi, 35] = count_acc
        out_ref[bi, 36] = it.astype(jnp.float32)
        for k in range(37, _OUT_COLS):
            out_ref[bi, k] = 0.0
        del done

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius", "radius_y", "grid_stride", "image_h", "image_w", "dof",
        "unroll", "use_tweights", "normalize_scale", "tolerance",
        "lm_lambda0", "lm_up", "lm_down", "lm_lambda_max",
        "max_iterations", "interpret", "n_blocks", "block_rows", "halo",
        "grid_hp", "sigma", "reference_prior_energy", "illum_bias",
        "depth_weight", "depth_huber_delta",
        "n_blocks_x", "block_cols", "halo_x", "grid_wp",
        "illum_affine",
    ),
)
def lm_level_pallas(
    planes: jnp.ndarray,
    points: jnp.ndarray,
    gray_prev: jnp.ndarray,
    jac_planes: jnp.ndarray,
    scal: jnp.ndarray,
    radius: int,
    grid_stride: int,
    image_h: int,
    image_w: int,
    dof: float,
    unroll: int,
    use_tweights: bool,
    normalize_scale: bool,
    tolerance: float,
    lm_lambda0: float,
    lm_up: float,
    lm_down: float,
    lm_lambda_max: float,
    max_iterations: int,
    interpret: bool = False,
    n_blocks: int = 1,
    block_rows: int = 0,
    halo: int = 0,
    grid_hp: int = 0,
    radius_y: int | None = None,
    sigma: float | None = None,
    reference_prior_energy: bool = False,
    illum_bias: bool = False,
    depth_planes: jnp.ndarray | None = None,
    zgrad_planes: jnp.ndarray | None = None,
    depth_weight: float = 1.0,
    depth_huber_delta: float = 0.03,
    n_blocks_x: int = 1,
    block_cols: int = 0,
    halo_x: int = 0,
    grid_wp: int = 0,
    illum_affine: bool = False,
) -> jnp.ndarray:
    """Run the level-fused LM solver over a (B,)-grid.

    planes (B, s^2, ph, pw) f32; points (B, 3, H', W') f32 camera-frame
    template points with NaN at invalid-depth pixels; gray_prev
    (B, H', W') f32; jac_planes (B, 6, H', W') f32; scal (B, in_cols)
    f32 per-element scalar row (layout at ``_IN_COLS``).  With
    ``n_blocks > 1`` every per-pixel input is in block-slab layout
    (``ops.pallas.stackwarp.slab_stack``) and ``grid_hp`` is the true
    grid row count.  ``depth_planes`` (B, s^2, ph, pw) frozen windows
    over the CURRENT depth map + ``zgrad_planes`` (B, 2, H', W')
    previous-depth Sobel gradients enable the geometric depth-residual
    term. -> (B, _OUT_COLS) f32 rows (layout at ``_OUT_COLS``).
    """
    if radius_y is None:
        radius_y = radius
    b, _, ph, pw = planes.shape
    hp, wp = gray_prev.shape[-2], gray_prev.shape[-1]
    use_depth = depth_planes is not None
    kernel = _level_kernel(
        radius, radius_y, hp, wp, grid_stride, image_h, image_w, dof,
        unroll, use_tweights, normalize_scale, tolerance, lm_up, lm_down,
        lm_lambda_max, max_iterations, lm_lambda0,
        n_blocks=n_blocks, block_rows=block_rows, halo=halo,
        grid_hp=grid_hp, sigma=sigma,
        reference_prior_energy=reference_prior_energy,
        illum_bias=illum_bias,
        use_depth=use_depth, depth_weight=depth_weight,
        depth_huber_delta=depth_huber_delta,
        n_blocks_x=n_blocks_x, block_cols=block_cols, halo_x=halo_x,
        grid_wp=grid_wp, illum_affine=illum_affine,
    )
    in_cols = scal.shape[-1]
    grid_plane = lambda i: (i, 0, 0)  # noqa: E731
    img_spec = lambda: pl.BlockSpec(  # noqa: E731
        (1, hp, wp), grid_plane, memory_space=pltpu.VMEM
    )
    win_spec = pl.BlockSpec(
        (1, grid_stride * grid_stride, ph, pw),
        lambda i: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        win_spec,
        pl.BlockSpec(
            (1, 3, hp, wp), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        img_spec(),
        pl.BlockSpec(
            (1, 6, hp, wp), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [planes, points, gray_prev, jac_planes]
    if use_depth:
        in_specs.append(win_spec)
        in_specs.append(
            pl.BlockSpec(
                (1, 2, hp, wp), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(depth_planes.astype(jnp.float32))
        operands.append(zgrad_planes.astype(jnp.float32))
    in_specs.append(
        pl.BlockSpec((b, in_cols), lambda i: (0, 0), memory_space=pltpu.SMEM)
    )
    operands.append(scal)
    scratch = [pltpu.VMEM((hp, wp), jnp.float32)]
    if use_depth:
        scratch.append(pltpu.VMEM((hp, wp), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (b, _OUT_COLS), lambda i: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, _OUT_COLS), jnp.float32),
        scratch_shapes=scratch,
        # The solver keeps many full-plane f32 temporaries live across
        # the while_loop (weights, residual, 6 weighted-Jacobian planes,
        # tap temporaries): the scoped stack measured ~18 MB at the
        # level-0 grid in a B=64 program and grows with the surrounding
        # program (the sibling fused_iter kernel needs 54 MB at B=128).
        # The v5e has 128 MB VMEM/core; grant 96 MiB of headroom.
        compiler_params=(
            None
            if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
        ),
        interpret=interpret,
    )(*operands)


def solve_level_fused(
    planes: jnp.ndarray,
    cu: jnp.ndarray,
    cv: jnp.ndarray,
    depth_prev_m: jnp.ndarray,
    gray_prev: jnp.ndarray,
    jac_planes: jnp.ndarray,
    intrinsics: jnp.ndarray,
    estimate0: jnp.ndarray,
    anchor0: jnp.ndarray,
    wlam0: jnp.ndarray,
    rel: jnp.ndarray | None,
    image_h: int,
    image_w: int,
    radius: int,
    grid_stride: int,
    dof: float,
    unroll: int,
    use_tweights: bool,
    normalize_scale: bool,
    tolerance: float,
    lm_lambda0: float,
    lm_up: float,
    lm_down: float,
    lm_lambda_max: float,
    max_iterations: int,
    interpret: bool = False,
    n_blocks: int = 1,
    radius_y: int | None = None,
    sigma: float | None = None,
    reference_prior_energy: bool = False,
    illum_bias: bool = False,
    depth_planes: jnp.ndarray | None = None,
    zgrad: Tuple[jnp.ndarray, jnp.ndarray] | None = None,
    depth_weight: float = 1.0,
    depth_huber_delta: float = 0.03,
    n_blocks_x: int = 1,
    illum_affine: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
           jnp.ndarray, jnp.ndarray]:
    """Batch-shaped wrapper: one level solved end-to-end on-chip.

    depth_prev_m / gray_prev (..., H', W') on the strided grid;
    planes (..., s^2, ph, pw) frozen windows; cu/cv (...,) int32 — or,
    with ``n_blocks > 1``, (..., nblk) per-row-block offsets with
    ``planes`` in slab layout (``extract_parity_planes_blocks``) while
    the per-pixel template tensors stay on the PLAIN grid (slab-ified
    here); intrinsics (..., 3, 3) or (3, 3); estimate0/anchor0
    (..., 4, 4); wlam0 (...,); rel (...,) runtime relative tolerance or
    None.  ``depth_planes`` (..., s^2, ph, pw) frozen windows over the
    CURRENT depth map (same cu/cv/layout as ``planes``) + ``zgrad``
    (gzx, gzy) previous-depth gradients on the strided grid enable the
    geometric depth term.  Returns (est, anchor, wlam, err, count,
    iterations_max).
    """
    if jax.default_backend() != "tpu":
        interpret = True
    if radius_y is None:
        radius_y = radius
    batch_shape = gray_prev.shape[:-2]
    grid_hp, wp = gray_prev.shape[-2], gray_prev.shape[-1]

    if n_blocks_x > 1:
        # 2-D tile path: per-pixel tensors into tile-mosaic layout; the
        # mosaic row/col -> grid coordinate maps feed the deprojection.
        from dense_visual_odometry_tpu.ops.pallas.stackwarp import (
            tile_layout,
            tile_stack,
        )

        grid_wp0 = wp
        nblk, t_rows, halo, nbx, t_cols, halo_x = tile_layout(
            grid_hp, wp, n_blocks, n_blocks_x, radius, radius_y,
            grid_stride,
        )

        def _tstack(x):
            return tile_stack(
                x, grid_hp, grid_wp0, n_blocks, n_blocks_x, radius,
                radius_y, grid_stride,
            )

        gray_prev = _tstack(gray_prev)
        depth_prev_m = _tstack(depth_prev_m)
        jac_planes = _tstack(jac_planes)
        if zgrad is not None:
            zgrad = tuple(_tstack(g) for g in zgrad)
        import numpy as _np

        rows = _np.concatenate(
            [
                _np.arange(k * t_rows, k * t_rows + t_rows + halo)
                for k in range(nblk)
            ]
        )
        vgrid_rows = jnp.asarray(rows, jnp.float32) * grid_stride
        cols = _np.concatenate(
            [
                _np.arange(l * t_cols, l * t_cols + t_cols + halo_x)
                for l in range(nbx)
            ]
        )
        ugrid_cols = jnp.asarray(cols, jnp.float32) * grid_stride
    elif n_blocks > 1:
        from dense_visual_odometry_tpu.ops.pallas.stackwarp import (
            block_layout,
            slab_stack,
        )

        nblk, t_rows, halo = block_layout(
            grid_hp, n_blocks, radius_y, grid_stride
        )
        gray_prev = slab_stack(
            gray_prev, grid_hp, n_blocks, radius_y, grid_stride
        )
        depth_prev_m = slab_stack(
            depth_prev_m, grid_hp, n_blocks, radius_y, grid_stride
        )
        jac_planes = slab_stack(
            jac_planes, grid_hp, n_blocks, radius_y, grid_stride
        )
        if zgrad is not None:
            zgrad = tuple(
                slab_stack(g, grid_hp, n_blocks, radius_y, grid_stride)
                for g in zgrad
            )
        # Grid rows of each slab row (halo rows duplicate the next
        # block's rows; rows past the grid are masked in-kernel).
        import numpy as _np

        rows = _np.concatenate(
            [
                _np.arange(k * t_rows, k * t_rows + t_rows + halo)
                for k in range(nblk)
            ]
        )
        vgrid_rows = jnp.asarray(rows, jnp.float32) * grid_stride
    else:
        nblk, t_rows, halo = 1, 0, 0
        vgrid_rows = None
    if n_blocks_x <= 1:
        nbx, t_cols, halo_x, grid_wp0 = 1, 0, 0, wp
        ugrid_cols = None
    hp = gray_prev.shape[-2]
    wp = gray_prev.shape[-1]  # mosaic width under the tile path

    flat = lambda x: x.reshape((-1,) + x.shape[len(batch_shape):])  # noqa: E731
    gray_f = flat(gray_prev.astype(jnp.float32))
    depth_f = flat(depth_prev_m)
    planes_f = flat(planes)
    jac_f = flat(jac_planes.astype(jnp.float32))
    zplanes_f = None if depth_planes is None else flat(depth_planes)
    zgrad_f = (
        None
        if zgrad is None
        else flat(
            jnp.stack(
                [zgrad[0].astype(jnp.float32), zgrad[1].astype(jnp.float32)],
                axis=len(batch_shape),
            )
        )
    )
    est_f = flat(jnp.broadcast_to(estimate0, batch_shape + (4, 4)))
    anc_f = flat(jnp.broadcast_to(anchor0, batch_shape + (4, 4)))
    b = gray_f.shape[0]

    kmat = jnp.broadcast_to(intrinsics, batch_shape + (3, 3))
    kflat = flat(kmat)
    # Camera-frame template points on the strided grid (deproject_grid
    # semantics, ops/residuals.py), with NaN poisoning invalid depth so
    # every in-kernel validity comparison fails there.
    kinv = jnp.linalg.inv(kflat)
    ugrid = (
        jnp.arange(wp, dtype=jnp.float32) * grid_stride
        if ugrid_cols is None
        else ugrid_cols
    )
    vgrid = (
        jnp.arange(hp, dtype=jnp.float32) * grid_stride
        if vgrid_rows is None
        else vgrid_rows
    )

    def coef(i, j):
        return kinv[:, i, j][:, None, None]

    ray_x = coef(0, 0) * ugrid[None, None, :] + coef(0, 1) * vgrid[None, :, None] + coef(0, 2)
    ray_y = coef(1, 0) * ugrid[None, None, :] + coef(1, 1) * vgrid[None, :, None] + coef(1, 2)
    px = ray_x * depth_f
    pyy = ray_y * depth_f
    nan = jnp.float32(jnp.nan)
    okd = depth_f > 0.0
    points = jnp.stack(
        [
            jnp.where(okd, px, nan),
            jnp.where(okd, pyy, nan),
            jnp.where(okd, depth_f, nan),
        ],
        axis=1,
    )

    nt = nblk * nbx
    if nbx > 1:
        in_cols = _IN_COLS + 2 * nt
    else:
        in_cols = _IN_COLS + (2 * nblk if nblk > 1 else 0)
    scal = jnp.zeros((b, in_cols), jnp.float32)
    scal = scal.at[:, 0:16].set(est_f.reshape(b, 16))
    scal = scal.at[:, 16:32].set(anc_f.reshape(b, 16))
    scal = scal.at[:, 32].set(
        jnp.broadcast_to(wlam0, batch_shape).reshape(-1)
    )
    scal = scal.at[:, 33].set(kflat[:, 0, 0])
    scal = scal.at[:, 34].set(kflat[:, 1, 1])
    scal = scal.at[:, 35].set(kflat[:, 0, 2])
    scal = scal.at[:, 36].set(kflat[:, 1, 2])
    if nbx > 1:
        cu_f = jnp.broadcast_to(
            cu, batch_shape + (nblk, nbx)
        ).reshape(-1, nt)
        cv_f = jnp.broadcast_to(
            cv, batch_shape + (nblk, nbx)
        ).reshape(-1, nt)
        scal = scal.at[:, 40:40 + nt].set(cu_f.astype(jnp.float32))
        scal = scal.at[:, 40 + nt:40 + 2 * nt].set(
            cv_f.astype(jnp.float32)
        )
    elif nblk > 1:
        cu_f = jnp.broadcast_to(cu, batch_shape + (nblk,)).reshape(-1, nblk)
        cv_f = jnp.broadcast_to(cv, batch_shape + (nblk,)).reshape(-1, nblk)
        scal = scal.at[:, 40:40 + nblk].set(cu_f.astype(jnp.float32))
        scal = scal.at[:, 40 + nblk:40 + 2 * nblk].set(
            cv_f.astype(jnp.float32)
        )
    else:
        scal = scal.at[:, 37].set(
            jnp.broadcast_to(cu, batch_shape).reshape(-1).astype(jnp.float32)
        )
        scal = scal.at[:, 38].set(
            jnp.broadcast_to(cv, batch_shape).reshape(-1).astype(jnp.float32)
        )
    if rel is None:
        scal = scal.at[:, 39].set(-1.0)
    else:
        scal = scal.at[:, 39].set(
            jnp.broadcast_to(rel, batch_shape).reshape(-1).astype(jnp.float32)
        )

    out = lm_level_pallas(
        planes_f.astype(jnp.float32), points, gray_f, jac_f, scal,
        radius=radius, radius_y=radius_y, grid_stride=grid_stride,
        image_h=image_h, image_w=image_w, dof=dof, unroll=unroll,
        use_tweights=use_tweights, normalize_scale=normalize_scale,
        tolerance=tolerance, lm_lambda0=lm_lambda0, lm_up=lm_up,
        lm_down=lm_down, lm_lambda_max=lm_lambda_max,
        max_iterations=max_iterations, interpret=interpret,
        n_blocks=nblk, block_rows=t_rows, halo=halo, grid_hp=grid_hp,
        sigma=sigma, reference_prior_energy=reference_prior_energy,
        illum_bias=illum_bias,
        depth_planes=zplanes_f, zgrad_planes=zgrad_f,
        depth_weight=depth_weight, depth_huber_delta=depth_huber_delta,
        n_blocks_x=nbx, block_cols=t_cols, halo_x=halo_x,
        grid_wp=grid_wp0, illum_affine=illum_affine,
    )
    est = out[:, 0:16].reshape(-1, 4, 4)
    anchor = out[:, 16:32].reshape(-1, 4, 4)
    # The affine bottom row is STRUCTURAL — enforce it here rather than
    # trusting the kernel's scalar stores: on real TPU the tile-variant
    # kernel was observed (round 5, out/logs/r5_slamtiles2.log) to
    # occasionally leave out column 15 ([3,3]) as 0 while every other
    # column of the row was correct; one fused constant write removes
    # the whole class of failure for all consumers.
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32), est.shape[:-2] + (4,)
    )
    est = est.at[..., 3, :].set(bottom)
    anchor = anchor.at[..., 3, :].set(bottom)
    wlam = out[:, 32]
    err = out[:, 34]
    count = out[:, 35]
    its = jnp.max(out[:, 36]).astype(jnp.int32)

    unflat = lambda x: x.reshape(batch_shape + x.shape[1:])  # noqa: E731
    return (
        unflat(est), unflat(anchor), unflat(wlam), unflat(err),
        unflat(count), its,
    )
