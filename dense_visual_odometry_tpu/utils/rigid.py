"""Rigid-body alignment of corresponded 3-D point sets (Procrustes).

Capability parity with the reference's ``utils/transform.py``: weighted
SVD/Kabsch with reflection correction (``transform.py:15-91``) and Horn's
quaternion eigenvector method (``transform.py:184-261``), used by its
sparse (LoFTR) pipeline for pose-from-matches.  Redesigned for XLA: pure
jnp, batched over leading axes, weights instead of point compaction, and
degeneracy reported as a validity flag instead of a raised
``EstimationError`` (host exceptions cannot cross jit).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp


class RigidFit(NamedTuple):
    transform: jnp.ndarray  # (..., 4, 4) mapping src -> dst
    rmse: jnp.ndarray  # (...,) weighted RMSE of the fit
    valid: jnp.ndarray  # (...,) bool: well-conditioned problem


def _weighted_stats(src, dst, w):
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    wn = w / wsum
    mu_s = jnp.einsum("...n,...ni->...i", wn, src)
    mu_d = jnp.einsum("...n,...ni->...i", wn, dst)
    cs = src - mu_s[..., None, :]
    cd = dst - mu_d[..., None, :]
    cov = jnp.einsum("...n,...ni,...nj->...ij", wn, cd, cs)
    return mu_s, mu_d, cs, cd, cov, wn


def _assemble(rot, mu_s, mu_d):
    t = mu_d - jnp.einsum("...ij,...j->...i", rot, mu_s)
    batch = rot.shape[:-2]
    out = jnp.zeros(batch + (4, 4), dtype=rot.dtype)
    out = out.at[..., :3, :3].set(rot)
    out = out.at[..., :3, 3].set(t)
    out = out.at[..., 3, 3].set(1.0)
    return out


def _fit_rmse(transform, src, dst, wn):
    moved = (
        jnp.einsum("...ij,...nj->...ni", transform[..., :3, :3], src)
        + transform[..., None, :3, 3]
    )
    err2 = jnp.sum((moved - dst) ** 2, axis=-1)
    return jnp.sqrt(jnp.einsum("...n,...n->...", wn, err2))


def fit_rigid_svd(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> RigidFit:
    """Weighted Kabsch: the SE(3) transform minimizing
    ``sum_n w_n ||T @ src_n - dst_n||^2``.

    src, dst : (..., N, 3) corresponded points.
    weights : (..., N) non-negative, or None for uniform.

    Follows the reference's weighted-SVD variant (transform.py:15-91)
    including the det<0 reflection fix; degeneracy (< 3 effective points /
    rank-deficient covariance) sets ``valid=False`` instead of raising.
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    w = (
        jnp.ones(src.shape[:-1], jnp.float32)
        if weights is None
        else jnp.asarray(weights, jnp.float32)
    )
    mu_s, mu_d, cs, cd, cov, wn = _weighted_stats(src, dst, w)

    u, s, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(u) * jnp.linalg.det(vt)
    flip = jnp.where(det < 0.0, -1.0, 1.0)
    d = jnp.concatenate(
        [jnp.ones_like(s[..., :2]), flip[..., None]], axis=-1
    )
    rot = jnp.einsum("...ik,...k,...kj->...ij", u, d, vt)

    transform = _assemble(rot, mu_s, mu_d)
    rmse = _fit_rmse(transform, src, dst, wn)

    # Conditioning: needs >= 3 well-spread points; second singular value of
    # the covariance must be meaningfully nonzero (points not collinear).
    eff_points = 1.0 / jnp.maximum(jnp.sum(wn * wn, axis=-1), 1e-12)
    valid = (
        (eff_points >= 2.5)
        & (s[..., 1] > 1e-9)
        & jnp.all(jnp.isfinite(transform), axis=(-2, -1))
    )
    return RigidFit(transform=transform, rmse=rmse, valid=valid)


def fit_rigid_quat(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> RigidFit:
    """Horn's closed-form quaternion method (reference transform.py:184-261).

    The optimal rotation is the eigenvector of the 4x4 matrix N built from
    the weighted covariance, for its largest eigenvalue.
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    w = (
        jnp.ones(src.shape[:-1], jnp.float32)
        if weights is None
        else jnp.asarray(weights, jnp.float32)
    )
    mu_s, mu_d, cs, cd, cov_ds, wn = _weighted_stats(src, dst, w)
    # Horn uses S = sum w * src_c @ dst_c^T (src-to-dst order).
    m = jnp.swapaxes(cov_ds, -1, -2)

    sxx, sxy, sxz = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    syx, syy, syz = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    szx, szy, szz = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    z = jnp.zeros_like(sxx)
    n = jnp.stack(
        [
            jnp.stack([sxx + syy + szz, syz - szy, szx - sxz, sxy - syx], -1),
            jnp.stack([syz - szy, sxx - syy - szz, sxy + syx, szx + sxz], -1),
            jnp.stack([szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy], -1),
            jnp.stack([sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz], -1),
        ],
        -2,
    ) + 0.0 * z[..., None, None]

    eigvals, eigvecs = jnp.linalg.eigh(n)
    quat = eigvecs[..., :, -1]  # largest eigenvalue (eigh sorts ascending)
    # quat = (w, x, y, z); normalize sign so w >= 0.
    quat = quat * jnp.sign(quat[..., :1] + 1e-30)
    qw, qx, qy, qz = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    rot = jnp.stack(
        [
            jnp.stack([1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)], -1),
            jnp.stack([2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qw * qx)], -1),
            jnp.stack([2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx * qx + qy * qy)], -1),
        ],
        -2,
    )
    transform = _assemble(rot, mu_s, mu_d)
    rmse = _fit_rmse(transform, src, dst, wn)
    eff_points = 1.0 / jnp.maximum(jnp.sum(wn * wn, axis=-1), 1e-12)
    valid = (eff_points >= 2.5) & jnp.all(jnp.isfinite(transform), axis=(-2, -1))
    return RigidFit(transform=transform, rmse=rmse, valid=valid)
