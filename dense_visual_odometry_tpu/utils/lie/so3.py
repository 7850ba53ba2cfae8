"""SO(3) as pure, branchless jnp functions.

Capability parity with the reference's quaternion-backed ``So3`` class
(``/root/reference/src/dense_visual_odometry/utils/lie_algebra/special_orthogonal_group.py``),
re-designed for XLA: no Python branching on values, everything works under
``jit``/``vmap`` with arbitrary leading batch dimensions, and the theta ~ 0 /
theta ~ pi neighbourhoods are handled with Taylor series + quaternion
extraction instead of host-side ``if`` statements.

Rotations are represented as 3x3 matrices; ``(..., 3)`` axis-angle vectors are
the Lie-algebra coordinates.
"""

from __future__ import annotations

import jax.numpy as jnp

# Below this angle (radians) the closed forms switch to Taylor series.  The
# threshold must be generous in f32: 1 - cos(theta) underflows to 0 already
# at theta ~ 1.5e-4, while the 3-term series stay at full f32 precision up
# to ~1e-1.
_SMALL_ANGLE = 1e-2


def hat(phi: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of ``phi``: ``hat(a) @ b == cross(a, b)``.

    phi: (..., 3) -> (..., 3, 3)
    """
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zero = jnp.zeros_like(x)
    rows = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def vee(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`hat`: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def _sin_by_theta(theta_sq: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """sin(theta)/theta with a series fallback near zero."""
    small = theta_sq < _SMALL_ANGLE**2
    theta_safe = jnp.where(small, jnp.ones_like(theta), theta)
    series = 1.0 - theta_sq / 6.0 + theta_sq * theta_sq / 120.0
    return jnp.where(small, series, jnp.sin(theta_safe) / theta_safe)


def _one_minus_cos_by_theta_sq(theta_sq: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """(1 - cos(theta))/theta^2 with a series fallback near zero."""
    small = theta_sq < _SMALL_ANGLE**2
    theta_sq_safe = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    series = 0.5 - theta_sq / 24.0 + theta_sq * theta_sq / 720.0
    return jnp.where(small, series, (1.0 - jnp.cos(theta)) / theta_sq_safe)


def exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Exponential map so(3) -> SO(3) (Rodrigues), branchless.

    phi: (..., 3) axis-angle -> (..., 3, 3) rotation matrix.
    """
    theta_sq = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta_sq)
    a = _sin_by_theta(theta_sq, theta)[..., None, None]
    b = _one_minus_cos_by_theta_sq(theta_sq, theta)[..., None, None]
    k = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), k.shape)
    return eye + a * k + b * (k @ k)


def to_quat(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z), branchless Shepperd.

    Evaluates all four Shepperd candidates and selects the numerically best
    (largest pivot) with ``where`` instead of host branching, so it is stable
    for every rotation including theta ~ pi.
    """
    m00, m01, m02 = rot[..., 0, 0], rot[..., 0, 1], rot[..., 0, 2]
    m10, m11, m12 = rot[..., 1, 0], rot[..., 1, 1], rot[..., 1, 2]
    m20, m21, m22 = rot[..., 2, 0], rot[..., 2, 1], rot[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions, one per pivot.  Guard each sqrt with a
    # clamp; the losing candidates may be garbage but are never selected.
    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # Pivot 0: trace
    t0 = 1.0 + tr
    s0 = _safe_sqrt(t0) * 2.0
    q0 = jnp.stack(
        [0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0],
        axis=-1,
    )
    # Pivot 1: m00 largest diagonal
    t1 = 1.0 + m00 - m11 - m22
    s1 = _safe_sqrt(t1) * 2.0
    q1 = jnp.stack(
        [(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1],
        axis=-1,
    )
    # Pivot 2: m11 largest diagonal
    t2 = 1.0 - m00 + m11 - m22
    s2 = _safe_sqrt(t2) * 2.0
    q2 = jnp.stack(
        [(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2],
        axis=-1,
    )
    # Pivot 3: m22 largest diagonal
    t3 = 1.0 - m00 - m11 + m22
    s3 = _safe_sqrt(t3) * 2.0
    q3 = jnp.stack(
        [(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3],
        axis=-1,
    )

    use0 = (tr > 0.0)[..., None]
    use1 = ((m00 >= m11) & (m00 >= m22))[..., None]
    use2 = (m11 >= m22)[..., None]
    q = jnp.where(use0, q0, jnp.where(use1, q1, jnp.where(use2, q2, q3)))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonicalize sign (w >= 0) so log is continuous around identity.
    return q * jnp.where(q[..., :1] < 0.0, -1.0, 1.0)


def log(rot: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map SO(3) -> so(3), robust for all angles including ~pi.

    Goes through the quaternion: phi = 2 * atan2(|v|, w) * v/|v|, which is
    numerically stable everywhere (unlike the arccos-of-trace formula).
    """
    q = to_quat(rot)
    w, v = q[..., 0], q[..., 1:]
    vnorm = jnp.linalg.norm(v, axis=-1)
    theta = 2.0 * jnp.arctan2(vnorm, w)  # in [0, pi] since w >= 0
    small = vnorm < 1e-7
    scale = jnp.where(
        small,
        # theta/sin(theta/2) -> 2 + theta^2/12 ... ; with w~1: 2/w works too
        2.0 / jnp.maximum(w, 0.5),
        theta / jnp.where(small, jnp.ones_like(vnorm), vnorm),
    )
    return v * scale[..., None]


def from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> rotation matrix (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    rows = jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
    return rows


def theta(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle in [0, pi]."""
    return jnp.linalg.norm(log(rot), axis=-1)


def is_rotation_matrix(rot: jnp.ndarray, atol: float = 1e-5) -> jnp.ndarray:
    """True where ``rot`` is orthogonal with determinant +1."""
    eye = jnp.eye(3, dtype=rot.dtype)
    orth = jnp.max(jnp.abs(rot @ jnp.swapaxes(rot, -1, -2) - eye), axis=(-2, -1)) < atol
    det = jnp.abs(jnp.linalg.det(rot) - 1.0) < atol
    return orth & det


def wrap_angle(angle: jnp.ndarray) -> jnp.ndarray:
    """Wrap angle(s) to [-pi, pi)."""
    two_pi = 2.0 * jnp.pi
    return jnp.mod(angle + jnp.pi, two_pi) - jnp.pi
