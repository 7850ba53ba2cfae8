"""SE(3) as pure, branchless jnp functions over 4x4 homogeneous matrices.

Capability parity with the reference ``Se3`` class
(``/root/reference/src/dense_visual_odometry/utils/lie_algebra/special_euclidean_group.py``):
exp/log with the V / V^-1 left-Jacobian mappings, compose, inverse — but as
stateless functions over ``(..., 4, 4)`` arrays so they ``jit``/``vmap``
cleanly and run on-device inside the Gauss-Newton loop.

Twist convention: ``xi = (upsilon, phi)`` with translation part first,
matching the reference (``Se3.log`` at special_euclidean_group.py:54-77).
"""

from __future__ import annotations

import jax.numpy as jnp

from dense_visual_odometry_tpu.utils.lie import so3

# See so3._SMALL_ANGLE: f32 cancellation forces generous series thresholds.
_SMALL_ANGLE = 1e-2
# D = (1 - A/(2B))/theta^2 cancels catastrophically below ~0.1 in f32; the
# 3-term series is accurate to ~1e-5 relative even at theta = 0.5.
_SMALL_ANGLE_D = 1e-1


def _v_coefficients(theta_sq: jnp.ndarray, theta: jnp.ndarray):
    """Coefficients B=(1-cos t)/t^2 and C=(t-sin t)/t^3 with series fallback."""
    small = theta_sq < _SMALL_ANGLE**2
    t_sq_safe = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    t_safe = jnp.where(small, jnp.ones_like(theta), theta)
    b = jnp.where(
        small,
        0.5 - theta_sq / 24.0 + theta_sq * theta_sq / 720.0,
        (1.0 - jnp.cos(t_safe)) / t_sq_safe,
    )
    c = jnp.where(
        small,
        1.0 / 6.0 - theta_sq / 120.0 + theta_sq * theta_sq / 5040.0,
        (t_safe - jnp.sin(t_safe)) / (t_sq_safe * t_safe),
    )
    return b, c


def left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """V(phi) = I + B*hat(phi) + C*hat(phi)^2 (SO(3) left Jacobian)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta_sq)
    b, c = _v_coefficients(theta_sq, theta)
    k = so3.hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), k.shape)
    return eye + b[..., None, None] * k + c[..., None, None] * (k @ k)


def left_jacobian_inverse(phi: jnp.ndarray) -> jnp.ndarray:
    """V(phi)^-1 = I - hat(phi)/2 + D*hat(phi)^2, D = (1 - A/(2B))/theta^2."""
    theta_sq = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta_sq)
    small = theta_sq < _SMALL_ANGLE_D**2
    t_safe = jnp.where(small, jnp.ones_like(theta), theta)
    t_sq_safe = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    a = jnp.sin(t_safe) / t_safe
    b = (1.0 - jnp.cos(t_safe)) / t_sq_safe
    d = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0 + theta_sq * theta_sq * (31.0 / 60480.0),
        (1.0 - a / (2.0 * b)) / t_sq_safe,
    )
    k = so3.hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), k.shape)
    return eye - 0.5 * k + d[..., None, None] * (k @ k)


def _rt_to_matrix(rot: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    batch = jnp.broadcast_shapes(rot.shape[:-2], t.shape[:-1])
    out = jnp.zeros(batch + (4, 4), dtype=rot.dtype)
    out = out.at[..., :3, :3].set(rot)
    out = out.at[..., :3, 3].set(t)
    out = out.at[..., 3, 3].set(1.0)
    return out


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Exponential map se(3) -> SE(3).

    xi: (..., 6) twist (upsilon, phi) -> (..., 4, 4) homogeneous transform,
    with translation t = V(phi) @ upsilon  (reference: Se3.from_se3,
    special_euclidean_group.py:105-123).
    """
    upsilon, phi = xi[..., :3], xi[..., 3:]
    rot = so3.exp(phi)
    t = jnp.einsum("...ij,...j->...i", left_jacobian(phi), upsilon)
    return _rt_to_matrix(rot, t)


def log(transform: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map SE(3) -> se(3): (..., 4, 4) -> (..., 6) twist."""
    rot = transform[..., :3, :3]
    t = transform[..., :3, 3]
    phi = so3.log(rot)
    upsilon = jnp.einsum("...ij,...j->...i", left_jacobian_inverse(phi), t)
    return jnp.concatenate([upsilon, phi], axis=-1)


def hat(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) twist -> 4x4 matrix representation [[hat(phi), upsilon], [0, 0]]."""
    upsilon, phi = xi[..., :3], xi[..., 3:]
    out = jnp.zeros(xi.shape[:-1] + (4, 4), dtype=xi.dtype)
    out = out.at[..., :3, :3].set(so3.hat(phi))
    out = out.at[..., :3, 3].set(upsilon)
    return out


def identity(dtype=jnp.float32, batch_shape: tuple = ()) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), batch_shape + (4, 4))


def inverse(transform: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse: [R^T, -R^T t]."""
    rot_t = jnp.swapaxes(transform[..., :3, :3], -1, -2)
    t = transform[..., :3, 3]
    new_t = -jnp.einsum("...ij,...j->...i", rot_t, t)
    return _rt_to_matrix(rot_t, new_t)


def compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Group product a @ b."""
    return a @ b


def from_rt(rot: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return _rt_to_matrix(rot, t)


def transform_points(transform: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply SE(3) to (..., N, 3) points (rotation + translation)."""
    rot = transform[..., :3, :3]
    t = transform[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", rot, points) + t[..., None, :]


def adjoint(transform: jnp.ndarray) -> jnp.ndarray:
    """Adjoint Ad_T: (..., 4, 4) -> (..., 6, 6) for twists (upsilon, phi):
    Ad = [[R, hat(t) @ R], [0, R]], so exp(Ad_T xi) = T exp(xi) T^-1."""
    rot = transform[..., :3, :3]
    t = transform[..., :3, 3]
    out = jnp.zeros(transform.shape[:-2] + (6, 6), dtype=transform.dtype)
    out = out.at[..., :3, :3].set(rot)
    out = out.at[..., :3, 3:].set(so3.hat(t) @ rot)
    out = out.at[..., 3:, 3:].set(rot)
    return out


def from_quat_t(quat_wxyz: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Build SE(3) matrix from (w,x,y,z) quaternion + translation."""
    return _rt_to_matrix(so3.from_quat(quat_wxyz), t)


def to_quat_t(transform: jnp.ndarray):
    """SE(3) matrix -> ((w,x,y,z) quaternion, translation)."""
    return so3.to_quat(transform[..., :3, :3]), transform[..., :3, 3]
