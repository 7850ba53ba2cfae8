"""Lie-group utilities: SO(3)/SE(3) maps + a thin host-level ``Pose`` wrapper.

The compute path uses the functional modules :mod:`so3` / :mod:`se3`
directly (pure jnp over matrices).  ``Pose`` exists for the session / CLI
layer where the reference used its ``Se3`` class
(``/root/reference/src/dense_visual_odometry/utils/lie_algebra/__init__.py``):
it wraps a 4x4 matrix, is an immutable pytree, and supports the same
operations (exp/log/inverse/product/identity/TUM quaternion I/O).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dense_visual_odometry_tpu.utils.lie import se3, so3  # noqa: F401

# Host-level Pose methods dispatch through these jitted entry points.  In
# this environment eager op-by-op dispatch compiles each primitive (~0.3 s
# per op); routing through jit makes Pose arithmetic effectively free after
# the first call and the executables land in the persistent compile cache.
_jit_se3_exp = jax.jit(se3.exp)
_jit_se3_log = jax.jit(se3.log)
_jit_se3_inverse = jax.jit(se3.inverse)
_jit_se3_compose = jax.jit(se3.compose)
_jit_from_quat_t = jax.jit(se3.from_quat_t)
_jit_to_quat_t = jax.jit(se3.to_quat_t)
_jit_transform_points = jax.jit(se3.transform_points)
_jit_rel_log = jax.jit(lambda a, b: se3.log(se3.compose(se3.inverse(a), b)))


class Pose(NamedTuple):
    """An SE(3) group element stored as a 4x4 homogeneous matrix.

    Registered as a pytree (NamedTuple), so it can flow through jit/vmap.
    """

    matrix: jnp.ndarray  # (..., 4, 4)

    # -- constructors ------------------------------------------------------
    @classmethod
    def identity(cls, dtype=jnp.float32) -> "Pose":
        return cls(jnp.eye(4, dtype=dtype))

    @classmethod
    def from_xi(cls, xi) -> "Pose":
        """From a 6-vector twist (upsilon, phi)."""
        xi = jnp.asarray(xi, dtype=jnp.float32).reshape(6)
        return cls(_jit_se3_exp(xi))

    @classmethod
    def from_matrix(cls, m) -> "Pose":
        return cls(jnp.asarray(m, dtype=jnp.float32).reshape(4, 4))

    @classmethod
    def from_rt(cls, rot, t) -> "Pose":
        return cls(se3.from_rt(jnp.asarray(rot, jnp.float32), jnp.asarray(t, jnp.float32)))

    @classmethod
    def from_tum(cls, tx, ty, tz, qx, qy, qz, qw) -> "Pose":
        """From TUM trajectory layout: translation + xyzw quaternion."""
        quat = jnp.asarray([qw, qx, qy, qz], dtype=jnp.float32)
        t = jnp.asarray([tx, ty, tz], dtype=jnp.float32)
        return cls(_jit_from_quat_t(quat, t))

    # -- group operations --------------------------------------------------
    def log(self) -> jnp.ndarray:
        return _jit_se3_log(self.matrix)

    def inverse(self) -> "Pose":
        return Pose(_jit_se3_inverse(self.matrix))

    def __mul__(self, other: "Pose") -> "Pose":
        return Pose(_jit_se3_compose(self.matrix, other.matrix))

    def transform(self, points) -> jnp.ndarray:
        return _jit_transform_points(self.matrix, points)

    # -- accessors ----------------------------------------------------------
    @property
    def rotation(self) -> jnp.ndarray:
        return self.matrix[..., :3, :3]

    @property
    def translation(self) -> jnp.ndarray:
        return self.matrix[..., :3, 3]

    def to_tum(self) -> tuple:
        """-> (tx, ty, tz, qx, qy, qz, qw) floats for TUM trajectory files."""
        quat, t = _jit_to_quat_t(self.matrix)
        quat = np.asarray(quat)
        t = np.asarray(t)
        return (
            float(t[0]), float(t[1]), float(t[2]),
            float(quat[1]), float(quat[2]), float(quat[3]), float(quat[0]),
        )

    def allclose(self, other: "Pose", atol: float = 1e-5) -> bool:
        return bool(np.allclose(_jit_rel_log(self.matrix, other.matrix), 0.0, atol=atol))


__all__ = ["so3", "se3", "Pose"]
