"""Pinhole RGB-D camera model as an immutable pytree.

Capability parity with the reference ``RGBDCameraModel``
(``/root/reference/src/dense_visual_odometry/camera_model.py``): YAML loading,
per-pyramid-level intrinsics scaling (camera_model.py:62-79), dense
deproject/project (camera_model.py:171-252) — re-designed for XLA:

- ``deproject`` is *dense* over the full H x W grid and returns a validity
  mask instead of compacting points (fixed shapes; the reference's boolean
  compaction is shape-dynamic and jit-hostile).
- No memo-cache (reference used ``@np_cache``): under ``jit`` the deproject
  of the constant depth image is hoisted/fused by XLA, which subsumes it.
- Works under ``vmap`` (all functions are shape-polymorphic over leading
  batch dims of the image arguments).

Level-``l`` intrinsics use the same convention as the reference:
``K_l = S_l @ K`` with ``S_l = [[2^-l, 0, 2^(-l-1) - 0.5], [0, 2^-l,
2^(-l-1) - 0.5], [0, 0, 1]]`` which maps full-resolution pixel centers onto
the decimated grid produced by dropping odd rows/cols.
"""

from __future__ import annotations

from pathlib import Path
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
import yaml

INTRINSICS_KEY = "intrinsics"
DEPTH_SCALE_KEY = "depth_scale"
DISTORTION_COEFFS_KEY = "distorssion_coefficients"  # reference spelling
DISTORTION_MODEL_KEY = "distorssion_model"


class CameraModel(NamedTuple):
    """Pinhole camera: 3x3 intrinsics + depth scale (DN -> meters)."""

    intrinsics: jnp.ndarray  # (3, 3) float32
    depth_scale: float

    @classmethod
    def create(cls, intrinsics, depth_scale: float) -> "CameraModel":
        intrinsics = jnp.asarray(intrinsics, dtype=jnp.float32)
        if intrinsics.shape not in ((3, 3), (3, 4)):
            raise ValueError(f"expected 3x3 intrinsics, got {intrinsics.shape}")
        if intrinsics.shape == (3, 4):
            intrinsics = intrinsics[:, :3]
        if depth_scale < 0:
            raise ValueError("depth_scale must be non-negative")
        return cls(intrinsics=intrinsics, depth_scale=float(depth_scale))

    @classmethod
    def from_yaml(cls, filepath) -> "CameraModel":
        """Load from a camera-intrinsics YAML (same schema as the reference:
        keys ``intrinsics`` (3x3 nested list) and ``depth_scale``)."""
        filepath = Path(filepath)
        if not filepath.exists():
            raise FileNotFoundError(f"camera intrinsics file not found: {filepath}")
        with filepath.open("r") as fp:
            data = yaml.safe_load(fp)
        try:
            intrinsics = np.asarray(data[INTRINSICS_KEY], dtype=np.float32)
            depth_scale = float(data[DEPTH_SCALE_KEY])
        except KeyError as exc:
            raise KeyError(f"missing key in camera YAML {filepath}: {exc}") from exc
        return cls.create(intrinsics, depth_scale)

    # -- per-level intrinsics ----------------------------------------------
    def level_scale_matrix(self, level: int) -> jnp.ndarray:
        if level < 0:
            raise ValueError(f"level must be >= 0, got {level}")
        inv = 2.0 ** (-level)
        off = 2.0 ** (-level - 1) - 0.5
        return jnp.asarray(
            [[inv, 0.0, off], [0.0, inv, off], [0.0, 0.0, 1.0]], dtype=jnp.float32
        )

    def at(self, level: int) -> jnp.ndarray:
        """Intrinsics for pyramid level ``level`` (level 0 = full res)."""
        if level == 0:
            return self.intrinsics
        return self.level_scale_matrix(level) @ self.intrinsics

    def scaled(self, level: int) -> "CameraModel":
        """Camera model whose level-0 intrinsics are this model's level-l."""
        return CameraModel(intrinsics=self.at(level), depth_scale=self.depth_scale)

    # -- geometry ------------------------------------------------------------
    def deproject(self, depth_image: jnp.ndarray, level: int = 0):
        """Dense deprojection of a raw depth image to camera-frame points.

        Parameters
        ----------
        depth_image : (..., H, W) raw depth (DN); 0 marks invalid pixels.
        level : pyramid level whose intrinsics to use.

        Returns
        -------
        points : (..., H, W, 3) float32 camera-frame XYZ in meters (invalid
            pixels produce zeros).
        valid : (..., H, W) bool, True where depth != 0.
        """
        depth_image = jnp.asarray(depth_image)
        h, w = depth_image.shape[-2], depth_image.shape[-1]
        z = depth_image.astype(jnp.float32) * self.depth_scale
        valid = depth_image != 0

        k = self.at(level)
        k_inv = jnp.linalg.inv(k)
        u = jnp.arange(w, dtype=jnp.float32)
        v = jnp.arange(h, dtype=jnp.float32)
        # Rays for each pixel: K^-1 @ [u, v, 1]
        ray_x = k_inv[0, 0] * u[None, :] + k_inv[0, 1] * v[:, None] + k_inv[0, 2]
        ray_y = k_inv[1, 0] * u[None, :] + k_inv[1, 1] * v[:, None] + k_inv[1, 2]
        x = ray_x * z
        y = ray_y * z
        return jnp.stack([x, y, z], axis=-1), valid

    def project(self, points: jnp.ndarray, level: int = 0) -> jnp.ndarray:
        """Project camera-frame XYZ points to (sub)pixel coordinates.

        points: (..., 3) -> (..., 2) pixel (u, v).  Points with z <= 0 give
        non-finite/garbage coordinates; callers mask via bounds checks.
        """
        k = self.at(level)
        x, y, z = points[..., 0], points[..., 1], points[..., 2]
        z_safe = jnp.where(z == 0.0, jnp.ones_like(z), z)
        u = (k[0, 0] * x + k[0, 1] * y + k[0, 2] * z) / z_safe
        v = (k[1, 1] * y + k[1, 2] * z) / z_safe
        return jnp.stack([u, v], axis=-1)
