"""TPU-native dense visual odometry / dense-SLAM framework.

A from-scratch JAX/XLA/Pallas implementation of coarse-to-fine photometric
RGB-D odometry (Kerl et al., "Robust Odometry Estimation for RGB-D Cameras")
plus keyframe / pose-graph backends, designed TPU-first:

- All per-frame solves are single fused ``jit`` programs (pyramids, warp,
  residual/Jacobian, IRLS, Gauss-Newton with on-device stopping logic).
- Fixed shapes + validity masks instead of boolean compaction.
- Normal equations reduced on-device (6x6 out, never a pixel readback).
- Batched multi-pair tracking via ``vmap``; multi-chip via ``Mesh``/``pjit``.

Capability parity target: pfontana96/dense-visual-odometry (see SURVEY.md).
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry code (Lie maps, 3x3/4x4 compositions, K^-1 rays) must run at full
# f32; the TPU default lowers f32 matmuls to bf16 passes which injects ~1e-4
# errors into rotations.  Kernels that can tolerate bf16 opt in explicitly
# via precision= / preferred_element_type= at the call site.
_jax.config.update("jax_default_matmul_precision", "highest")

from dense_visual_odometry_tpu import utils  # noqa: F401
from dense_visual_odometry_tpu.camera import CameraModel  # noqa: F401
from dense_visual_odometry_tpu.utils.lie import Pose  # noqa: F401
