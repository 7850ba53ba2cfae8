"""Image pyramid ops: 3x3 median smoothing + decimation, on device.

Capability parity with the reference's ``pyrDownMedianSmooth`` /
``ImagePyramid`` (``/root/reference/src/dense_visual_odometry/utils/image_pyramid.py:19-65``):
a pyramid level is ``median3x3(previous)[::2, ::2]``.  The reference runs
this on the host with OpenCV even for its GPU backend (image_pyramid.py:98-107,
a per-frame host round-trip); here the whole pyramid is built on-device
inside the tracking jit, so frames are uploaded once at full resolution.

The 3x3 median uses a fixed 19-compare-exchange selection network — pure
elementwise min/max on the VPU, no sorting, no data-dependent control flow.
Border handling matches cv2.medianBlur (BORDER_REPLICATE).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _shift_stack_3x3(image: jnp.ndarray) -> list:
    """The 9 3x3-neighbourhood planes of ``image`` with replicated borders.

    image: (..., H, W) -> list of 9 arrays (..., H, W).
    """
    pad_width = [(0, 0)] * (image.ndim - 2) + [(1, 1), (1, 1)]
    padded = jnp.pad(image, pad_width, mode="edge")
    h, w = image.shape[-2], image.shape[-1]
    planes = []
    for dy in range(3):
        for dx in range(3):
            planes.append(padded[..., dy : dy + h, dx : dx + w])
    return planes


def median3x3(image: jnp.ndarray) -> jnp.ndarray:
    """3x3 median filter, replicate borders (cv2.medianBlur semantics).

    Uses the classic 19-exchange median-of-9 selection network
    (Paeth / Smith), which is exact for any dtype ordering.
    """
    p = _shift_stack_3x3(image)

    def cx(i: int, j: int) -> None:
        lo = jnp.minimum(p[i], p[j])
        hi = jnp.maximum(p[i], p[j])
        p[i], p[j] = lo, hi

    # Median-of-9 selection network (19 compare-exchanges).
    cx(1, 2); cx(4, 5); cx(7, 8)
    cx(0, 1); cx(3, 4); cx(6, 7)
    cx(1, 2); cx(4, 5); cx(7, 8)
    cx(0, 3); cx(5, 8); cx(4, 7)
    cx(3, 6); cx(1, 4); cx(2, 5)
    cx(4, 7); cx(4, 2); cx(6, 4)
    cx(4, 2)
    return p[4]


def pyr_down(image: jnp.ndarray) -> jnp.ndarray:
    """One pyramid step: median smooth then drop odd rows/columns."""
    return median3x3(image)[..., ::2, ::2]


def build_pyramid(image: jnp.ndarray, levels: int) -> Tuple[jnp.ndarray, ...]:
    """Coarse-to-fine pyramid: ``out[0]`` is the input, ``out[l]`` halves it.

    Returns a static tuple (length known at trace time) so downstream code
    can unroll over levels inside jit.
    """
    if levels < 1:
        raise ValueError(f"levels must be >= 1, got {levels}")
    out = [image]
    for _ in range(1, levels):
        out.append(pyr_down(out[-1]))
    return tuple(out)


def rgb_to_gray(rgb: jnp.ndarray, quantize: bool = False) -> jnp.ndarray:
    """ITU-R BT.601 luma from an (..., H, W, 3) RGB image, float32 [0, 255].

    ``quantize=True`` rounds to integer intensities, matching the uint8
    grayscale the reference feeds its solver (cv2.cvtColor at
    base_dense_visual_odometry.py:58).  Default keeps full precision —
    strictly more information for the photometric solver.
    """
    rgb = rgb.astype(jnp.float32)
    gray = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    if quantize:
        gray = jnp.round(gray)
    return gray


def preprocess_depth(
    depth_raw: jnp.ndarray, depth_scale: float, max_distance: float = 5.0
) -> jnp.ndarray:
    """Raw depth DN -> meters, with far points zeroed (= invalidated).

    Matches the reference's noisy-point clamp (depth * scale > max_distance
    -> 0, base_dense_visual_odometry.py:59).
    """
    z = depth_raw.astype(jnp.float32) * depth_scale
    return jnp.where(z > max_distance, 0.0, z)
