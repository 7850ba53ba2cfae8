"""Sobel image gradients (separable, symmetric borders).

Capability parity with the reference's ``compute_gradients``
(``/root/reference/src/dense_visual_odometry/utils/jacobian.py:47-73``):
3x3 Sobel with cv2.BORDER_REFLECT (= numpy 'symmetric': edge pixel is
duplicated).  Implemented as two separable 1-D convolutions fused by XLA.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _pad_symmetric(image: jnp.ndarray) -> jnp.ndarray:
    pad_width = [(0, 0)] * (image.ndim - 2) + [(1, 1), (1, 1)]
    return jnp.pad(image, pad_width, mode="symmetric")


def sobel(image: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3x3 Sobel gradients of an (..., H, W) image -> (gx, gy) float32.

    gx = [[-1,0,1],[-2,0,2],[-1,0,1]] * I,  gy = gx^T * I  (correlation,
    matching cv2.Sobel(dx=1/dy=1, ksize=3) with BORDER_REFLECT).
    """
    img = _pad_symmetric(image.astype(jnp.float32))
    h, w = image.shape[-2], image.shape[-1]

    def win(dy: int, dx: int) -> jnp.ndarray:
        return img[..., dy : dy + h, dx : dx + w]

    # Separable: smooth [1,2,1] along one axis, differentiate [-1,0,1] along
    # the other.  Expressed directly on shifted planes; XLA fuses the adds.
    smooth_rows = win(0, 0) + 2.0 * win(1, 0) + win(2, 0), \
        win(0, 1) + 2.0 * win(1, 1) + win(2, 1), \
        win(0, 2) + 2.0 * win(1, 2) + win(2, 2)
    gx = smooth_rows[2] - smooth_rows[0]

    smooth_cols = win(0, 0) + 2.0 * win(0, 1) + win(0, 2), \
        win(1, 0) + 2.0 * win(1, 1) + win(1, 2), \
        win(2, 0) + 2.0 * win(2, 1) + win(2, 2)
    gy = smooth_cols[2] - smooth_cols[0]
    return gx, gy
