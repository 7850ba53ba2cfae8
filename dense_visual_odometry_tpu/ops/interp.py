"""Masked bilinear sampling (the warp gather).

Capability parity with the reference's ``interpolate_bilinear``
(CPU: ``cpu_robust_dense_visual_odometry.py:202-254``, CUDA device fn:
``cuda/residuals_kernel.py:22-43``) with the TPU-native design change that
out-of-bounds samples return ``(0, valid=False)`` instead of NaN: masks keep
the downstream reductions NaN-free and XLA-friendly (no isnan scans).

Bounds convention matches the reference exactly: a sample at (u, v) is
valid iff ``floor(u) >= 0``, ``floor(v) >= 0``, ``floor(u)+1 <= W-1`` and
``floor(v)+1 <= H-1``.  (The reference CPU version has an OOB bug — it
writes NaN then keeps indexing with wrapped negative indices,
cpu_…py:240-252; the CUDA version returns early.  We implement the correct
CUDA semantics.)
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def bilinear_sample(
    image: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample ``image`` at subpixel coordinates.

    Parameters
    ----------
    image : (..., H, W) float array.
    u, v : (..., H', W') sample coordinates (u = column/x, v = row/y) with
        the same leading batch dims as ``image`` (each batch element
        samples its own image).

    Returns
    -------
    values : same shape as u/v, float32; 0 where invalid.
    valid : same shape, bool.
    """
    h, w = image.shape[-2], image.shape[-1]
    x0f = jnp.floor(u)
    y0f = jnp.floor(v)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    valid = (x0 >= 0) & (y0 >= 0) & (x0 + 1 <= w - 1) & (y0 + 1 <= h - 1)

    # Clip for safe gathers; invalid lanes are masked afterwards.
    x0c = jnp.clip(x0, 0, w - 2)
    y0c = jnp.clip(y0, 0, h - 2)

    wx = u - x0f
    wy = v - y0f

    img = image.astype(jnp.float32)
    flat = img.reshape(image.shape[:-2] + (h * w,))
    base = (y0c * w + x0c).reshape(u.shape[:-2] + (-1,))

    def gather(offset):
        vals = jnp.take_along_axis(flat, base + offset, axis=-1)
        return vals.reshape(u.shape)

    v00 = gather(0)
    v01 = gather(1)
    v10 = gather(w)
    v11 = gather(w + 1)

    top = v00 + wx * (v01 - v00)
    bot = v10 + wx * (v11 - v10)
    values = top + wy * (bot - top)
    return jnp.where(valid, values, 0.0), valid
