"""Gather-free bilinear warping via a shift stack.

XLA TPU gathers cost ~8 ns per index while image shifts (pad + static
slice) and fused elementwise work run at HBM speed (measured on v5e, see
benchmarks/RESULTS.md).  When the warp displacement ``d(p) = (u,v)(p) - p``
is bounded by a small ``radius`` — high-frame-rate streams, fine pyramid
levels after coarse initialization, loop-closure verification at near-
identity — bilinear sampling decomposes over integer shifts:

    out(p) = sum_{|k| <= radius} tent(du(p)-kx) tent(dv(p)-ky) I2[p + k]

Each term is a static slice of the padded image plus fused multiply-adds:
``(2*radius+1)^2`` vector passes, zero gathers.  Pixels with displacement
outside the ball are reported invalid (masked out downstream, like any
out-of-bounds warp).  On the valid set this equals
``interp.bilinear_sample`` exactly (same tent weights).

Cost model: worthwhile when ``(2r+1)^2`` elementwise passes beat
``2 x H x W`` gather indices — on v5e roughly radius <= 6 for full-res
640x480 batches.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def shift_coverage(
    u: jnp.ndarray,
    v: jnp.ndarray,
    radius: int,
    grid_stride: int = 1,
    coord_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fraction of valid pixels the recentered shift ball would keep.

    Same recentering math as :func:`shift_stack_sample`; returns
    (...,) float in [0, 1] — the solver's fallback trigger: a low value
    means the shift-stack path would silently mask away most of the
    image (large rotation/parallax spread or mean displacement beyond
    the recentering bound), so a gather-based warp should be used
    instead (``RobustDVOConfig.shift_stack_fallback``).
    """
    hp, wp = u.shape[-2], u.shape[-1]
    s = grid_stride
    col = jnp.arange(wp, dtype=jnp.float32) * s
    row = jnp.arange(hp, dtype=jnp.float32) * s
    du = u - col[None, :]
    dv = v - row[:, None]
    center_bound = 4 * radius
    if coord_mask is not None:
        mf = coord_mask.astype(jnp.float32)
    else:
        mf = jnp.ones(u.shape, jnp.float32)
    denom = jnp.maximum(jnp.sum(mf, axis=(-2, -1)), 1.0)
    mean_du = jnp.sum(du * mf, axis=(-2, -1)) / denom
    mean_dv = jnp.sum(dv * mf, axis=(-2, -1)) / denom
    cu = jnp.clip(jnp.round(mean_du), -center_bound, center_bound)
    cv = jnp.clip(jnp.round(mean_dv), -center_bound, center_bound)
    du = du - cu[..., None, None]
    dv = dv - cv[..., None, None]
    in_ball = (
        (du > -radius) & (du < radius) & (dv > -radius) & (dv < radius)
    )
    kept = jnp.sum(in_ball.astype(jnp.float32) * mf, axis=(-2, -1))
    return kept / denom


def shift_stack_sample(
    image: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    radius: int = 3,
    grid_stride: int = 1,
    coord_mask: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample ``image`` at (u, v) without gathers.

    Parameters
    ----------
    image : (..., H, W) float source image.
    u, v : (..., H', W') absolute subpixel sample coordinates (in the
        image's full-resolution pixel units).  With ``grid_stride`` s,
        the sample grid entry (i, j) corresponds to full-res pixel
        (s*j, s*i) — the layout ``warp_residuals(..., grid_stride=s)``
        produces.
    radius : integer shift radius in full-res pixels; displacements with
        ``|du| >= radius`` or ``|dv| >= radius`` become invalid.
    coord_mask : optional (..., H', W') bool marking entries of u/v that
        hold REAL coordinates.  Invalid-depth pixels carry garbage
        coordinates; without the mask they corrupt the recentering mean.

    Returns
    -------
    values : (..., H', W') float32, 0 where invalid.
    valid : (..., H', W') bool — in-bounds AND inside the shift ball.
    """
    if radius < 1:
        raise ValueError("radius must be >= 1")
    h, w = image.shape[-2], image.shape[-1]
    hp, wp = u.shape[-2], u.shape[-1]
    s = grid_stride
    img = image.astype(jnp.float32)

    col = jnp.arange(wp, dtype=jnp.float32) * s
    row = jnp.arange(hp, dtype=jnp.float32) * s
    du = u - col[None, :]
    dv = v - row[:, None]

    # Recenter: absorb the mean integer displacement (the translational
    # bulk of the warp) into one per-batch-element window slice — a block
    # DMA, not a gather — so ``radius`` only needs to cover the *spread*
    # (rotation/parallax), not the whole motion.
    center_bound = 4 * radius
    if coord_mask is not None:
        mf = coord_mask.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(mf, axis=(-2, -1)), 1.0)
        mean_du = jnp.sum(du * mf, axis=(-2, -1)) / denom
        mean_dv = jnp.sum(dv * mf, axis=(-2, -1)) / denom
    else:
        mean_du = jnp.mean(du, axis=(-2, -1))
        mean_dv = jnp.mean(dv, axis=(-2, -1))
    cu = jnp.clip(jnp.round(mean_du), -center_bound, center_bound).astype(jnp.int32)
    cv = jnp.clip(jnp.round(mean_dv), -center_bound, center_bound).astype(jnp.int32)
    du = du - cu[..., None, None].astype(jnp.float32)
    dv = dv - cv[..., None, None].astype(jnp.float32)

    in_ball = (
        (du > -radius) & (du < radius) & (dv > -radius) & (dv < radius)
    )
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    in_bounds = (x0 >= 0) & (y0 >= 0) & (x0 + 1 <= w - 1) & (y0 + 1 <= h - 1)
    valid = in_ball & in_bounds

    pad = radius + center_bound
    padded = jnp.pad(
        img, [(0, 0)] * (img.ndim - 2) + [(pad, pad), (pad, pad)]
    )
    # Per-batch-element recentered window of size (H + 2r, W + 2r):
    # window[p + k] == image[p + c + k] for k in [-r, r].
    win_h = h + 2 * radius
    win_w = w + 2 * radius
    batch_shape = padded.shape[:-2]
    if batch_shape:
        flat = padded.reshape((-1,) + padded.shape[-2:])
        cu_f = jnp.broadcast_to(cu, batch_shape).reshape(-1)
        cv_f = jnp.broadcast_to(cv, batch_shape).reshape(-1)
        window = jax.vmap(
            lambda im, sy, sx: jax.lax.dynamic_slice(
                im, (center_bound + sy, center_bound + sx), (win_h, win_w)
            )
        )(flat, cv_f, cu_f)
        window = window.reshape(batch_shape + (win_h, win_w))
    else:
        window = jax.lax.dynamic_slice(
            padded, (center_bound + cv, center_bound + cu), (win_h, win_w)
        )

    acc = jnp.zeros(u.shape, jnp.float32)
    for ky in range(-radius, radius + 1):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dv - ky))
        row_slice = window[
            ..., radius + ky : radius + ky + (hp - 1) * s + 1 : s, :
        ]
        for kx in range(-radius, radius + 1):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(du - kx))
            shifted = row_slice[
                ..., radius + kx : radius + kx + (wp - 1) * s + 1 : s
            ]
            acc = acc + (wy * wx) * shifted
    return jnp.where(valid, acc, 0.0), valid
