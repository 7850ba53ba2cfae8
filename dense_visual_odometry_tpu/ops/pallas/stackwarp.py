"""Pallas kernel: fused shift-stack warp accumulation.

The XLA formulation of the shift-stack warp (``ops/shiftwarp.py``) lowers
to (2r+1)^2 separate passes that each re-read the source window from HBM
— measured ~0.03 ms per term at 640x480/batch-32, i.e. the window is
re-streamed ~81x per GN iteration.  This kernel holds the window (split
into stride-parity planes) in VMEM and accumulates ALL (2r+1)^2 tent
taps from on-chip memory: HBM traffic drops from ~(2r+1)^2 to ~1 window
read per call.

Design notes:

- grid = (B,): one step per batch element; all refs are full-array VMEM
  blocks (window planes ~1.3 MB + coords/acc ~1.5 MB — well under VMEM).
- ``grid_stride`` s in {1, 2} is handled by pre-splitting the recentered
  window into s^2 parity planes on the XLA side, so every in-kernel
  slice is a STATIC unit-stride slice (Mosaic has no strided slicing):
  ``window[a + s*i, b + s*j] == plane[a % s][b % s][a//s + i, b//s + j]``.
- The (2r+1)^2 tap loop is a static Python unroll of VPU fused
  multiply-adds; tent weights are computed once per row-offset.

The XLA twin remains the fallback; correctness tests compare the two in
interpreter mode, and the solver opts in via
``RobustDVOConfig.use_pallas_stack`` (TPU only).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stack_kernel(radius: int, hp: int, wp: int, stride: int):
    """Build the kernel body for static (radius, output shape, stride).

    Mosaic cannot slice VMEM values at arbitrary lane offsets (the lane
    dim wants 128-aligned starts), so per-tap shifts are expressed as
    ``pltpu.roll`` (cheap register lane/sublane rotations) followed by an
    aligned [0:hp, 0:wp] window.
    """

    def kernel(planes_ref, du_ref, dv_ref, out_ref):
        du = du_ref[0]
        dv = dv_ref[0]
        n_planes = stride * stride
        ph = planes_ref.shape[-2]
        pw = planes_ref.shape[-1]
        out_ref[0] = jnp.zeros((hp, wp), jnp.float32)
        # Accumulate through the output ref per tap: without the memory
        # round-trip the compiler keeps all (2r+1)^2 shifted temporaries
        # live simultaneously and overflows VMEM at full-image extents.
        for ky in range(-radius, radius + 1):
            a = radius + ky
            pa, qa = a % stride, a // stride
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(dv - ky))
            for pb in range(stride):
                plane_idx = pa * stride + pb
                # roll accepts non-negative shifts; a left shift by q is
                # a right roll by size - q (wrapped entries land beyond
                # the [:hp]/[:wp] window by construction).
                row = pltpu.roll(
                    planes_ref[0, plane_idx], (ph - qa) % ph, axis=0
                )
                for kx in range(-radius, radius + 1):
                    b = radius + kx
                    if b % stride != pb:
                        continue
                    qb = b // stride
                    shifted = pltpu.roll(row, (pw - qb) % pw, axis=1)[:hp, :wp]
                    wx = jnp.maximum(0.0, 1.0 - jnp.abs(du - kx))
                    out_ref[0] = out_ref[0] + (wy * wx) * shifted
        del n_planes

    return kernel


@functools.partial(
    jax.jit, static_argnames=("radius", "grid_stride", "interpret")
)
def stack_accumulate_pallas(
    planes: jnp.ndarray,
    du: jnp.ndarray,
    dv: jnp.ndarray,
    radius: int,
    grid_stride: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """Accumulate tent-weighted taps from parity planes.

    planes : (B, s^2, ph, pw) f32 — parity-split recentered windows.
    du, dv : (B, H', W') f32 recentered residual displacements.
    -> (B, H', W') f32 accumulated samples (validity handled by caller).
    """
    b, _, ph, pw = planes.shape
    hp, wp = du.shape[-2], du.shape[-1]
    kernel = _stack_kernel(radius, hp, wp, grid_stride)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, grid_stride * grid_stride, ph, pw),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, hp, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp), jnp.float32),
        interpret=interpret,
    )(planes, du, dv)


def compute_recenter(
    u: jnp.ndarray,
    v: jnp.ndarray,
    radius: int,
    grid_stride: int = 1,
    coord_mask: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Integer recentering offsets (cu, cv) absorbing the mean displacement.

    u, v (..., H', W') -> (...,) int32 each, clipped to +-4*radius.
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
        denom = jnp.maximum(jnp.sum(mf, axis=(-2, -1)), 1.0)
        mean_du = jnp.sum(du * mf, axis=(-2, -1)) / denom
        mean_dv = jnp.sum(dv * mf, axis=(-2, -1)) / denom
    else:
        mean_du = jnp.mean(du, axis=(-2, -1))
        mean_dv = jnp.mean(dv, axis=(-2, -1))
    cu = jnp.clip(jnp.round(mean_du), -center_bound, center_bound).astype(jnp.int32)
    cv = jnp.clip(jnp.round(mean_dv), -center_bound, center_bound).astype(jnp.int32)
    return cu, cv


def residual_displacements(
    u: jnp.ndarray,
    v: jnp.ndarray,
    cu: jnp.ndarray,
    cv: jnp.ndarray,
    radius: int,
    grid_stride: int,
    image_h: int,
    image_w: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Center-relative displacements + validity for a GIVEN recentering.

    -> (du, dv (..., H', W') f32, valid bool).  Validity = inside the
    shift ball around (cu, cv) AND bilinear-in-bounds in the source image.
    """
    hp, wp = u.shape[-2], u.shape[-1]
    s = grid_stride
    col = jnp.arange(wp, dtype=jnp.float32) * s
    row = jnp.arange(hp, dtype=jnp.float32) * s
    du = u - col[None, :] - cu[..., None, None].astype(jnp.float32)
    dv = v - row[:, None] - cv[..., None, None].astype(jnp.float32)
    in_ball = (du > -radius) & (du < radius) & (dv > -radius) & (dv < radius)
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    in_bounds = (
        (x0 >= 0) & (y0 >= 0) & (x0 + 1 <= image_w - 1) & (y0 + 1 <= image_h - 1)
    )
    return du, dv, in_ball & in_bounds


def extract_parity_planes(
    image: jnp.ndarray,
    cu: jnp.ndarray,
    cv: jnp.ndarray,
    grid_hp: int,
    grid_wp: int,
    radius: int,
    grid_stride: int = 1,
) -> jnp.ndarray:
    """Recentered window extraction + parity split for the stack kernels.

    image (B, H, W), cu/cv (B,) int32 -> planes (B, s^2, ph, pw) f32 with
    ``window[a + s*i, b + s*j] == plane[a % s * s + b % s][a//s + i, b//s + j]``
    and window[p + k] == image[p + c + k] for k in [-radius, radius].
    """
    s = grid_stride
    center_bound = 4 * radius
    img = image.astype(jnp.float32)
    pad = radius + center_bound
    padded = jnp.pad(img, [(0, 0), (pad, pad), (pad, pad)])
    # Window over the FULL-RES support of the strided grid.
    win_h = (grid_hp - 1) * s + 1 + 2 * radius
    win_w = (grid_wp - 1) * s + 1 + 2 * radius
    window = jax.vmap(
        lambda im, sy, sx: jax.lax.dynamic_slice(
            im, (center_bound + sy, center_bound + sx), (win_h, win_w)
        )
    )(padded, cv, cu)

    # Parity planes: plane[p*s+q][m, n] = window[s*m + p, s*n + q].
    # Plane extent must cover q_max + hp with q_max = 2r // s.
    ph = (2 * radius) // s + grid_hp
    pw = (2 * radius) // s + grid_wp
    plane_pad_h = ph * s - win_h + s
    plane_pad_w = pw * s - win_w + s
    window = jnp.pad(
        window, [(0, 0), (0, max(plane_pad_h, 0)), (0, max(plane_pad_w, 0))]
    )
    return jnp.stack(
        [
            window[:, p::s, q::s][:, :ph, :pw]
            for p in range(s)
            for q in range(s)
        ],
        axis=1,
    )


def block_layout(
    grid_hp: int, n_blocks: int, radius_y: int, grid_stride: int
) -> Tuple[int, int, int]:
    """Slab-layout geometry for per-row-block recentering.

    The grid's rows are split into ``n_blocks`` contiguous blocks of
    ``t`` rows (the last may be partial); each block gets its OWN
    integer recentering offset, so the shift ball only has to cover the
    within-block displacement spread instead of the whole image's — the
    lever that lets rotation-heavy motion keep a small ``radius``
    (ROADMAP item 1).  Every per-pixel tensor is laid out as ``n_blocks``
    stacked slabs of ``t + halo`` rows, where the ``halo`` rows duplicate
    the next block's first grid rows (masked out of validity) so the
    kernel's uniform vertical rolls never cross into a slab extracted
    with a different center.

    -> (n_blocks_effective, t, halo): block count clamped to the grid,
    grid rows per block, halo rows per slab (= max vertical roll, set by
    the VERTICAL tap radius).
    """
    nblk = max(1, min(n_blocks, grid_hp))
    t = -(-grid_hp // nblk)
    nblk = -(-grid_hp // t)
    halo = (2 * radius_y) // grid_stride
    return nblk, t, halo


def compute_recenter_blocks(
    u: jnp.ndarray,
    v: jnp.ndarray,
    radius: int,
    grid_stride: int,
    n_blocks: int,
    coord_mask: jnp.ndarray | None = None,
    radius_y: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row-block integer recentering offsets.

    u, v (..., H', W') -> cu, cv (..., nblk) int32, each block's offset
    the rounded masked mean displacement of its rows (blocks with fewer
    than 8 valid pixels inherit the global mean).  Same clip convention
    as :func:`compute_recenter` (+-4x the larger tap radius).
    """
    if radius_y is None:
        radius_y = radius
    hp, wp = u.shape[-2], u.shape[-1]
    s = grid_stride
    nblk, t, _halo = block_layout(hp, n_blocks, radius_y, s)
    col = jnp.arange(wp, dtype=jnp.float32) * s
    row = jnp.arange(hp, dtype=jnp.float32) * s
    du = u - col[None, :]
    dv = v - row[:, None]
    if coord_mask is not None:
        mf = coord_mask.astype(jnp.float32)
    else:
        mf = jnp.ones(u.shape, jnp.float32)
    pad = nblk * t - hp
    padspec = [(0, 0)] * (u.ndim - 2) + [(0, pad), (0, 0)]
    dub = jnp.pad(du * mf, padspec).reshape(u.shape[:-2] + (nblk, t, wp))
    dvb = jnp.pad(dv * mf, padspec).reshape(u.shape[:-2] + (nblk, t, wp))
    mb = jnp.pad(mf, padspec).reshape(u.shape[:-2] + (nblk, t, wp))
    count = jnp.sum(mb, axis=(-2, -1))
    denom = jnp.maximum(count, 1.0)
    mean_du_b = jnp.sum(dub, axis=(-2, -1)) / denom
    mean_dv_b = jnp.sum(dvb, axis=(-2, -1)) / denom
    gdenom = jnp.maximum(jnp.sum(count, axis=-1), 1.0)
    gmean_du = jnp.sum(dub, axis=(-3, -2, -1)) / gdenom
    gmean_dv = jnp.sum(dvb, axis=(-3, -2, -1)) / gdenom
    enough = count >= 8.0
    mean_du_b = jnp.where(enough, mean_du_b, gmean_du[..., None])
    mean_dv_b = jnp.where(enough, mean_dv_b, gmean_dv[..., None])
    center_bound = 4 * max(radius, radius_y)
    cu = jnp.clip(
        jnp.round(mean_du_b), -center_bound, center_bound
    ).astype(jnp.int32)
    cv = jnp.clip(
        jnp.round(mean_dv_b), -center_bound, center_bound
    ).astype(jnp.int32)
    return cu, cv


def shift_coverage_blocks(
    u: jnp.ndarray,
    v: jnp.ndarray,
    radius: int,
    grid_stride: int,
    n_blocks: int,
    coord_mask: jnp.ndarray | None = None,
    radius_y: int | None = None,
) -> jnp.ndarray:
    """Fraction of valid pixels kept by PER-BLOCK recentered shift balls.

    The block analogue of :func:`ops.shiftwarp.shift_coverage` — the
    hard-motion fallback trigger must judge the path that will actually
    run, and per-block centers keep strictly more pixels than a single
    global center.  ``radius_y`` sets an anisotropic ball (vertical tap
    radius; defaults to ``radius``).
    """
    if radius_y is None:
        radius_y = radius
    hp, wp = u.shape[-2], u.shape[-1]
    s = grid_stride
    nblk, t, _halo = block_layout(hp, n_blocks, radius_y, s)
    cu, cv = compute_recenter_blocks(
        u, v, radius, s, n_blocks, coord_mask, radius_y=radius_y
    )
    col = jnp.arange(wp, dtype=jnp.float32) * s
    row = jnp.arange(hp, dtype=jnp.float32) * s
    du = u - col[None, :]
    dv = v - row[:, None]
    if coord_mask is not None:
        mf = coord_mask.astype(jnp.float32)
    else:
        mf = jnp.ones(u.shape, jnp.float32)
    pad = nblk * t - hp
    padspec = [(0, 0)] * (u.ndim - 2) + [(0, pad), (0, 0)]
    dub = jnp.pad(du, padspec).reshape(u.shape[:-2] + (nblk, t, wp))
    dvb = jnp.pad(dv, padspec).reshape(u.shape[:-2] + (nblk, t, wp))
    mb = jnp.pad(mf, padspec).reshape(u.shape[:-2] + (nblk, t, wp))
    dub = dub - cu[..., None, None].astype(jnp.float32)
    dvb = dvb - cv[..., None, None].astype(jnp.float32)
    in_ball = (
        (dub > -radius) & (dub < radius)
        & (dvb > -radius_y) & (dvb < radius_y)
    )
    kept = jnp.sum(in_ball.astype(jnp.float32) * mb, axis=(-3, -2, -1))
    denom = jnp.maximum(jnp.sum(mb, axis=(-3, -2, -1)), 1.0)
    return kept / denom


def slab_stack(
    x: jnp.ndarray, grid_hp: int, n_blocks: int, radius_y: int,
    grid_stride: int,
) -> jnp.ndarray:
    """Re-lay a per-pixel tensor (..., H', W') into block-slab layout.

    Each block's slab carries its ``t`` grid rows plus ``halo`` rows
    duplicating the next block's first grid rows (static slices + one
    concat — no gathers).  Pad rows (past the grid) are zero.
    -> (..., nblk*(t+halo), W').
    """
    nblk, t, halo = block_layout(grid_hp, n_blocks, radius_y, grid_stride)
    pad_to = nblk * t + halo
    pad = pad_to - x.shape[-2]
    padspec = [(0, 0)] * (x.ndim - 2) + [(0, pad), (0, 0)]
    xp = jnp.pad(x, padspec)
    slabs = [xp[..., k * t : k * t + t + halo, :] for k in range(nblk)]
    return jnp.concatenate(slabs, axis=-2)


def extract_parity_planes_blocks(
    image: jnp.ndarray,
    cu: jnp.ndarray,
    cv: jnp.ndarray,
    grid_hp: int,
    grid_wp: int,
    radius: int,
    grid_stride: int = 1,
    n_blocks: int = 1,
    radius_y: int | None = None,
) -> jnp.ndarray:
    """Block-recentered window extraction + parity split (slab layout).

    image (B, H, W), cu/cv (B, nblk) int32 per-block offsets ->
    planes (B, s^2, nblk*(t+halo), pw) f32 where each slab satisfies the
    :func:`extract_parity_planes` invariant with ITS block's center:
    for grid row m in block k (slab row m - k*t), tap (ky, kx) reads
    image[s*m + cv[k] + ky, s*n + cu[k] + kx] with ky in [-radius_y,
    radius_y] and kx in [-radius, radius] (anisotropic ball; radius_y
    defaults to radius — per-block vertical recentering usually lets the
    vertical radius shrink below the horizontal one).
    """
    if radius_y is None:
        radius_y = radius
    s = grid_stride
    nblk, t, halo = block_layout(grid_hp, n_blocks, radius_y, s)
    slab_h = t + halo
    center_bound = 4 * max(radius, radius_y)
    img = image.astype(jnp.float32)
    pad_r = radius_y + center_bound
    pad_c = radius + center_bound
    # The last block's window can reach (nblk*t + halo)*s past the grid
    # origin; give the bottom enough slack for that plus the clip bound.
    extra_bottom = (nblk * t - grid_hp + halo + 1) * s + s
    padded = jnp.pad(
        img, [(0, 0), (pad_r, pad_r + extra_bottom), (pad_c, pad_c)]
    )
    win_h = slab_h * s
    win_w = (grid_wp - 1) * s + 1 + 2 * radius

    def slice_one(im, sy, sx):
        return jax.lax.dynamic_slice(
            im, (center_bound + sy, center_bound + sx), (win_h, win_w)
        )

    base = (jnp.arange(nblk, dtype=jnp.int32) * (t * s))[None, :]
    windows = jax.vmap(
        jax.vmap(slice_one, in_axes=(None, 0, 0)), in_axes=(0, 0, 0)
    )(padded, cv + base, cu)  # (B, nblk, win_h, win_w)

    pw = (2 * radius) // s + grid_wp
    plane_pad_w = pw * s - win_w + s
    windows = jnp.pad(
        windows, [(0, 0), (0, 0), (0, 0), (0, max(plane_pad_w, 0))]
    )
    planes = jnp.stack(
        [
            windows[:, :, p::s, q::s][:, :, :slab_h, :pw]
            for p in range(s)
            for q in range(s)
        ],
        axis=1,
    )  # (B, s^2, nblk, slab_h, pw)
    b = planes.shape[0]
    return planes.reshape(b, s * s, nblk * slab_h, pw)


def tile_layout(
    grid_hp: int,
    grid_wp: int,
    n_blocks_y: int,
    n_blocks_x: int,
    radius: int,
    radius_y: int,
    grid_stride: int,
) -> Tuple[int, int, int, int, int, int]:
    """2-D tile-layout geometry for per-TILE recentering.

    Round-4 VERDICT task 1: per-row-block centers only shrink VERTICAL
    displacement spread, but a rotation's displacement field varies in
    both axes — over a 32-px tile the spread is ~theta * 32 px, inside a
    radius-3 ball for the keyframe-baseline rotations that currently
    force the gather fallback.  Tiles generalize the slab trick to both
    dimensions: each (row-block, col-block) tile gets its OWN integer
    center, per-pixel tensors are laid out as a mosaic of
    ``(t_y + halo_y, t_x + halo_x)`` tiles whose halo rows/cols
    duplicate the neighbouring tiles' first rows/cols (masked out of
    validity) so the kernel's uniform rolls never cross into a tile
    extracted with a different center.

    -> (nby, t_y, halo_y, nbx, t_x, halo_x).
    """
    nby, t_y, halo_y = block_layout(grid_hp, n_blocks_y, radius_y, grid_stride)
    nbx, t_x, halo_x = block_layout(grid_wp, n_blocks_x, radius, grid_stride)
    return nby, t_y, halo_y, nbx, t_x, halo_x


def _tile_means(vals, mask, nby, t_y, nbx, t_x):
    """Masked per-tile means + global mean of (..., H', W') ``vals``."""
    hp, wp = vals.shape[-2], vals.shape[-1]
    pad_r = nby * t_y - hp
    pad_c = nbx * t_x - wp
    padspec = [(0, 0)] * (vals.ndim - 2) + [(0, pad_r), (0, pad_c)]
    vb = jnp.pad(vals * mask, padspec).reshape(
        vals.shape[:-2] + (nby, t_y, nbx, t_x)
    )
    mb = jnp.pad(mask, padspec).reshape(
        vals.shape[:-2] + (nby, t_y, nbx, t_x)
    )
    count = jnp.sum(mb, axis=(-3, -1))  # (..., nby, nbx)
    mean = jnp.sum(vb, axis=(-3, -1)) / jnp.maximum(count, 1.0)
    gdenom = jnp.maximum(jnp.sum(count, axis=(-2, -1)), 1.0)
    gmean = jnp.sum(vb, axis=(-4, -3, -2, -1)) / gdenom
    return mean, count, gmean


def compute_recenter_tiles(
    u: jnp.ndarray,
    v: jnp.ndarray,
    radius: int,
    grid_stride: int,
    n_blocks_y: int,
    n_blocks_x: int,
    coord_mask: jnp.ndarray | None = None,
    radius_y: int | None = None,
    center_bound: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tile integer recentering offsets.

    u, v (..., H', W') -> cu, cv (..., nby, nbx) int32 — each tile's
    offset the rounded masked mean displacement of its pixels (tiles
    with fewer than 8 valid pixels inherit the global mean).  Default
    clip convention as :func:`compute_recenter` (+-4x the larger tap
    radius); ``center_bound`` overrides it — keyframe-class baselines
    measure >12 px of displacement, which SATURATES the default clip
    (round-5 probe), so the SLAM regime wants a larger bound (the only
    cost is extraction padding).
    """
    if radius_y is None:
        radius_y = radius
    hp, wp = u.shape[-2], u.shape[-1]
    s = grid_stride
    nby, t_y, _, nbx, t_x, _ = tile_layout(
        hp, wp, n_blocks_y, n_blocks_x, radius, radius_y, s
    )
    col = jnp.arange(wp, dtype=jnp.float32) * s
    row = jnp.arange(hp, dtype=jnp.float32) * s
    du = u - col[None, :]
    dv = v - row[:, None]
    mf = (
        coord_mask.astype(jnp.float32)
        if coord_mask is not None
        else jnp.ones(u.shape, jnp.float32)
    )
    mean_du, count, gmean_du = _tile_means(du, mf, nby, t_y, nbx, t_x)
    mean_dv, _, gmean_dv = _tile_means(dv, mf, nby, t_y, nbx, t_x)
    enough = count >= 8.0
    mean_du = jnp.where(enough, mean_du, gmean_du[..., None, None])
    mean_dv = jnp.where(enough, mean_dv, gmean_dv[..., None, None])
    if center_bound is None:
        center_bound = 4 * max(radius, radius_y)
    cu = jnp.clip(
        jnp.round(mean_du), -center_bound, center_bound
    ).astype(jnp.int32)
    cv = jnp.clip(
        jnp.round(mean_dv), -center_bound, center_bound
    ).astype(jnp.int32)
    return cu, cv


def shift_coverage_tiles(
    u: jnp.ndarray,
    v: jnp.ndarray,
    radius: int,
    grid_stride: int,
    n_blocks_y: int,
    n_blocks_x: int,
    coord_mask: jnp.ndarray | None = None,
    radius_y: int | None = None,
    center_bound: int | None = None,
) -> jnp.ndarray:
    """Fraction of valid pixels kept by PER-TILE recentered shift balls
    (the tile analogue of :func:`shift_coverage_blocks` — the fallback
    trigger must judge the path that will actually run)."""
    if radius_y is None:
        radius_y = radius
    hp, wp = u.shape[-2], u.shape[-1]
    s = grid_stride
    nby, t_y, _, nbx, t_x, _ = tile_layout(
        hp, wp, n_blocks_y, n_blocks_x, radius, radius_y, s
    )
    cu, cv = compute_recenter_tiles(
        u, v, radius, s, n_blocks_y, n_blocks_x, coord_mask,
        radius_y=radius_y, center_bound=center_bound,
    )
    col = jnp.arange(wp, dtype=jnp.float32) * s
    row = jnp.arange(hp, dtype=jnp.float32) * s
    du = u - col[None, :]
    dv = v - row[:, None]
    mf = (
        coord_mask.astype(jnp.float32)
        if coord_mask is not None
        else jnp.ones(u.shape, jnp.float32)
    )
    pad_r = nby * t_y - hp
    pad_c = nbx * t_x - wp
    padspec = [(0, 0)] * (u.ndim - 2) + [(0, pad_r), (0, pad_c)]
    shape_t = u.shape[:-2] + (nby, t_y, nbx, t_x)
    dub = jnp.pad(du, padspec).reshape(shape_t) - cu[
        ..., :, None, :, None
    ].astype(jnp.float32)
    dvb = jnp.pad(dv, padspec).reshape(shape_t) - cv[
        ..., :, None, :, None
    ].astype(jnp.float32)
    mb = jnp.pad(mf, padspec).reshape(shape_t)
    in_ball = (
        (dub > -radius) & (dub < radius)
        & (dvb > -radius_y) & (dvb < radius_y)
    )
    kept = jnp.sum(in_ball.astype(jnp.float32) * mb, axis=(-4, -3, -2, -1))
    denom = jnp.maximum(jnp.sum(mb, axis=(-4, -3, -2, -1)), 1.0)
    return kept / denom


def tile_stack(
    x: jnp.ndarray,
    grid_hp: int,
    grid_wp: int,
    n_blocks_y: int,
    n_blocks_x: int,
    radius: int,
    radius_y: int,
    grid_stride: int,
) -> jnp.ndarray:
    """Re-lay a per-pixel tensor (..., H', W') into 2-D tile-mosaic
    layout: rows become ``nby`` slabs of ``t_y + halo_y`` rows, then
    columns become ``nbx`` slabs of ``t_x + halo_x`` columns (static
    slices + concats).  -> (..., nby*(t_y+halo_y), nbx*(t_x+halo_x))."""
    nby, t_y, halo_y, nbx, t_x, halo_x = tile_layout(
        grid_hp, grid_wp, n_blocks_y, n_blocks_x, radius, radius_y,
        grid_stride,
    )
    out = slab_stack(x, grid_hp, n_blocks_y, radius_y, grid_stride)
    # Column slabs: transpose the last two axes and reuse the row logic.
    outt = jnp.swapaxes(out, -1, -2)
    outt = slab_stack(outt, grid_wp, n_blocks_x, radius, grid_stride)
    return jnp.swapaxes(outt, -1, -2)


def extract_parity_planes_tiles(
    image: jnp.ndarray,
    cu: jnp.ndarray,
    cv: jnp.ndarray,
    grid_hp: int,
    grid_wp: int,
    radius: int,
    grid_stride: int = 1,
    n_blocks_y: int = 1,
    n_blocks_x: int = 1,
    radius_y: int | None = None,
    center_bound: int | None = None,
) -> jnp.ndarray:
    """Tile-recentered window extraction + parity split (mosaic layout).

    image (B, H, W), cu/cv (B, nby, nbx) int32 per-tile offsets ->
    planes (B, s^2, nby*slab_h, nbx*slab_w) f32 where each tile's
    sub-plane satisfies the :func:`extract_parity_planes` invariant with
    ITS tile's center: for grid point (m, n) in tile (k, l), tap
    (ky, kx) reads image[s*m + cv[k,l] + ky, s*n + cu[k,l] + kx] with
    ky in [-radius_y, radius_y], kx in [-radius, radius].
    """
    if radius_y is None:
        radius_y = radius
    s = grid_stride
    nby, t_y, halo_y, nbx, t_x, halo_x = tile_layout(
        grid_hp, grid_wp, n_blocks_y, n_blocks_x, radius, radius_y, s
    )
    slab_h = t_y + halo_y
    slab_w = t_x + halo_x
    if center_bound is None:
        center_bound = 4 * max(radius, radius_y)
    img = image.astype(jnp.float32)
    pad_r = radius_y + center_bound
    pad_c = radius + center_bound
    extra_bottom = (nby * t_y - grid_hp + halo_y + 1) * s + s
    extra_right = (nbx * t_x - grid_wp + halo_x + 1) * s + s
    padded = jnp.pad(
        img,
        [(0, 0), (pad_r, pad_r + extra_bottom), (pad_c, pad_c + extra_right)],
    )
    win_h = slab_h * s
    win_w = slab_w * s

    def slice_one(im, sy, sx):
        return jax.lax.dynamic_slice(
            im, (center_bound + sy, center_bound + sx), (win_h, win_w)
        )

    base_y = (jnp.arange(nby, dtype=jnp.int32) * (t_y * s))[:, None]
    base_x = (jnp.arange(nbx, dtype=jnp.int32) * (t_x * s))[None, :]
    sy = cv + base_y  # (B, nby, nbx)
    sx = cu + base_x
    windows = jax.vmap(  # over batch
        jax.vmap(  # over row tiles
            jax.vmap(slice_one, in_axes=(None, 0, 0)),  # over col tiles
            in_axes=(None, 0, 0),
        ),
        in_axes=(0, 0, 0),
    )(padded, sy, sx)  # (B, nby, nbx, win_h, win_w)

    planes = jnp.stack(
        [
            windows[..., p::s, q::s][..., :slab_h, :slab_w]
            for p in range(s)
            for q in range(s)
        ],
        axis=1,
    )  # (B, s^2, nby, nbx, slab_h, slab_w)
    b = planes.shape[0]
    return planes.transpose(0, 1, 2, 4, 3, 5).reshape(
        b, s * s, nby * slab_h, nbx * slab_w
    )


def prepare_shift_stack(
    image: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    radius: int = 3,
    grid_stride: int = 1,
    coord_mask: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """XLA-side prep shared by the stack kernels: recentering, window
    extraction, parity split.

    image (B, H, W); u, v (B, H', W') -> (planes (B, s^2, ph, pw),
    du, dv (B, H', W') recentered residual displacements, valid bool).
    """
    if radius < 1:
        raise ValueError("radius must be >= 1")
    if grid_stride not in (1, 2):
        raise ValueError("grid_stride must be 1 or 2 for the pallas path")
    h, w = image.shape[-2], image.shape[-1]
    hp, wp = u.shape[-2], u.shape[-1]
    cu, cv = compute_recenter(u, v, radius, grid_stride, coord_mask)
    du, dv, valid = residual_displacements(
        u, v, cu, cv, radius, grid_stride, h, w
    )
    planes = extract_parity_planes(
        image, cu, cv, hp, wp, radius, grid_stride
    )
    return planes, du, dv, valid


def shift_stack_sample_pallas(
    image: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    radius: int = 3,
    grid_stride: int = 1,
    coord_mask: jnp.ndarray | None = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in twin of ``shiftwarp.shift_stack_sample`` backed by the
    fused Pallas accumulation kernel.

    Requires a batched (B, H, W) image (the solver always is); the
    recentering window extraction and parity split run in XLA (cheap
    block copies), the (2r+1)^2-tap accumulation runs on-chip.
    """
    # Mosaic kernels only compile for TPU; other backends (CPU tests, the
    # 8-device simulation) run the kernel in the interpreter — slower but
    # numerically identical, so one code path serves everywhere.
    if jax.default_backend() != "tpu":
        interpret = True
    squeeze = image.ndim == 2
    if squeeze:
        image, u, v = image[None], u[None], v[None]
        if coord_mask is not None:
            coord_mask = coord_mask[None]
    planes, du, dv, valid = prepare_shift_stack(
        image, u, v, radius=radius, grid_stride=grid_stride,
        coord_mask=coord_mask,
    )
    acc = stack_accumulate_pallas(
        planes, du, dv, radius, grid_stride=grid_stride, interpret=interpret
    )
    out = jnp.where(valid, acc, 0.0)
    if squeeze:
        out, valid = out[0], valid[0]
    return out, valid
