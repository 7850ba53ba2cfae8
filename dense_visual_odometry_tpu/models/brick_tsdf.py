"""Brick-grid (two-level sparse) TSDF: hashed-volume capability, TPU-native.

Round-4 VERDICT task 4: the dense :mod:`~dense_visual_odometry_tpu.models.tsdf`
volume is O(N^3) in memory AND in per-frame integration work, which capped
frame-to-model tracking at 384^3 (15.6 mm voxels on the fr1-difficulty
extent) — and its error was measured map-resolution-limited
(benchmarks/trackmodel.jsonl).  This module lifts the ceiling with a
two-level structure sized for how surfaces actually occupy space (the
surface band fills ~1-5% of the volume):

- a DENSE coarse index ``table`` over a virtual grid of bricks
  (``brick_grid``, int32 slot or -1) — at 8^3 voxels/brick the table for a
  1024^3-voxel virtual volume is 128^3 x 4 B = 8 MB, so a dense table is
  cheaper and simpler than an open-addressing hash (no probing, no
  collisions, O(1) deterministic lookup = ONE gather);
- a fixed-capacity brick POOL ``(pool_size, bs, bs, bs)`` holding tsdf /
  weight / gray for allocated bricks only.

TPU-native design (vs the pointer-chasing CPU/CUDA hash-volume tradition,
e.g. Voxel Hashing / InfiniTAM):

- Everything is FIXED SHAPE: allocation is a dense mask + one cumsum
  (rank = pool slot) + ``mode="drop"`` scatters; the per-frame
  integration batch is a fixed ``active_bricks``-row gather/scatter of
  whole bricks.  No host round trips, no dynamic shapes, one donated
  jitted update per frame like the dense path.
- Integration stays GATHER-formulated (tsdf.py design note): active-brick
  voxels project into the frame and sample it; brick rows are gathered,
  updated elementwise, scattered back disjointly (slots are unique — no
  contention, no atomics).
- The raycast is ONE fixed ``fori_loop`` with an ADAPTIVE step: the
  table lookup the field gather needs anyway also yields brick
  occupancy, so each step costs exactly two dependent gathers and
  advances half a brick through unallocated space or 0.75 voxel inside
  the band — empty-space skipping that cannot expire mid-ray.

Reference anchor: the reference has no mapping subsystem at all
(``/root/reference/src/visualize.py:110-188`` is a view-only cloud
viewer); this extends the beyond-reference mapping axis opened in round 3.

Carving note: only bricks near the observed surface band are allocated
and updated, so ``carve_decay`` acts within ~2 truncation bands of the
current surface (enough to clear a surface that MOVED — its old band is
re-observed as free when the new surface is within 2 tau) but free space
far in front of surfaces is never touched (that is the point of
sparseness).  Use the dense volume when full-frustum carving matters.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dense_visual_odometry_tpu.models.tsdf import (
    TSDFConfig,
    TSDFVolume,
    extract_mesh,
)
from dense_visual_odometry_tpu.utils.lie import se3


@dataclasses.dataclass(frozen=True)
class BrickTSDFConfig:
    """Two-level volume geometry + fusion hyper-parameters (jit-static).

    The virtual voxel grid is ``brick_grid * brick_size`` per axis; only
    bricks intersecting observed truncation bands ever own memory.
    """

    brick_grid: Tuple[int, int, int] = (64, 64, 64)  # bricks along (z, y, x)
    brick_size: int = 8  # voxels per brick edge
    pool_size: int = 16384  # total brick capacity
    # Per-frame integration batch: bricks touched by one frame's band.
    # Bricks beyond this cap are skipped this frame (caught up on the
    # next observation); sized ~2x the typical 640x480 band footprint.
    active_bricks: int = 6144
    voxel_size: float = 0.01  # meters per (virtual) voxel
    origin: Tuple[float, float, float] = (-2.56, -2.56, 0.0)
    truncation: float = 0.08
    max_weight: float = 64.0
    min_depth: float = 0.05
    truncation_scale_sq: float = 0.0
    carve_decay: float = 0.0

    def __post_init__(self):
        object.__setattr__(
            self, "brick_grid", tuple(int(d) for d in self.brick_grid)
        )
        object.__setattr__(self, "origin", tuple(float(o) for o in self.origin))
        if self.truncation <= 0 or self.voxel_size <= 0:
            raise ValueError("voxel_size and truncation must be positive")
        if self.brick_size < 2:
            raise ValueError("brick_size must be >= 2")
        if not 0.0 <= self.carve_decay <= 1.0:
            raise ValueError("carve_decay must be in [0, 1]")
        if self.truncation_scale_sq < 0:
            raise ValueError("truncation_scale_sq must be >= 0")

    @property
    def dims(self) -> Tuple[int, int, int]:
        """Virtual dense dimensions (D, H, W) in voxels."""
        bs = self.brick_size
        return tuple(g * bs for g in self.brick_grid)

    @classmethod
    def around(cls, center, extent: float, resolution: int = 512, **kw):
        """Cube volume of side ``extent`` centred at ``center`` with
        ``resolution`` VIRTUAL voxels per edge (matches
        :meth:`TSDFConfig.around` semantics at 4x+ the resolution for a
        fraction of the memory)."""
        bs = int(kw.get("brick_size", cls.brick_size))
        if resolution % bs:
            raise ValueError("resolution must be a multiple of brick_size")
        half = extent / 2.0
        c = np.asarray(center, dtype=np.float64)
        g = resolution // bs
        return cls(
            brick_grid=(g, g, g),
            voxel_size=extent / resolution,
            origin=tuple(float(x) for x in (c - half)),
            **kw,
        )


class BrickTSDFVolume(NamedTuple):
    """Device-resident sparse fusion state.

    ``table`` maps brick coords -> pool slot (-1 = unallocated);
    ``brick_zyx`` is the reverse map for allocated slots.  ``n_dropped``
    counts allocation requests refused because the pool was full
    (observability: a nonzero value means ``pool_size`` is undersized
    for the scene).
    """

    table: jnp.ndarray  # (Gz, Gy, Gx) int32
    brick_zyx: jnp.ndarray  # (pool, 3) int32
    tsdf: jnp.ndarray  # (pool, bs, bs, bs) f32
    weight: jnp.ndarray  # (pool, bs, bs, bs) f32
    gray: jnp.ndarray  # (pool, bs, bs, bs) f32
    n_used: jnp.ndarray  # () int32
    n_dropped: jnp.ndarray  # () int32


def make_brick_volume(cfg: BrickTSDFConfig) -> BrickTSDFVolume:
    bs = cfg.brick_size
    p = cfg.pool_size
    return BrickTSDFVolume(
        table=jnp.full(cfg.brick_grid, -1, jnp.int32),
        brick_zyx=jnp.zeros((p, 3), jnp.int32),
        tsdf=jnp.ones((p, bs, bs, bs), jnp.float32),
        weight=jnp.zeros((p, bs, bs, bs), jnp.float32),
        gray=jnp.zeros((p, bs, bs, bs), jnp.float32),
        n_used=jnp.zeros((), jnp.int32),
        n_dropped=jnp.zeros((), jnp.int32),
    )


# Band sample offsets in units of the local truncation tau: z + s * tau
# along each pixel ray.  Spacing tau/2 < brick edge for any tau < 2
# brick edges, so no brick the band crosses is skipped along the ray;
# s = -2 reaches one band of near free space so carving can clear a
# surface that moved by up to ~a band.
_BAND_OFFSETS = (-2.0, -1.0, -0.5, 0.0, 0.5, 1.0)


def _integrate_impl(
    volume: BrickTSDFVolume,
    depth_m: jnp.ndarray,
    gray: jnp.ndarray,
    intrinsics: jnp.ndarray,
    pose: jnp.ndarray,
    cfg: BrickTSDFConfig,
) -> BrickTSDFVolume:
    """Allocate + fuse one frame (see :func:`integrate_brick`)."""
    h, w = depth_m.shape
    bs = cfg.brick_size
    gz, gy, gx = cfg.brick_grid
    g_total = gz * gy * gx
    vs = cfg.voxel_size
    ox, oy, oz = cfg.origin
    brick_edge = bs * vs

    # --- mark bricks touched by this frame's truncation band -----------
    v_pix, u_pix = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32), indexing="ij",
    )
    z = depth_m
    ok_px = z > cfg.min_depth
    z_safe = jnp.where(ok_px, z, 1.0)
    # Camera-space ray direction scaled so parameter = camera depth.
    dx = (u_pix - intrinsics[0, 2]) / intrinsics[0, 0]
    dy = (v_pix - intrinsics[1, 2]) / intrinsics[1, 1]
    r = pose[:3, :3]
    t = pose[:3, 3]
    tau = cfg.truncation + cfg.truncation_scale_sq * z_safe * z_safe

    flags = jnp.zeros((g_total + 1,), jnp.int32)
    for s in _BAND_OFFSETS:
        zs = z_safe + jnp.float32(s) * tau
        px = r[0, 0] * (dx * zs) + r[0, 1] * (dy * zs) + r[0, 2] * zs + t[0]
        py = r[1, 0] * (dx * zs) + r[1, 1] * (dy * zs) + r[1, 2] * zs + t[1]
        pz = r[2, 0] * (dx * zs) + r[2, 1] * (dy * zs) + r[2, 2] * zs + t[2]
        bx = jnp.floor((px - ox) / brick_edge).astype(jnp.int32)
        by = jnp.floor((py - oy) / brick_edge).astype(jnp.int32)
        bz = jnp.floor((pz - oz) / brick_edge).astype(jnp.int32)
        ok = (
            ok_px & (zs > cfg.min_depth)
            & (bx >= 0) & (bx < gx) & (by >= 0) & (by < gy)
            & (bz >= 0) & (bz < gz)
        )
        flat = jnp.where(ok, (bz * gy + by) * gx + bx, g_total)
        flags = flags.at[flat.reshape(-1)].set(1)
    flags = flags[:g_total].astype(bool)

    # --- allocate new bricks (dense mask + cumsum rank, no host) -------
    table_flat = volume.table.reshape(-1)
    need_new = flags & (table_flat < 0)
    rank = jnp.cumsum(need_new.astype(jnp.int32)) - 1
    slot = volume.n_used + rank
    can = need_new & (slot < cfg.pool_size)
    table_flat = jnp.where(can, slot, table_flat)
    ids = jnp.arange(g_total, dtype=jnp.int32)
    coords = jnp.stack(
        [ids // (gy * gx), (ids // gx) % gy, ids % gx], axis=-1
    )
    brick_zyx = volume.brick_zyx.at[
        jnp.where(can, slot, cfg.pool_size)
    ].set(coords, mode="drop")
    n_new = jnp.sum(can.astype(jnp.int32))
    n_used = volume.n_used + n_new
    n_dropped = volume.n_dropped + jnp.sum(need_new.astype(jnp.int32)) - n_new

    # --- fixed-size active list: bricks this frame updates -------------
    a_cap = cfg.active_bricks
    active = flags & (table_flat >= 0)
    a_rank = jnp.cumsum(active.astype(jnp.int32)) - 1
    active_ids = jnp.full((a_cap,), -1, jnp.int32).at[
        jnp.where(active & (a_rank < a_cap), a_rank, a_cap)
    ].set(ids, mode="drop")
    a_ok = active_ids >= 0
    slots = jnp.where(
        a_ok, jnp.take(table_flat, jnp.clip(active_ids, 0)), cfg.pool_size
    )
    slots_c = jnp.clip(slots, 0, cfg.pool_size - 1)

    # --- project active-brick voxels and fuse (dense-path math) --------
    zyx = jnp.take(brick_zyx, slots_c, axis=0)  # (A, 3)
    local = jnp.arange(bs, dtype=jnp.float32) + 0.5
    wz = oz + (zyx[:, 0, None].astype(jnp.float32) * bs + local) * vs  # (A,bs)
    wy = oy + (zyx[:, 1, None].astype(jnp.float32) * bs + local) * vs
    wx = ox + (zyx[:, 2, None].astype(jnp.float32) * bs + local) * vs
    w2c = se3.inverse(pose)
    rc = w2c[:3, :3]
    tc = w2c[:3, 3]

    def cam_axis(row):
        # (A, bs, bs, bs): brick-local separable broadcast like the
        # dense path's _voxel_camera_coords.
        return (
            rc[row, 0] * wx[:, None, None, :]
            + rc[row, 1] * wy[:, None, :, None]
            + rc[row, 2] * wz[:, :, None, None]
            + tc[row]
        )

    xc, yc, zc = cam_axis(0), cam_axis(1), cam_axis(2)
    in_front = zc > cfg.min_depth
    zc_safe = jnp.where(in_front, zc, 1.0)
    u = intrinsics[0, 0] * xc / zc_safe + intrinsics[0, 2]
    v = intrinsics[1, 1] * yc / zc_safe + intrinsics[1, 2]
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    in_view = in_front & (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
    flat_px = (
        jnp.clip(vi, 0, h - 1) * w + jnp.clip(ui, 0, w - 1)
    ).reshape(-1)
    depth_s = jnp.take(depth_m.reshape(-1), flat_px).reshape(zc.shape)
    gray_s = jnp.take(gray.reshape(-1), flat_px).reshape(zc.shape)

    sdf = depth_s - zc
    trunc = cfg.truncation + cfg.truncation_scale_sq * depth_s * depth_s
    valid = (
        in_view & (depth_s > 0.0) & (sdf > -trunc)
        & a_ok[:, None, None, None]
    )
    tsdf_obs = jnp.clip(sdf / trunc, -1.0, 1.0)

    old_tsdf = jnp.take(volume.tsdf, slots_c, axis=0)
    old_w = jnp.take(volume.weight, slots_c, axis=0)
    old_gray = jnp.take(volume.gray, slots_c, axis=0)
    if cfg.carve_decay > 0.0:
        conflict = valid & (sdf > trunc) & (old_tsdf < 0.25)
        old_w = jnp.where(conflict, old_w * (1.0 - cfg.carve_decay), old_w)
    w_obs = valid.astype(jnp.float32)
    w_new = old_w + w_obs
    w_safe = jnp.maximum(w_new, 1.0)
    tsdf_new = jnp.where(valid, (old_tsdf * old_w + tsdf_obs) / w_safe, old_tsdf)
    gray_new = jnp.where(valid, (old_gray * old_w + gray_s) / w_safe, old_gray)
    w_new = jnp.minimum(w_new, cfg.max_weight)

    # Disjoint whole-brick writeback (padded rows index pool -> dropped).
    return BrickTSDFVolume(
        table=table_flat.reshape(cfg.brick_grid),
        brick_zyx=brick_zyx,
        tsdf=volume.tsdf.at[slots].set(tsdf_new, mode="drop"),
        weight=volume.weight.at[slots].set(w_new, mode="drop"),
        gray=volume.gray.at[slots].set(gray_new, mode="drop"),
        n_used=n_used,
        n_dropped=n_dropped,
    )


integrate_brick = jax.jit(
    _integrate_impl, static_argnames=("cfg",), donate_argnums=(0,)
)
integrate_brick.__doc__ = """Fuse one frame into the brick volume (donated jitted update).

Same observation model as the dense :func:`~dense_visual_odometry_tpu.
models.tsdf.integrate` (running weighted average, adaptive truncation,
optional carving within the band — module docstring), restricted to the
``active_bricks`` bricks the frame's truncation band touches; new bricks
are allocated on the fly (dense-mask cumsum ranks, ``mode="drop"``
scatters — fully on device, fixed shapes).
"""


def _virtual_sample_setup(volume: BrickTSDFVolume, cfg, min_weight):
    """Shared raycast state: confidence-masked flat pool fields plus a
    lookup from virtual voxel coords to flat pool indices."""
    bs = cfg.brick_size
    gz, gy, gx = cfg.brick_grid
    phi_field = jnp.where(
        volume.weight >= min_weight, volume.tsdf, 1.0
    ).reshape(-1)
    gray_field = volume.gray.reshape(-1)
    table_flat = volume.table.reshape(-1)

    def flat_index(ix, iy, iz):
        """Virtual voxel (ix, iy, iz) -> (flat pool index, allocated?).
        Coords must be pre-clipped to the virtual dims."""
        bxi = ix // bs
        byi = iy // bs
        bzi = iz // bs
        slot = jnp.take(table_flat, (bzi * gy + byi) * gx + bxi)
        ok = slot >= 0
        lx = ix - bxi * bs
        ly = iy - byi * bs
        lz = iz - bzi * bs
        flat = (
            jnp.clip(slot, 0) * (bs * bs * bs)
            + (lz * bs + ly) * bs + lx
        )
        return flat, ok

    return phi_field, gray_field, flat_index


def _raycast_march_impl(
    volume: BrickTSDFVolume,
    intrinsics: jnp.ndarray,
    pose: jnp.ndarray,
    cfg: BrickTSDFConfig,
    shape: Tuple[int, int],
    min_weight: float = 1.0,
    max_depth: float = 10.0,
    n_coarse: int = 96,
    n_fine: int = 64,
):
    """Two-phase per-ray march (see :func:`raycast_view_march_brick`)."""
    h, w = shape
    bs = cfg.brick_size
    gz, gy, gx = cfg.brick_grid
    d, hh, ww = cfg.dims
    vs = cfg.voxel_size
    ox, oy, oz = cfg.origin
    brick_edge = bs * vs

    phi_field, gray_field, flat_index = _virtual_sample_setup(
        volume, cfg, min_weight
    )
    occ_flat = (volume.table.reshape(-1) >= 0)

    v_pix, u_pix = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32), indexing="ij",
    )
    dx = (u_pix - intrinsics[0, 2]) / intrinsics[0, 0]
    dy = (v_pix - intrinsics[1, 2]) / intrinsics[1, 1]
    r = pose[:3, :3]
    origin_w = pose[:3, 3]
    dwx = r[0, 0] * dx + r[0, 1] * dy + r[0, 2]
    dwy = r[1, 0] * dx + r[1, 1] * dy + r[1, 2]
    dwz = r[2, 0] * dx + r[2, 1] * dy + r[2, 2]

    def point(t):
        return (
            origin_w[0] + dwx * t,
            origin_w[1] + dwy * t,
            origin_w[2] + dwz * t,
        )

    # --- adaptive march: brick-skip in empty space, fine in the band --
    # One fori_loop whose step size depends on where the ray currently
    # is: half-brick jumps through UNALLOCATED bricks (the skip cannot
    # tunnel through a brick whose ray chord exceeds half an edge), fine
    # sub-voxel steps inside allocated ones.  Unlike a fixed two-phase
    # (skip-then-refine) design this cannot expire mid-ray after
    # grazing a foreground band — measured on the fr1-difficulty scene
    # the two-phase version lost ~5% of pixels versus the dense march
    # exactly that way (out/logs/brick_diag.log).
    dt_c = jnp.float32(brick_edge * 0.5)
    dt_f = jnp.float32(vs * 0.75)
    t0 = jnp.float32(cfg.min_depth)

    def occ_at(t):
        px, py, pz = point(t)
        bx = jnp.floor((px - ox) / brick_edge).astype(jnp.int32)
        by = jnp.floor((py - oy) / brick_edge).astype(jnp.int32)
        bz = jnp.floor((pz - oz) / brick_edge).astype(jnp.int32)
        inside = (
            (bx >= 0) & (bx < gx) & (by >= 0) & (by < gy)
            & (bz >= 0) & (bz < gz)
        )
        flat = (jnp.clip(bz, 0, gz - 1) * gy + jnp.clip(by, 0, gy - 1)) * gx \
            + jnp.clip(bx, 0, gx - 1)
        occ = jnp.take(occ_flat, flat.reshape(-1)).reshape(h, w)
        return occ & inside

    def sample_nearest_occ(t):
        """(phi, allocated?) at the nearest voxel — the occupancy bit
        falls out of the table lookup the phi gather needs anyway, so
        the adaptive step costs TWO gathers, not three."""
        px, py, pz = point(t)
        ix = jnp.round((px - ox) / vs - 0.5).astype(jnp.int32)
        iy = jnp.round((py - oy) / vs - 0.5).astype(jnp.int32)
        iz = jnp.round((pz - oz) / vs - 0.5).astype(jnp.int32)
        inside = (
            (ix >= 0) & (ix < ww) & (iy >= 0) & (iy < hh)
            & (iz >= 0) & (iz < d)
        )
        flat, ok = flat_index(
            jnp.clip(ix, 0, ww - 1), jnp.clip(iy, 0, hh - 1),
            jnp.clip(iz, 0, d - 1),
        )
        phi = jnp.take(phi_field, flat.reshape(-1)).reshape(h, w)
        occ = inside & ok
        return jnp.where(occ, phi, 1.0), occ

    def sample_nearest(t):
        return sample_nearest_occ(t)[0]

    n_steps = n_coarse + n_fine

    def body(_, carry):
        found, t_hit, phi_prev, t_prev, t_cur = carry
        phi, in_band = sample_nearest_occ(t_cur)
        # Crossing localized by linear interpolation; when the previous
        # sample was a skip point (phi_prev = 1 in empty space) the
        # interp lands early and the trilinear sphere-tracing refinement
        # below pulls it onto the surface.
        crossing = (~found) & (phi < 0.0) & (phi_prev >= 0.0)
        denom = jnp.maximum(phi_prev - phi, 1e-6)
        t_lin = t_prev + (t_cur - t_prev) * phi_prev / denom
        t_hit = jnp.where(crossing, t_lin, t_hit)
        found = found | crossing
        step = jnp.where(in_band, dt_f, dt_c)
        t_next = jnp.where(found | (t_cur > max_depth), t_cur, t_cur + step)
        return found, t_hit, phi, t_cur, t_next

    t0_plane = jnp.full((h, w), t0, jnp.float32)
    phi0 = sample_nearest(t0_plane)
    found, t_hit, _, _, _ = jax.lax.fori_loop(
        0, n_steps, body,
        (jnp.zeros((h, w), bool), jnp.zeros((h, w), jnp.float32),
         phi0, t0_plane,
         t0_plane + jnp.where(occ_at(t0_plane), dt_f, dt_c)),
    )
    valid = found & (t_hit > cfg.min_depth) & (t_hit <= max_depth)

    def sample_trilinear(field, t):
        px, py, pz = point(t)
        fx = (px - ox) / vs - 0.5
        fy = (py - oy) / vs - 0.5
        fz = (pz - oz) / vs - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        z0 = jnp.floor(fz)
        wx1 = fx - x0
        wy1 = fy - y0
        wz1 = fz - z0
        acc = jnp.zeros((h, w), jnp.float32)
        for dz in (0, 1):
            for dyy in (0, 1):
                for dxx in (0, 1):
                    ix = jnp.clip(x0.astype(jnp.int32) + dxx, 0, ww - 1)
                    iy = jnp.clip(y0.astype(jnp.int32) + dyy, 0, hh - 1)
                    iz = jnp.clip(z0.astype(jnp.int32) + dz, 0, d - 1)
                    flat, ok = flat_index(ix, iy, iz)
                    val = jnp.take(field, flat.reshape(-1)).reshape(h, w)
                    # Unallocated corners read as free space for phi
                    # (field fill 1.0) / 0 intensity for gray.
                    fill = 1.0 if field is phi_field else 0.0
                    val = jnp.where(ok, val, fill)
                    wgt = (
                        (wx1 if dxx else 1.0 - wx1)
                        * (wy1 if dyy else 1.0 - wy1)
                        * (wz1 if dz else 1.0 - wz1)
                    )
                    acc = acc + wgt * val
        return acc

    # Sub-voxel sphere-tracing refinement on the trilinear field
    # (identical to the dense march's final passes).
    for _ in range(2):
        tau_hit = cfg.truncation + cfg.truncation_scale_sq * t_hit * t_hit
        phi_t = sample_trilinear(phi_field, t_hit)
        t_hit = jnp.where(
            valid, t_hit + jnp.clip(phi_t, -0.5, 0.5) * tau_hit, t_hit
        )

    gray = sample_trilinear(gray_field, t_hit)
    depth = jnp.where(valid, t_hit, 0.0)
    gray = jnp.where(valid, gray, 0.0)
    return depth, gray


raycast_view_march_brick = jax.jit(
    _raycast_march_impl,
    static_argnames=("cfg", "shape", "n_coarse", "n_fine"),
)
raycast_view_march_brick.__doc__ = """Render a virtual (depth, gray) view of the brick volume.

KinectFusion-style surface prediction with ADAPTIVE brick-level
empty-space skipping: one ``fori_loop`` whose step is half a brick edge
through unallocated bricks and 0.75 voxel inside allocated ones (the
occupancy bit falls out of the table lookup the field gather needs —
two gathers per step total); the zero crossing is localized by linear
interpolation + two trilinear sphere-tracing steps.  Unlike a fixed
skip-then-refine two-phase design this cannot lose a surface after
grazing a foreground band (measured: dense-only pixels 15549 -> 148 on
the fr1-difficulty scene, with brick coverage EXCEEDING the dense
march's).

-> (depth_m (H, W) f32 with 0 = no surface, gray (H, W) f32).
"""


def dense_crop(
    volume: BrickTSDFVolume,
    cfg: BrickTSDFConfig,
    brick_lo: Tuple[int, int, int],
    brick_hi: Tuple[int, int, int],
) -> Tuple[TSDFVolume, TSDFConfig]:
    """Materialize bricks ``[lo, hi)`` as a dense :class:`TSDFVolume` +
    matching :class:`TSDFConfig` (host-side; for mesh export / tests).
    Unallocated voxels read tsdf=+1, weight=0, gray=0."""
    bs = cfg.brick_size
    lo = np.asarray(brick_lo, np.int64)
    hi = np.asarray(brick_hi, np.int64)
    nb = hi - lo
    shape_b = tuple(int(x) for x in nb)
    table = np.asarray(volume.table)
    sl = tuple(slice(int(lo[i]), int(hi[i])) for i in range(3))
    slots = table[sl]  # (nbz, nby, nbx)
    ok = slots >= 0
    slots_c = np.clip(slots, 0, None)

    def fill(pool_field, fill_value):
        src = np.asarray(pool_field)[slots_c.reshape(-1)]  # (NB, bs,bs,bs)
        src = src.reshape(*shape_b, bs, bs, bs)
        src[~ok] = fill_value
        # (bz, by, bx, z, y, x) -> (bz*bs, by*bs, bx*bs)
        return np.ascontiguousarray(
            src.transpose(0, 3, 1, 4, 2, 5).reshape(
                shape_b[0] * bs, shape_b[1] * bs, shape_b[2] * bs
            )
        )

    dense = TSDFVolume(
        tsdf=fill(volume.tsdf, 1.0),
        weight=fill(volume.weight, 0.0),
        gray=fill(volume.gray, 0.0),
    )
    origin = (
        cfg.origin[0] + int(lo[2]) * bs * cfg.voxel_size,
        cfg.origin[1] + int(lo[1]) * bs * cfg.voxel_size,
        cfg.origin[2] + int(lo[0]) * bs * cfg.voxel_size,
    )
    dcfg = TSDFConfig(
        dims=tuple(int(n) * bs for n in shape_b),
        voxel_size=cfg.voxel_size,
        origin=origin,
        truncation=cfg.truncation,
        max_weight=cfg.max_weight,
        min_depth=cfg.min_depth,
        truncation_scale_sq=cfg.truncation_scale_sq,
        carve_decay=cfg.carve_decay,
    )
    return dense, dcfg


def extract_mesh_bricks(
    volume: BrickTSDFVolume,
    cfg: BrickTSDFConfig,
    min_weight: float = 1.0,
    max_slab_bytes: int = 256 << 20,
):
    """TSDF zero crossing -> triangle mesh from the brick volume.

    Host-side one-shot export: the allocated bricks' bounding box is
    materialized in Z-slabs (each bounded by ``max_slab_bytes``) with a
    one-brick-plane overlap, each slab runs the dense
    :func:`~dense_visual_odometry_tpu.models.tsdf.extract_mesh`
    pipeline, and boundary-duplicated vertices are welded (their
    coordinates are computed from the same two corner values, so exact
    equality welds them).  Returns (vertices, faces, vertex_gray) like
    the dense extractor.
    """
    n_used = int(volume.n_used)
    if n_used == 0:
        return (
            np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int64),
            np.zeros((0,), dtype=np.float32),
        )
    zyx = np.asarray(volume.brick_zyx)[:n_used]
    lo = zyx.min(axis=0)
    hi = zyx.max(axis=0) + 1
    bs = cfg.brick_size
    ny, nx = int(hi[1] - lo[1]), int(hi[2] - lo[2])
    bytes_per_zbrick = (ny * bs) * (nx * bs) * bs * 4 * 3
    zstep = max(1, int(max_slab_bytes // max(bytes_per_zbrick, 1)))

    all_v, all_f, all_g = [], [], []
    voffset = 0
    z0 = int(lo[0])
    while z0 < int(hi[0]):
        z1 = min(z0 + zstep, int(hi[0]))
        # One extra brick plane of overlap so cubes spanning the slab
        # boundary are emitted exactly once (by the lower slab).
        z_hi = min(z1 + 1, int(hi[0]))
        dense, dcfg = dense_crop(
            volume, cfg,
            (z0, int(lo[1]), int(lo[2])), (z_hi, int(hi[1]), int(hi[2])),
        )
        if z_hi < int(hi[0]):
            # Cubes whose base lies in the overlap plane belong to the
            # NEXT slab: mask the top brick-plane's interior by marking
            # its last voxel layer unobserved... instead simply trim the
            # crop so the cube range ends at the boundary plane: keep
            # one voxel plane past the boundary.
            keep = (z1 - z0) * bs + 1
            dense = TSDFVolume(
                tsdf=dense.tsdf[:keep], weight=dense.weight[:keep],
                gray=dense.gray[:keep],
            )
            dcfg = dataclasses.replace(
                dcfg, dims=(keep, dcfg.dims[1], dcfg.dims[2])
            )
        verts, faces, vgray = extract_mesh(dense, dcfg, min_weight=min_weight)
        if len(verts):
            all_v.append(verts)
            all_f.append(faces + voffset)
            all_g.append(vgray)
            voffset += len(verts)
        z0 = z1
    if not all_v:
        return (
            np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int64),
            np.zeros((0,), dtype=np.float32),
        )
    verts = np.concatenate(all_v)
    faces = np.concatenate(all_f)
    vgray = np.concatenate(all_g)
    # Weld slab-boundary duplicates: exact-coordinate dedup.
    key = np.round(verts / (cfg.voxel_size * 1e-6)).astype(np.int64)
    _, uniq_idx, inverse = np.unique(
        key, axis=0, return_index=True, return_inverse=True
    )
    return verts[uniq_idx], inverse[faces], vgray[uniq_idx]
