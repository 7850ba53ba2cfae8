"""TSDF volume fusion + triangle-mesh extraction (mapping backend).

Beyond-reference capability: the reference only *views* per-frame point
clouds through Open3D (``/root/reference/src/visualize.py:110-188``) — it
has no persistent map or reconstruction subsystem.  This module fuses a
tracked RGB-D sequence into a truncated signed distance volume and
extracts a triangle mesh, completing the map-export story (PLY point
clouds from ``apps/visualize.py`` -> watertight surfaces here).

TPU-native design notes:

- The volume is a fixed-shape ``(D, H, W)`` pytree of ``jax.Array``s
  (tsdf, weight, gray); integration is one jitted, donated update per
  frame — the volume never leaves the device during fusion.
- Integration is GATHER-formulated: every voxel projects into the frame
  and samples depth/intensity (``take_along_axis``), instead of the
  scatter-formulated CUDA tradition (per-pixel ray marching with atomic
  voxel writes).  Scatters serialize on TPU; gathers are the native
  direction, cost ~8 ns/index, and make the update embarrassingly
  data-parallel with zero contention — the whole frame update is a few
  fused elementwise passes plus 2 gathers/voxel.
- Mesh extraction (one-shot export, not a hot path) runs on host numpy:
  vectorized marching tetrahedra over the 6-tet cube decomposition.
  Unlike full marching cubes there is no 256-case table to transcribe;
  the 16 tet cases are derived from first principles below, and winding
  is made consistent by orienting each face against the interpolated
  SDF gradient.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dense_visual_odometry_tpu.utils.lie import se3


@dataclasses.dataclass(frozen=True)
class TSDFConfig:
    """Volume geometry + fusion hyper-parameters (jit-static)."""

    dims: Tuple[int, int, int] = (128, 128, 128)  # (D, H, W) = (z, y, x)
    voxel_size: float = 0.02  # meters per voxel
    origin: Tuple[float, float, float] = (-1.28, -1.28, 0.0)  # world (x, y, z)
    truncation: float = 0.08  # meters; SDF clamped to +-truncation
    max_weight: float = 64.0  # running-average observation cap
    # Observations more than this far BEHIND the surface are free space
    # carving nothing (standard TSDF: only integrate sdf > -truncation).
    min_depth: float = 0.05
    # Adaptive truncation band: tau(z) = truncation + truncation_scale_sq
    # * z^2 (meters).  Kinect-class sensors quantize DISPARITY, so depth
    # noise grows ~quadratically with distance (~11 mm steps at 2 m for
    # the fr1 sensor model, io/synthetic.py); a fixed band either blurs
    # near geometry or starves far geometry of support.  0 = fixed band.
    truncation_scale_sq: float = 0.0
    # Space carving (dynamic-object removal): when an observation says a
    # voxel is FREE space (sdf > tau) but the stored field says surface
    # (tsdf < 0.25), the stored weight is decayed by this factor before
    # averaging, so stale surfaces (objects that moved away) disappear in
    # ~1/carve_decay conflicting views instead of washing out over
    # max_weight frames.  0 = standard TSDF (no carving).
    carve_decay: float = 0.0

    def __post_init__(self):
        object.__setattr__(self, "dims", tuple(int(d) for d in self.dims))
        object.__setattr__(self, "origin", tuple(float(o) for o in self.origin))
        if self.truncation <= 0 or self.voxel_size <= 0:
            raise ValueError("voxel_size and truncation must be positive")
        if not 0.0 <= self.carve_decay <= 1.0:
            raise ValueError("carve_decay must be in [0, 1]")
        if self.truncation_scale_sq < 0:
            raise ValueError("truncation_scale_sq must be >= 0")

    @classmethod
    def around(cls, center, extent: float, resolution: int = 128, **kw):
        """Cube volume of side ``extent`` centred at ``center`` (world)."""
        half = extent / 2.0
        c = np.asarray(center, dtype=np.float64)
        return cls(
            dims=(resolution, resolution, resolution),
            voxel_size=extent / resolution,
            origin=tuple(float(x) for x in (c - half)),
            **kw,
        )


class TSDFVolume(NamedTuple):
    """Device-resident fusion state; ``tsdf`` in truncation-normalized
    units (+1 free space ... -1 behind surface), 0-weight = unobserved."""

    tsdf: jnp.ndarray  # (D, H, W) f32
    weight: jnp.ndarray  # (D, H, W) f32
    gray: jnp.ndarray  # (D, H, W) f32 running-average intensity


def make_volume(cfg: TSDFConfig) -> TSDFVolume:
    shape = cfg.dims
    return TSDFVolume(
        tsdf=jnp.ones(shape, jnp.float32),
        weight=jnp.zeros(shape, jnp.float32),
        gray=jnp.zeros(shape, jnp.float32),
    )


def _voxel_camera_coords(cfg: TSDFConfig, world_to_cam: jnp.ndarray):
    """Voxel centres in the camera frame: three (D, H, W) coordinate
    planes, built separably (no (D*H*W, 3) matmul materialization)."""
    d, h, w = cfg.dims
    vs = cfg.voxel_size
    ox, oy, oz = cfg.origin
    # World coordinates along each axis (voxel centres).
    xs = ox + (jnp.arange(w, dtype=jnp.float32) + 0.5) * vs  # x (W,)
    ys = oy + (jnp.arange(h, dtype=jnp.float32) + 0.5) * vs  # y (H,)
    zs = oz + (jnp.arange(d, dtype=jnp.float32) + 0.5) * vs  # z (D,)
    r = world_to_cam[:3, :3]
    t = world_to_cam[:3, 3]

    def axis_comb(row):
        # r[row] . (x, y, z) + t[row], broadcast over the (D, H, W) grid.
        return (
            r[row, 0] * xs[None, None, :]
            + r[row, 1] * ys[None, :, None]
            + r[row, 2] * zs[:, None, None]
            + t[row]
        )

    return axis_comb(0), axis_comb(1), axis_comb(2)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def integrate(
    volume: TSDFVolume,
    depth_m: jnp.ndarray,
    gray: jnp.ndarray,
    intrinsics: jnp.ndarray,
    pose: jnp.ndarray,
    cfg: TSDFConfig,
) -> TSDFVolume:
    """Fuse one frame into the volume (donated — zero-copy update).

    depth_m : (H, W) metric depth, 0 = invalid.
    gray : (H, W) intensity in [0, 255].
    pose : (4, 4) camera-to-world (the session's ``current_pose``).
    """
    h, w = depth_m.shape
    xc, yc, zc = _voxel_camera_coords(cfg, se3.inverse(pose))

    in_front = zc > cfg.min_depth
    z_safe = jnp.where(in_front, zc, 1.0)
    u = intrinsics[0, 0] * xc / z_safe + intrinsics[0, 2]
    v = intrinsics[1, 1] * yc / z_safe + intrinsics[1, 2]
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    in_view = in_front & (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)

    flat_idx = jnp.clip(vi, 0, h - 1) * w + jnp.clip(ui, 0, w - 1)
    flat_idx = flat_idx.reshape(-1)
    depth_s = jnp.take(depth_m.reshape(-1), flat_idx).reshape(cfg.dims)
    gray_s = jnp.take(gray.reshape(-1), flat_idx).reshape(cfg.dims)

    sdf = depth_s - zc
    # Per-voxel truncation band, widened with the OBSERVED surface depth
    # (the noise source is the measurement, not the voxel position).
    trunc = cfg.truncation + cfg.truncation_scale_sq * depth_s * depth_s
    valid = in_view & (depth_s > 0.0) & (sdf > -trunc)
    tsdf_obs = jnp.clip(sdf / trunc, -1.0, 1.0)

    w_old = volume.weight
    if cfg.carve_decay > 0.0:
        # Free-space observation conflicting with a stored surface:
        # decay the stored weight so dynamic objects are carved out
        # instead of lingering until the running average washes them.
        conflict = valid & (sdf > trunc) & (volume.tsdf < 0.25)
        w_old = jnp.where(conflict, w_old * (1.0 - cfg.carve_decay), w_old)
    w_obs = valid.astype(jnp.float32)
    w_new = w_old + w_obs
    w_safe = jnp.maximum(w_new, 1.0)
    tsdf_new = jnp.where(
        valid, (volume.tsdf * w_old + tsdf_obs) / w_safe, volume.tsdf
    )
    gray_new = jnp.where(
        valid, (volume.gray * w_old + gray_s) / w_safe, volume.gray
    )
    return TSDFVolume(
        tsdf=tsdf_new,
        weight=jnp.minimum(w_new, cfg.max_weight),
        gray=gray_new,
    )


def integrate_frames(volume, frames, intrinsics, poses, cfg: TSDFConfig):
    """Fuse a sequence: ``frames`` iterable of (depth_m, gray) arrays with
    matching camera-to-world ``poses``.  Python loop over a donated jit —
    the volume stays device-resident throughout."""
    k = jnp.asarray(intrinsics, jnp.float32)
    for (depth_m, gray), pose in zip(frames, poses):
        volume = integrate(
            volume,
            jnp.asarray(depth_m, jnp.float32),
            jnp.asarray(gray, jnp.float32),
            k,
            jnp.asarray(pose, jnp.float32),
            cfg,
        )
    return volume


# ---------------------------------------------------------------------------
# Mesh extraction: vectorized marching tetrahedra (host-side, one-shot).
# ---------------------------------------------------------------------------

# Cube corners: id 0..7 with offsets (dz, dy, dx); every tet contains the
# main diagonal 0-6, giving the standard 6-tet decomposition whose faces
# agree between neighbouring cubes (no cracks).
_CORNER_OFFSETS = np.array(
    [
        (0, 0, 0), (0, 0, 1), (0, 1, 1), (0, 1, 0),
        (1, 0, 0), (1, 0, 1), (1, 1, 1), (1, 1, 0),
    ],
    dtype=np.int64,
)
_TETS = np.array(
    [
        (0, 5, 1, 6), (0, 1, 2, 6), (0, 2, 3, 6),
        (0, 3, 7, 6), (0, 7, 4, 6), (0, 4, 5, 6),
    ],
    dtype=np.int64,
)
# The 6 edges of a tet as (corner, corner) local indices 0..3.
_TET_EDGES = np.array(
    [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)], dtype=np.int64
)
# Case table, indexed by the 4-bit "inside" mask (bit i = vertex i inside,
# i.e. tsdf < 0): list of triangles, each 3 tet-edge indices.  Derived:
# one inside vertex -> the triangle of its 3 incident edges; two inside
# -> the quad of the 4 crossing edges split into 2 triangles; three
# inside -> the triangle around the single outside vertex.  Winding is
# normalized afterwards against the SDF gradient, so edge order here only
# needs to be geometrically consistent (quad split shares the diagonal).
_TET_TRIS = {
    0b0001: [(0, 1, 2)],
    0b0010: [(0, 3, 4)],
    0b0100: [(1, 3, 5)],
    0b1000: [(2, 4, 5)],
    0b0011: [(1, 2, 3), (3, 2, 4)],
    0b0101: [(0, 2, 5), (0, 5, 3)],
    0b1001: [(0, 1, 4), (4, 1, 5)],
    0b0110: [(0, 1, 4), (4, 1, 5)],  # same crossing-edge quad as 0b1001
    0b1010: [(0, 2, 5), (0, 5, 3)],  # same crossing-edge quad as 0b0101
    0b1100: [(1, 2, 3), (3, 2, 4)],  # same crossing-edge quad as 0b0011
    0b0111: [(2, 4, 5)],
    0b1011: [(1, 3, 5)],
    0b1101: [(0, 3, 4)],
    0b1110: [(0, 1, 2)],
}


@functools.partial(
    jax.jit, static_argnames=("cfg", "shape", "fill_passes")
)
def raycast_view(
    volume: TSDFVolume,
    intrinsics: jnp.ndarray,
    pose: jnp.ndarray,
    cfg: TSDFConfig,
    shape: Tuple[int, int],
    min_weight: float = 1.0,
    max_depth: float = 10.0,
    fill_passes: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render a virtual (depth, gray) view of the fused surface.

    TPU-native "splat raycast": instead of per-ray marching (H*W rays x
    N trilinear gathers — gathers cost ~8 ns/index on this target, so a
    640x480x64-step march is ~160 ms), every near-surface voxel projects
    into the view and scatter-mins resolve visibility.  The int32 sort
    key per voxel is (depth in voxel-size bins << 15) | (|tsdf| 7 bits
    << 8) | (gray 8 bits): the bin ordering IS the z-buffer, and within
    a bin (voxels of the SAME surface patch) the voxel nearest the zero
    crossing wins — its SDF-based sub-voxel correction
    z ~= z_voxel + tsdf * tau (the :func:`integrate` model) is the most
    accurate one, since the stored SDF is only a view-ray distance near
    the crossing.  A second scatter recovers the winner's
    full-precision corrected depth.  Magnified regions (voxel footprint
    > 1 px) leave pinholes; ``fill_passes`` 3x3 valid-aware
    min-dilations fill isolated ones, remaining holes stay 0-depth
    (= invalid for every downstream consumer).

    pose : (4, 4) camera-to-world of the virtual view.
    -> (depth_m (H, W) f32 with 0 = no surface, gray (H, W) f32).
    """
    h, w = shape
    xc, yc, zc = _voxel_camera_coords(cfg, se3.inverse(pose))
    tau = cfg.truncation + cfg.truncation_scale_sq * zc * zc
    z_surf = zc + volume.tsdf * tau
    near_surface = (
        (volume.weight >= min_weight)
        & (jnp.abs(volume.tsdf) < 0.5)
        & (z_surf > cfg.min_depth)
        & (z_surf < max_depth)
    )
    z_safe = jnp.where(near_surface, z_surf, 1.0)
    # Project the SURFACE point (the voxel centre moved along the ray by
    # the SDF): x scales with z along the ray through the voxel centre.
    scale_ray = z_surf / jnp.where(zc > 1e-6, zc, 1.0)
    u = intrinsics[0, 0] * xc * scale_ray / z_safe + intrinsics[0, 2]
    v = intrinsics[1, 1] * yc * scale_ray / z_safe + intrinsics[1, 2]

    qbin = jnp.clip(z_surf / cfg.voxel_size, 0.0, 16383.0).astype(jnp.int32)
    qabs = jnp.clip(jnp.abs(volume.tsdf) * 254.0, 0.0, 127.0).astype(
        jnp.int32
    )
    qg = jnp.clip(volume.gray, 0.0, 255.0).astype(jnp.int32)
    key = (qbin << 15) | (qabs << 8) | qg
    init = jnp.int32(0x7FFFFFFF)
    inf = jnp.float32(jnp.inf)

    # 2x2 footprint splat: a voxel's projected spacing can exceed 1 px
    # under magnification, letting the BACK surface show through between
    # front-surface splats; covering floor/ceil of (u, v) guarantees
    # gap-free coverage up to 2 px spacing.
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    corners = []
    for dv in (0, 1):
        for du in (0, 1):
            ui = u0 + du
            vi = v0 + dv
            ok = (
                near_surface & (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
            )
            corners.append((ok, jnp.where(ok, vi * w + ui, h * w)))
    buf = jnp.full((h * w + 1,), init, jnp.int32)
    for ok, idx in corners:
        buf = buf.at[idx.reshape(-1)].min(
            jnp.where(ok, key, init).reshape(-1)
        )

    # Winner's full-precision corrected depth (second scatter-min over
    # exactly the winning voxels; ties share the same key and z within
    # quantization).
    zbuf = jnp.full((h * w + 1,), inf, jnp.float32)
    for ok, idx in corners:
        winner = ok & (jnp.take(buf, idx) == key)
        zbuf = zbuf.at[idx.reshape(-1)].min(
            jnp.where(winner, z_surf, inf).reshape(-1)
        )
    img = buf[: h * w].reshape(h, w)
    zimg = zbuf[: h * w].reshape(h, w)

    for _ in range(fill_passes):
        # Valid-aware 3x3 min-dilation: holes take the nearest (minimum
        # key = nearest depth) valid neighbour; valid pixels keep theirs.
        padk = jnp.pad(img, 1, constant_values=init)
        padz = jnp.pad(zimg, 1, constant_values=inf)
        neigh = img
        neighz = zimg
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                cand = padk[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
                take = cand < neigh
                neigh = jnp.where(take, cand, neigh)
                neighz = jnp.where(
                    take, padz[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w],
                    neighz,
                )
        hole = img == init
        img = jnp.where(hole, neigh, img)
        zimg = jnp.where(hole, neighz, zimg)

    valid = (img != init) & jnp.isfinite(zimg)
    depth = jnp.where(valid, zimg, 0.0)
    gray = jnp.where(valid, (img & 0xFF).astype(jnp.float32), 0.0)
    return depth, gray


@functools.partial(
    jax.jit, static_argnames=("cfg", "shape", "n_steps")
)
def raycast_view_march(
    volume: TSDFVolume,
    intrinsics: jnp.ndarray,
    pose: jnp.ndarray,
    cfg: TSDFConfig,
    shape: Tuple[int, int],
    min_weight: float = 1.0,
    max_depth: float = 10.0,
    n_steps: int = 96,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render a virtual (depth, gray) view by per-ray SDF marching.

    The quality path (the splat :func:`raycast_view` is one scatter pass
    but carries ~half-voxel per-pixel jitter — fine for a one-shot
    virtual keyframe, but per-frame re-rendering random-walks that
    jitter into the trajectory).  Here each ray marches the truncated
    field in fixed steps (``lax.fori_loop`` — one nearest-neighbour
    gather pass per step, ~8 ns/index on this target, so a 640x480 x
    96-step render is ~250 ms of gather time) and localizes the zero
    crossing by linear interpolation between the last positive and
    first negative samples — the standard KinectFusion surface
    prediction, sub-voxel smooth.  Gray is sampled trilinearly at the
    hit point.

    pose : (4, 4) camera-to-world.  -> (depth_m (H, W) f32 with 0 = no
    surface, gray (H, W) f32).
    """
    h, w = shape
    d, hh, ww = cfg.dims
    vs = cfg.voxel_size
    ox, oy, oz = cfg.origin

    # Unobserved / low-confidence voxels read as free space.
    phi_field = jnp.where(
        volume.weight >= min_weight, volume.tsdf, 1.0
    ).reshape(-1)
    gray_field = volume.gray.reshape(-1)

    v_pix, u_pix = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32), indexing="ij",
    )
    # Camera rays normalized so the parameter t IS the camera-space
    # depth (z component = t).
    dx = (u_pix - intrinsics[0, 2]) / intrinsics[0, 0]
    dy = (v_pix - intrinsics[1, 2]) / intrinsics[1, 1]
    r = pose[:3, :3]
    origin_w = pose[:3, 3]
    dwx = r[0, 0] * dx + r[0, 1] * dy + r[0, 2]
    dwy = r[1, 0] * dx + r[1, 1] * dy + r[1, 2]
    dwz = r[2, 0] * dx + r[2, 1] * dy + r[2, 2]

    def sample_nearest(t):
        px = origin_w[0] + dwx * t
        py = origin_w[1] + dwy * t
        pz = origin_w[2] + dwz * t
        ix = jnp.round((px - ox) / vs - 0.5).astype(jnp.int32)
        iy = jnp.round((py - oy) / vs - 0.5).astype(jnp.int32)
        iz = jnp.round((pz - oz) / vs - 0.5).astype(jnp.int32)
        inside = (
            (ix >= 0) & (ix < ww) & (iy >= 0) & (iy < hh)
            & (iz >= 0) & (iz < d)
        )
        flat = (
            jnp.clip(iz, 0, d - 1) * (hh * ww)
            + jnp.clip(iy, 0, hh - 1) * ww
            + jnp.clip(ix, 0, ww - 1)
        )
        phi = jnp.take(phi_field, flat.reshape(-1)).reshape(h, w)
        return jnp.where(inside, phi, 1.0)

    t0 = jnp.float32(cfg.min_depth)
    dt = jnp.float32((max_depth - cfg.min_depth) / n_steps)

    def body(i, carry):
        found, t_hit, phi_prev, t_prev = carry
        t = t0 + dt * (i + 1).astype(jnp.float32)
        phi = sample_nearest(t)
        crossing = (~found) & (phi < 0.0) & (phi_prev >= 0.0)
        denom = jnp.maximum(phi_prev - phi, 1e-6)
        t_lin = t_prev + (t - t_prev) * phi_prev / denom
        t_hit = jnp.where(crossing, t_lin, t_hit)
        found = found | crossing
        return found, t_hit, phi, t

    def sample_trilinear(field, t):
        px = origin_w[0] + dwx * t
        py = origin_w[1] + dwy * t
        pz = origin_w[2] + dwz * t
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
                    wgt = (
                        (wx1 if dxx else 1.0 - wx1)
                        * (wy1 if dyy else 1.0 - wy1)
                        * (wz1 if dz else 1.0 - wz1)
                    )
                    flat = iz * (hh * ww) + iy * ww + ix
                    acc = acc + wgt * jnp.take(
                        field, flat.reshape(-1)
                    ).reshape(h, w)
        return acc

    found0 = jnp.zeros((h, w), bool)
    phi0 = sample_nearest(t0)
    found, t_hit, _, _ = jax.lax.fori_loop(
        0, n_steps, body,
        (found0, jnp.zeros((h, w), jnp.float32), phi0, t0),
    )
    # Rays whose FIRST sample is already behind a surface (camera inside
    # the truncation band) are invalid, as are non-crossing rays.
    valid = found & (t_hit > cfg.min_depth)

    # Sub-voxel refinement: the coarse crossing was localized from
    # NEAREST-sampled phi (half-voxel jitter); two sphere-tracing steps
    # on the TRILINEAR field (t <- t + phi * tau, phi ~ sdf/tau along
    # the ray near the crossing) pull the hit onto the smooth surface.
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


def extract_mesh(
    volume: TSDFVolume,
    cfg: TSDFConfig,
    min_weight: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """TSDF zero crossing -> triangle mesh.

    -> (vertices (V, 3) world-frame f64, faces (F, 3) int64,
    vertex_gray (V,) f32).  Vertices are deduplicated (shared between
    faces) via their global edge id, so the mesh is watertight wherever
    the surface is.  Empty volume -> three empty arrays.
    """
    tsdf = np.asarray(volume.tsdf, dtype=np.float64)
    weight = np.asarray(volume.weight, dtype=np.float64)
    gray = np.asarray(volume.gray, dtype=np.float64)
    d, h, w = tsdf.shape

    observed = weight >= min_weight
    # Candidate cubes: all 8 corners observed and a sign change present.
    def corner_view(arr, dz, dy, dx):
        return arr[dz : d - 1 + dz, dy : h - 1 + dy, dx : w - 1 + dx]

    obs8 = np.ones((d - 1, h - 1, w - 1), dtype=bool)
    neg_any = np.zeros_like(obs8)
    pos_any = np.zeros_like(obs8)
    for dz, dy, dx in _CORNER_OFFSETS:
        cv = corner_view(tsdf, dz, dy, dx)
        obs8 &= corner_view(observed, dz, dy, dx)
        neg_any |= cv < 0
        pos_any |= cv >= 0
    cubes = np.argwhere(obs8 & neg_any & pos_any)  # (C, 3) of (z, y, x)
    if len(cubes) == 0:
        return (
            np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int64),
            np.zeros((0,), dtype=np.float32),
        )

    # Global corner ids + values for the 8 corners of each candidate cube.
    corner_zyx = cubes[:, None, :] + _CORNER_OFFSETS[None, :, :]  # (C, 8, 3)
    gid = (
        corner_zyx[..., 0] * (h * w)
        + corner_zyx[..., 1] * w
        + corner_zyx[..., 2]
    )  # (C, 8)
    flat = tsdf.reshape(-1)
    vals = flat[gid]  # (C, 8)
    gflat = gray.reshape(-1)

    tri_edge_a = []  # global corner id at each triangle vertex's edge ends
    tri_edge_b = []
    for tet in _TETS:
        tvals = vals[:, tet]  # (C, 4)
        tgid = gid[:, tet]
        inside = tvals < 0
        case = (
            inside[:, 0].astype(np.int64)
            | (inside[:, 1] << 1)
            | (inside[:, 2] << 2)
            | (inside[:, 3] << 3)
        )
        for code, tris in _TET_TRIS.items():
            sel = np.nonzero(case == code)[0]
            if len(sel) == 0:
                continue
            for tri in tris:
                ea = _TET_EDGES[list(tri)][:, 0]  # (3,) local corner
                eb = _TET_EDGES[list(tri)][:, 1]
                tri_edge_a.append(tgid[sel][:, ea])  # (S, 3)
                tri_edge_b.append(tgid[sel][:, eb])

    if not tri_edge_a:
        return (
            np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int64),
            np.zeros((0,), dtype=np.float32),
        )
    ea = np.concatenate(tri_edge_a)  # (T, 3) global corner ids
    eb = np.concatenate(tri_edge_b)

    # Dedup shared vertices by undirected global edge key.
    lo = np.minimum(ea, eb).reshape(-1)
    hi = np.maximum(ea, eb).reshape(-1)
    key = lo * np.int64(d * h * w) + hi
    uniq, inverse = np.unique(key, return_inverse=True)
    faces = inverse.reshape(-1, 3)

    ulo = (uniq // (d * h * w)).astype(np.int64)
    uhi = (uniq % (d * h * w)).astype(np.int64)
    va, vb = flat[ulo], flat[uhi]
    t = va / (va - vb)  # zero crossing; va, vb have opposite signs
    t = np.clip(t, 0.0, 1.0)

    def gid_to_world(g):
        z = g // (h * w)
        y = (g % (h * w)) // w
        x = g % w
        p = np.stack([x, y, z], axis=-1).astype(np.float64) + 0.5
        return p * cfg.voxel_size + np.asarray(cfg.origin, dtype=np.float64)

    pa, pb = gid_to_world(ulo), gid_to_world(uhi)
    verts = pa + t[:, None] * (pb - pa)
    vert_gray = (gflat[ulo] + t * (gflat[uhi] - gflat[ulo])).astype(np.float32)

    # Drop degenerate faces (two vertices on the same global edge).
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    faces = faces[ok]

    # Consistent winding: flip faces whose normal opposes the local SDF
    # gradient (gradient points from inside (-) to free space (+), i.e.
    # along the outward surface normal).
    gz, gy, gx = np.gradient(tsdf)
    centroids = verts[faces].mean(axis=1)
    ci = np.clip(
        np.round(
            (centroids - np.asarray(cfg.origin)) / cfg.voxel_size - 0.5
        ).astype(np.int64),
        0,
        np.array([w - 1, h - 1, d - 1]),
    )
    grad = np.stack(
        [
            gx[ci[:, 2], ci[:, 1], ci[:, 0]],
            gy[ci[:, 2], ci[:, 1], ci[:, 0]],
            gz[ci[:, 2], ci[:, 1], ci[:, 0]],
        ],
        axis=-1,
    )
    e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
    e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
    n = np.cross(e1, e2)
    flip = np.einsum("ij,ij->i", n, grad) < 0
    faces[flip] = faces[flip][:, ::-1]

    return verts, faces, vert_gray


def save_mesh_ply(
    path,
    vertices: np.ndarray,
    faces: np.ndarray,
    vertex_gray: Optional[np.ndarray] = None,
) -> None:
    """ASCII PLY triangle-mesh writer (Open3D/MeshLab-compatible)."""
    from pathlib import Path

    path = Path(path)
    has_color = vertex_gray is not None and len(vertex_gray) == len(vertices)
    with path.open("w") as fp:
        fp.write("ply\nformat ascii 1.0\n")
        fp.write(f"element vertex {len(vertices)}\n")
        fp.write("property float x\nproperty float y\nproperty float z\n")
        if has_color:
            fp.write(
                "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            )
        fp.write(f"element face {len(faces)}\n")
        fp.write("property list uchar int vertex_indices\nend_header\n")
        if has_color:
            c = np.clip(vertex_gray, 0, 255).astype(np.int64)
            for (x, y, z), g in zip(vertices, c):
                fp.write(f"{x:.6f} {y:.6f} {z:.6f} {g} {g} {g}\n")
        else:
            for x, y, z in vertices:
                fp.write(f"{x:.6f} {y:.6f} {z:.6f}\n")
        for a, b, c3 in faces:
            fp.write(f"3 {a} {b} {c3}\n")


def save_mesh_obj(
    path,
    vertices: np.ndarray,
    faces: np.ndarray,
    vertex_gray: Optional[np.ndarray] = None,
) -> None:
    """Wavefront OBJ triangle-mesh writer (1-based face indexing).

    Optional per-vertex gray goes out as the nonstandard-but-widely-read
    ``v x y z r g b`` extension (MeshLab/Blender import it).
    """
    from pathlib import Path

    path = Path(path)
    has_color = vertex_gray is not None and len(vertex_gray) == len(vertices)
    with path.open("w") as fp:
        fp.write("# dense-visual-odometry-tpu TSDF mesh\n")
        if has_color:
            c = np.clip(vertex_gray, 0, 255).astype(np.float64) / 255.0
            for (x, y, z), g in zip(vertices, c):
                fp.write(f"v {x:.6f} {y:.6f} {z:.6f} {g:.4f} {g:.4f} {g:.4f}\n")
        else:
            for x, y, z in vertices:
                fp.write(f"v {x:.6f} {y:.6f} {z:.6f}\n")
        for a, b, c3 in faces:
            fp.write(f"f {a + 1} {b + 1} {c3 + 1}\n")
