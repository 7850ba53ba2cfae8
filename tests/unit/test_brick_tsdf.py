"""Brick-grid sparse TSDF: allocation, fusion parity vs dense, raycast
accuracy, slab-welded mesh extraction.

Oracle style follows SURVEY §4 / test_tsdf.py: analytic geometry with
exact ground truth (the same test sphere), plus DIRECT equality against
the dense volume on shared voxels — the brick path implements the same
observation model, so near-surface voxels must match bitwise-close.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from dense_visual_odometry_tpu.models.brick_tsdf import (
    BrickTSDFConfig,
    BrickTSDFVolume,
    dense_crop,
    extract_mesh_bricks,
    integrate_brick,
    make_brick_volume,
    raycast_view_march_brick,
)
from dense_visual_odometry_tpu.models.tsdf import (
    TSDFConfig,
    extract_mesh,
    integrate,
    make_volume,
)
from tests.unit.test_tsdf import (
    CENTER,
    RADIUS,
    lookat,
    render_sphere_depth,
    sphere_volume,
)


def dense_twin_config(cfg_b: BrickTSDFConfig) -> TSDFConfig:
    """Dense config with the identical virtual grid."""
    return TSDFConfig(
        dims=cfg_b.dims, voxel_size=cfg_b.voxel_size, origin=cfg_b.origin,
        truncation=cfg_b.truncation, max_weight=cfg_b.max_weight,
        min_depth=cfg_b.min_depth,
        truncation_scale_sq=cfg_b.truncation_scale_sq,
        carve_decay=cfg_b.carve_decay,
    )


def brick_sphere_volume(
    cfg_b: BrickTSDFConfig, allocate_all: bool = False
) -> BrickTSDFVolume:
    """Analytic sphere packed into bricks (band-allocated by default)."""
    dvol = sphere_volume(dense_twin_config(cfg_b))
    tsdf = np.asarray(dvol.tsdf)
    bs = cfg_b.brick_size
    gz, gy, gx = cfg_b.brick_grid
    t6 = tsdf.reshape(gz, bs, gy, bs, gx, bs).transpose(0, 2, 4, 1, 3, 5)
    if allocate_all:
        mask = np.ones((gz, gy, gx), bool)
    else:
        mask = (np.abs(t6) < 0.999).any(axis=(3, 4, 5))
    ids = np.argwhere(mask)
    n = len(ids)
    assert n <= cfg_b.pool_size, "test volume overflows the pool"
    table = np.full((gz, gy, gx), -1, np.int32)
    table[mask] = np.arange(n, dtype=np.int32)
    pool_tsdf = np.ones((cfg_b.pool_size, bs, bs, bs), np.float32)
    pool_tsdf[:n] = t6[mask]
    pool_w = np.zeros_like(pool_tsdf)
    pool_w[:n] = 2.0
    pool_g = np.zeros_like(pool_tsdf)
    pool_g[:n] = 128.0
    zyx = np.zeros((cfg_b.pool_size, 3), np.int32)
    zyx[:n] = ids
    return BrickTSDFVolume(
        table=jnp.asarray(table), brick_zyx=jnp.asarray(zyx),
        tsdf=jnp.asarray(pool_tsdf), weight=jnp.asarray(pool_w),
        gray=jnp.asarray(pool_g),
        n_used=jnp.int32(n), n_dropped=jnp.int32(0),
    )


def _sphere_cfg(resolution=96, **kw):
    return BrickTSDFConfig.around(
        CENTER, 1.0, resolution=resolution, pool_size=2048, **kw
    )


def test_brick_march_matches_analytic_sphere():
    """Same sub-voxel bound as the dense march
    (test_raycast_march_subvoxel_accuracy), through the brick-skipping
    two-phase path on a band-allocated volume."""
    cfg = _sphere_cfg(96)
    vol = brick_sphere_volume(cfg)
    assert int(vol.n_used) < cfg.pool_size // 2  # genuinely sparse
    h, w = 60, 80
    k = np.array(
        [[70.0, 0, (w - 1) / 2], [0, 70.0, (h - 1) / 2], [0, 0, 1.0]],
        np.float32,
    )
    for eye in ([0.0, 0.0, 0.2], [0.35, 0.1, 0.35]):
        pose = lookat(eye, CENTER)
        depth, gray = raycast_view_march_brick(
            vol, jnp.asarray(k), jnp.asarray(pose, jnp.float32), cfg,
            (h, w), max_depth=3.0,
        )
        depth = np.asarray(depth)
        want = render_sphere_depth(h, w, k, pose)
        both = (depth > 0) & (want > 0)
        uu, vv = np.meshgrid(np.arange(w), np.arange(h))
        rays = np.stack(
            [(uu - k[0, 2]) / k[0, 0], (vv - k[1, 2]) / k[1, 1],
             np.ones_like(want)], -1,
        )
        p_world = (rays * want[..., None]) @ pose[:3, :3].T + pose[:3, 3]
        normal = p_world - CENTER
        normal /= np.maximum(
            np.linalg.norm(normal, axis=-1, keepdims=True), 1e-9
        )
        raydir = rays / np.linalg.norm(rays, axis=-1, keepdims=True)
        cosi = np.abs(np.sum((raydir @ pose[:3, :3].T) * normal, -1))
        frontal = both & (cosi > 0.5)
        coverage = frontal.sum() / max(((want > 0) & (cosi > 0.5)).sum(), 1)
        assert coverage > 0.98, coverage
        err = np.abs(depth[frontal] - want[frontal])
        assert np.quantile(err, 0.9) < 0.2 * cfg.voxel_size, (
            eye, np.quantile(err, 0.9) / cfg.voxel_size
        )
        g = np.asarray(gray)
        assert np.all(np.abs(g[frontal] - 128.0) < 1.0)


def test_brick_fusion_matches_dense_near_surface():
    """integrate_brick runs the dense observation model restricted to
    band bricks: voxels near the fused surface must match the dense
    volume EXACTLY (same arithmetic on the same samples)."""
    cfg_b = BrickTSDFConfig.around(
        CENTER, 1.2, resolution=64, truncation=0.06, pool_size=512,
        active_bricks=512,
    )
    cfg_d = dense_twin_config(cfg_b)
    h, w = 120, 160
    k = np.array(
        [[120.0, 0.0, 80.0], [0.0, 120.0, 60.0], [0.0, 0.0, 1.0]],
        dtype=np.float32,
    )
    poses = [
        lookat((0.0, 0.0, 0.0), CENTER),
        lookat((1.0, 0.0, 1.0), CENTER),
        lookat((0.0, -1.0, 1.0), CENTER),
    ]
    vol_b = make_brick_volume(cfg_b)
    vol_d = make_volume(cfg_d)
    kj = jnp.asarray(k)
    for p in poses:
        depth = jnp.asarray(render_sphere_depth(h, w, k, p))
        gray = jnp.full((h, w), 100.0, jnp.float32)
        pj = jnp.asarray(p, jnp.float32)
        vol_b = integrate_brick(vol_b, depth, gray, kj, pj, cfg_b)
        vol_d = integrate(vol_d, depth, gray, kj, pj, cfg_d)

    assert int(vol_b.n_dropped) == 0
    n_used = int(vol_b.n_used)
    assert 0 < n_used < cfg_b.pool_size
    # Materialize the whole virtual grid and compare near-surface voxels.
    dense_b, _ = dense_crop(vol_b, cfg_b, (0, 0, 0), cfg_b.brick_grid)
    td = np.asarray(vol_d.tsdf)
    wd = np.asarray(vol_d.weight)
    tb = np.asarray(dense_b.tsdf)
    wb = np.asarray(dense_b.weight)
    near = (np.abs(td) < 0.5) & (wd >= 1.0)
    assert near.sum() > 1000
    covered = near & (wb == wd)
    assert covered.sum() / near.sum() > 0.99, "band bricks missed surface"
    np.testing.assert_allclose(tb[covered], td[covered], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(dense_b.gray)[covered], np.asarray(vol_d.gray)[covered],
        atol=1e-4,
    )

    # Sparse-memory claim: allocated bricks are a small fraction.
    total_bricks = int(np.prod(cfg_b.brick_grid))
    assert n_used < 0.55 * total_bricks

    # The extracted mesh reaches the dense fusion bound too.
    verts, faces, gray_v = extract_mesh_bricks(vol_b, cfg_b, min_weight=1.0)
    assert len(faces) > 500
    rad = np.linalg.norm(verts - CENTER, axis=1)
    assert np.abs(rad - RADIUS).max() < 2.0 * cfg_b.voxel_size
    assert np.abs(np.median(rad) - RADIUS) < 0.5 * cfg_b.voxel_size
    assert np.all(gray_v > 90.0) and np.all(gray_v < 110.0)


def test_brick_mesh_watertight_across_slabs():
    """Slab-wise extraction + welding must produce one watertight mesh
    (every undirected edge shared by exactly two faces) on a fully
    observed volume — boundary-duplicated vertices are welded exactly."""
    cfg = _sphere_cfg(48, brick_size=8)
    vol = brick_sphere_volume(cfg, allocate_all=True)
    # Force several slabs so the weld path is actually exercised.
    verts, faces, _ = extract_mesh_bricks(
        vol, cfg, max_slab_bytes=(48 * 48 * 8 * 4 * 3) * 2
    )
    assert len(faces) > 500
    edges = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]
    )
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()
    rad = np.linalg.norm(verts - CENTER, axis=1)
    assert np.abs(rad - RADIUS).max() < cfg.voxel_size


def test_brick_pool_overflow_is_counted_not_corrupting():
    """A pool too small for the scene drops allocations and counts them;
    fused values in the bricks that DID allocate stay finite/sane."""
    cfg = BrickTSDFConfig.around(
        CENTER, 1.2, resolution=64, truncation=0.06, pool_size=32,
        active_bricks=64,
    )
    h, w = 120, 160
    k = np.array(
        [[120.0, 0.0, 80.0], [0.0, 120.0, 60.0], [0.0, 0.0, 1.0]],
        dtype=np.float32,
    )
    pose = lookat((0.0, 0.0, 0.0), CENTER)
    depth = jnp.asarray(render_sphere_depth(h, w, k, pose))
    vol = integrate_brick(
        make_brick_volume(cfg), depth, jnp.full((h, w), 100.0, jnp.float32),
        jnp.asarray(k), jnp.asarray(pose, jnp.float32), cfg,
    )
    assert int(vol.n_used) == cfg.pool_size
    assert int(vol.n_dropped) > 0
    assert np.isfinite(np.asarray(vol.tsdf)).all()
    table = np.asarray(vol.table)
    slots = table[table >= 0]
    assert len(np.unique(slots)) == len(slots)  # no slot aliasing


def test_empty_brick_volume_extracts_nothing():
    cfg = _sphere_cfg(48)
    verts, faces, gray = extract_mesh_bricks(make_brick_volume(cfg), cfg)
    assert len(verts) == 0 and len(faces) == 0 and len(gray) == 0
