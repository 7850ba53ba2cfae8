"""TSDF fusion + marching-tetrahedra mesh extraction.

Oracle style follows SURVEY §4: analytic geometry with exact ground truth
(a sphere) instead of mocks — extraction is validated against the true
signed distance field, fusion against ray-traced depth maps.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dense_visual_odometry_tpu.models.tsdf import (
    TSDFConfig,
    TSDFVolume,
    extract_mesh,
    integrate,
    integrate_frames,
    make_volume,
    save_mesh_ply,
)

CENTER = np.array([0.0, 0.0, 1.0])
RADIUS = 0.3


def sphere_volume(cfg: TSDFConfig) -> TSDFVolume:
    """Analytic truncated SDF of the test sphere, fully observed."""
    d, h, w = cfg.dims
    xs = cfg.origin[0] + (np.arange(w) + 0.5) * cfg.voxel_size
    ys = cfg.origin[1] + (np.arange(h) + 0.5) * cfg.voxel_size
    zs = cfg.origin[2] + (np.arange(d) + 0.5) * cfg.voxel_size
    dist = np.sqrt(
        (xs[None, None, :] - CENTER[0]) ** 2
        + (ys[None, :, None] - CENTER[1]) ** 2
        + (zs[:, None, None] - CENTER[2]) ** 2
    ) - RADIUS
    tsdf = np.clip(dist / cfg.truncation, -1.0, 1.0).astype(np.float32)
    return TSDFVolume(
        tsdf=jnp.asarray(tsdf),
        weight=jnp.full(cfg.dims, 2.0, jnp.float32),
        gray=jnp.full(cfg.dims, 128.0, jnp.float32),
    )


def render_sphere_depth(h, w, intrinsics, pose):
    """Exact ray-traced depth of the sphere from a camera-to-world pose."""
    t_cw = np.linalg.inv(pose)
    c_cam = t_cw[:3, :3] @ CENTER + t_cw[:3, 3]
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    x = (u - intrinsics[0, 2]) / intrinsics[0, 0]
    y = (v - intrinsics[1, 2]) / intrinsics[1, 1]
    # Ray p(t) = t * (x, y, 1): depth is t itself.
    a = x * x + y * y + 1.0
    b = -2.0 * (x * c_cam[0] + y * c_cam[1] + c_cam[2])
    c0 = float(c_cam @ c_cam - RADIUS**2)
    disc = b * b - 4 * a * c0
    hit = disc > 0
    t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / (2 * a), 0.0)
    return np.where(hit & (t > 0), t, 0.0).astype(np.float32)


def lookat(eye, target, up=(0.0, 1.0, 0.0)):
    """Camera-to-world pose with +z viewing direction toward ``target``."""
    eye = np.asarray(eye, dtype=np.float64)
    fwd = np.asarray(target, dtype=np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, dtype=np.float64))
    if np.linalg.norm(right) < 1e-6:  # view parallel to up
        right = np.cross(fwd, np.array([0.0, 0.0, 1.0]))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    pose = np.eye(4)
    pose[:3, 0], pose[:3, 1], pose[:3, 2], pose[:3, 3] = right, down, fwd, eye
    assert np.isclose(np.linalg.det(pose[:3, :3]), 1.0)
    return pose


def test_marching_tets_recovers_sphere():
    cfg = TSDFConfig.around(CENTER, 1.0, resolution=64)
    verts, faces, gray = extract_mesh(sphere_volume(cfg), cfg)
    assert len(faces) > 1000
    rad = np.linalg.norm(verts - CENTER, axis=1)
    # Linear interpolation of a clean SDF puts vertices well within a
    # voxel of the true surface.
    assert np.abs(rad - RADIUS).max() < cfg.voxel_size
    assert np.allclose(gray, 128.0)


def test_mesh_is_watertight_and_outward_wound():
    cfg = TSDFConfig.around(CENTER, 1.0, resolution=48)
    verts, faces, _ = extract_mesh(sphere_volume(cfg), cfg)
    # Watertight: every undirected edge is shared by exactly two faces.
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()
    # Winding: normals point away from the sphere centre.
    e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
    e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
    n = np.cross(e1, e2)
    outward = verts[faces].mean(axis=1) - CENTER
    agree = np.einsum("ij,ij->i", n, outward) > 0
    assert agree.mean() > 0.99


def test_empty_volume_extracts_nothing():
    cfg = TSDFConfig(dims=(16, 16, 16), voxel_size=0.05)
    verts, faces, gray = extract_mesh(make_volume(cfg), cfg)
    assert len(verts) == 0 and len(faces) == 0 and len(gray) == 0


def test_fusion_from_rendered_depth():
    cfg = TSDFConfig.around(CENTER, 1.2, resolution=64, truncation=0.06)
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
    frames = [
        (render_sphere_depth(h, w, k, p), np.full((h, w), 100.0, np.float32))
        for p in poses
    ]
    vol = integrate_frames(make_volume(cfg), frames, k, poses, cfg)
    verts, faces, gray = extract_mesh(vol, cfg, min_weight=1.0)
    assert len(faces) > 500
    rad = np.linalg.norm(verts - CENTER, axis=1)
    # Fusion adds nearest-pixel sampling + view-averaging error: stay
    # within two voxels of the true surface.
    assert np.abs(rad - RADIUS).max() < 2.0 * cfg.voxel_size
    assert np.abs(np.median(rad) - RADIUS) < 0.5 * cfg.voxel_size
    assert np.all(gray > 90.0) and np.all(gray < 110.0)


def test_integrate_updates_weight_and_is_donated_safe():
    cfg = TSDFConfig.around(CENTER, 1.2, resolution=32)
    h, w = 60, 80
    k = np.array(
        [[60.0, 0.0, 40.0], [0.0, 60.0, 30.0], [0.0, 0.0, 1.0]],
        dtype=np.float32,
    )
    pose = np.eye(4, dtype=np.float32)
    depth = render_sphere_depth(h, w, k, pose)
    vol = make_volume(cfg)
    for _ in range(3):
        vol = integrate(
            vol, jnp.asarray(depth), jnp.full((h, w), 50.0), jnp.asarray(k),
            jnp.asarray(pose), cfg,
        )
    wmax = float(jnp.max(vol.weight))
    assert wmax == 3.0
    # Unobserved voxels untouched.
    assert float(jnp.min(vol.weight)) == 0.0
    assert float(jnp.max(vol.gray)) == pytest.approx(50.0)


def test_adaptive_truncation_widens_far_band():
    """With truncation_scale_sq > 0 the band behind a FAR surface is
    wider: voxels outside the fixed band but inside the adaptive one get
    integrated instead of skipped."""
    # Flat wall at z = 2.0 m observed head-on from the origin.
    h, w = 60, 80
    k = np.array(
        [[60.0, 0.0, 40.0], [0.0, 60.0, 30.0], [0.0, 0.0, 1.0]],
        dtype=np.float32,
    )
    depth = np.full((h, w), 2.0, np.float32)
    pose = np.eye(4, dtype=np.float32)
    base = dict(
        dims=(64, 8, 8), voxel_size=0.02, origin=(-0.08, -0.08, 0.9),
        truncation=0.04,
    )
    gray = jnp.full((h, w), 50.0)

    def fuse(cfg):
        return integrate(
            make_volume(cfg), jnp.asarray(depth), gray, jnp.asarray(k),
            jnp.asarray(pose), cfg,
        )

    vol_fixed = fuse(TSDFConfig(**base))
    vol_adapt = fuse(TSDFConfig(**base, truncation_scale_sq=0.03))
    # tau_fixed = 4 cm; tau_adapt = 4 + 3*4 = 16 cm at z=2. A voxel 8 cm
    # behind the wall (z ~ 2.08) is only integrated adaptively.
    zs = base["origin"][2] + (np.arange(64) + 0.5) * base["voxel_size"]
    probe = int(np.argmin(np.abs(zs - 2.08)))
    assert float(vol_fixed.weight[probe, 4, 4]) == 0.0
    assert float(vol_adapt.weight[probe, 4, 4]) == 1.0
    # And the near side of the field is identical in sign structure:
    # both see free space in front of the wall.
    front = int(np.argmin(np.abs(zs - 1.5)))
    assert float(vol_fixed.tsdf[front, 4, 4]) == 1.0
    assert float(vol_adapt.tsdf[front, 4, 4]) == 1.0


def test_space_carving_removes_moved_object():
    """A surface that disappears (dynamic object) is carved out quickly
    with carve_decay > 0 and lingers with standard averaging."""
    h, w = 60, 80
    k = np.array(
        [[60.0, 0.0, 40.0], [0.0, 60.0, 30.0], [0.0, 0.0, 1.0]],
        dtype=np.float32,
    )
    pose = np.eye(4, dtype=np.float32)
    near = np.full((h, w), 1.0, np.float32)  # object at 1 m
    far = np.full((h, w), 2.5, np.float32)  # object gone; wall behind
    gray = jnp.full((h, w), 50.0)

    def run(carve):
        cfg = TSDFConfig(
            dims=(96, 8, 8), voxel_size=0.02, origin=(-0.08, -0.08, 0.5),
            truncation=0.06, carve_decay=carve,
        )
        vol = make_volume(cfg)
        for _ in range(8):  # object observed 8 frames
            vol = integrate(vol, jnp.asarray(near), gray, jnp.asarray(k),
                            jnp.asarray(pose), cfg)
        for _ in range(4):  # then it moves away: 4 free-space views
            vol = integrate(vol, jnp.asarray(far), gray, jnp.asarray(k),
                            jnp.asarray(pose), cfg)
        zs = cfg.origin[2] + (np.arange(96) + 0.5) * cfg.voxel_size
        # Probe just BEHIND the old surface: that's where the stale
        # object's negative field (and its zero crossing) lives.
        probe = int(np.argmin(np.abs(zs - 1.05)))
        return float(vol.tsdf[probe, 4, 4])

    lingering = run(carve=0.0)
    carved = run(carve=0.5)
    # Standard averaging still shows a surface (zero crossing) after 4
    # conflicting views; carving has fully freed the voxel.
    assert lingering < 0.0
    assert carved > 0.25
    assert carved > lingering + 0.2


@pytest.mark.parametrize("suffix", ["ply", "obj"])
def test_reconstruct_cli_bundled(tmp_path, suffix):
    """End-to-end: track the (subset) bundled set, fuse, export a mesh.

    The output suffix selects the writer (.ply ASCII PLY, .obj Wavefront).
    """
    from dense_visual_odometry_tpu.apps import reconstruct

    out = tmp_path / f"mesh.{suffix}"
    rc = reconstruct.main(
        [
            "test", "-o", str(out), "--resolution", "48", "--size", "3",
            "--every", "1",
        ]
    )
    assert rc == 0
    if suffix == "ply":
        header = out.read_text().split("end_header")[0]
        n_verts = int(header.split("element vertex ")[1].split()[0])
        n_faces = int(header.split("element face ")[1].split()[0])
    else:
        lines = out.read_text().splitlines()
        n_verts = sum(1 for ln in lines if ln.startswith("v "))
        n_faces = sum(1 for ln in lines if ln.startswith("f "))
    assert n_verts > 200 and n_faces > 200


def test_save_mesh_ply_roundtrip(tmp_path):
    cfg = TSDFConfig.around(CENTER, 1.0, resolution=24)
    verts, faces, gray = extract_mesh(sphere_volume(cfg), cfg)
    out = tmp_path / "mesh.ply"
    save_mesh_ply(out, verts, faces, gray)
    text = out.read_text().splitlines()
    assert text[0] == "ply"
    assert f"element vertex {len(verts)}" in text
    assert f"element face {len(faces)}" in text
    body = [ln for ln in text if ln and not ln[0].isalpha()]
    assert len(body) == len(verts) + len(faces)


def test_save_mesh_obj_roundtrip(tmp_path):
    import numpy as np

    from dense_visual_odometry_tpu.models.tsdf import save_mesh_obj

    cfg = TSDFConfig.around(CENTER, 1.0, resolution=24)
    verts, faces, gray = extract_mesh(sphere_volume(cfg), cfg)
    out = tmp_path / "mesh.obj"
    save_mesh_obj(out, verts, faces, gray)
    lines = out.read_text().splitlines()
    v_lines = [ln for ln in lines if ln.startswith("v ")]
    f_lines = [ln for ln in lines if ln.startswith("f ")]
    assert len(v_lines) == len(verts)
    assert len(f_lines) == len(faces)
    # 1-based indices within range, winding preserved.
    first = np.array([int(t) for t in f_lines[0].split()[1:]])
    assert (first >= 1).all() and (first <= len(verts)).all()
    np.testing.assert_array_equal(first - 1, faces[0])
    # Vertex coordinates round-trip (first vertex, 3 coords + gray rgb).
    parts = [float(t) for t in v_lines[0].split()[1:]]
    np.testing.assert_allclose(parts[:3], verts[0], atol=1e-5)
    assert len(parts) == 6 and 0.0 <= parts[3] <= 1.0


def test_raycast_view_matches_analytic_sphere():
    """The splat raycast renders the analytic sphere volume to within a
    voxel of exact ray-traced depth (sub-voxel SDF correction included),
    and reports holes as 0-depth."""
    from dense_visual_odometry_tpu.models.tsdf import raycast_view

    cfg = TSDFConfig.around(CENTER, 1.0, resolution=96)
    vol = sphere_volume(cfg)
    h, w = 60, 80
    k = np.array(
        [[70.0, 0, (w - 1) / 2], [0, 70.0, (h - 1) / 2], [0, 0, 1.0]],
        np.float32,
    )
    for eye in ([0.0, 0.0, 0.2], [0.35, 0.1, 0.35]):
        pose = lookat(eye, CENTER)
        depth, gray = raycast_view(
            vol, jnp.asarray(k), jnp.asarray(pose, jnp.float32), cfg,
            (h, w),
        )
        depth = np.asarray(depth)
        want = render_sphere_depth(h, w, k, pose)
        # Compare where both see the surface.  Grazing incidence is
        # inherently ill-conditioned for ANY surface renderer (the
        # stored SDF is a view-ray distance only near the crossing, and
        # a half-voxel projection offset moves the limb depth by many
        # voxels), so the tight bound applies at cos(incidence) > 0.5
        # and the silhouette band only gets a median bound.
        both = (depth > 0) & (want > 0)
        t_cw = np.linalg.inv(pose)
        uu, vv = np.meshgrid(np.arange(w), np.arange(h))
        rays = np.stack(
            [(uu - k[0, 2]) / k[0, 0], (vv - k[1, 2]) / k[1, 1],
             np.ones_like(want)], -1,
        )
        p_cam = rays * want[..., None]
        p_world = p_cam @ pose[:3, :3].T + pose[:3, 3]
        normal = p_world - CENTER
        normal /= np.maximum(
            np.linalg.norm(normal, axis=-1, keepdims=True), 1e-9
        )
        raydir = rays / np.linalg.norm(rays, axis=-1, keepdims=True)
        raydir_w = raydir @ pose[:3, :3].T
        cosi = np.abs(np.sum(raydir_w * normal, axis=-1))
        frontal = both & (cosi > 0.5)
        coverage = frontal.sum() / max(((want > 0) & (cosi > 0.5)).sum(), 1)
        assert coverage > 0.8, f"raycast lost the surface: {coverage:.2f}"
        # Measured accuracy profile: sub-half-voxel frontally, ~2 voxels
        # at 60 deg incidence (the SDF correction is a view-ray distance
        # only near the crossing; obliquity scales its error by 1/cos).
        head_on = both & (cosi > 0.85)
        err_h = np.abs(depth[head_on] - want[head_on])
        assert np.quantile(err_h, 0.9) < 0.5 * cfg.voxel_size, (
            eye, np.quantile(err_h, 0.9) / cfg.voxel_size
        )
        err_f = np.abs(depth[frontal] - want[frontal])
        assert np.quantile(err_f, 0.9) < 2.5 * cfg.voxel_size, (
            eye, np.quantile(err_f, 0.9) / cfg.voxel_size
        )
        err_all = np.abs(depth[both] - want[both])
        assert np.median(err_all) < 1.5 * cfg.voxel_size
        m = frontal
        # Color comes from the volume's running-average intensity.
        g = np.asarray(gray)
        assert np.all(np.abs(g[m] - 128.0) < 1.0)
        # No surface behind the camera side: coverage is bounded.
        assert (depth > 0).mean() < 0.95


def test_raycast_march_subvoxel_accuracy():
    """The marching raycaster (nearest coarse march + trilinear
    sphere-tracing refinement) is SUB-VOXEL everywhere on the analytic
    sphere — measured 0.01 voxels frontal / 0.07 at 60 deg incidence,
    25-50x tighter than the splat renderer, with full coverage.  This
    is what makes per-frame model prediction (kinfu mode) viable."""
    from dense_visual_odometry_tpu.models.tsdf import raycast_view_march

    cfg = TSDFConfig.around(CENTER, 1.0, resolution=96)
    vol = sphere_volume(cfg)
    h, w = 60, 80
    k = np.array(
        [[70.0, 0, (w - 1) / 2], [0, 70.0, (h - 1) / 2], [0, 0, 1.0]],
        np.float32,
    )
    for eye in ([0.0, 0.0, 0.2], [0.35, 0.1, 0.35]):
        pose = lookat(eye, CENTER)
        depth, gray = raycast_view_march(
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


def test_fused_mesh_surface_error_vs_ground_truth():
    """Map-quality metric: fuse a rendered synthetic sequence at GROUND
    TRUTH poses, extract the mesh, and measure vertex-to-true-surface
    distance.  The scene is an analytic depth function z(x, y), so the
    point-to-surface error is exact — median must stay within a voxel
    (fusion averaging + marching-tetrahedra interpolation)."""
    from dense_visual_odometry_tpu.io.synthetic import render_view
    from dense_visual_odometry_tpu.models.tsdf import extract_mesh
    from dense_visual_odometry_tpu.utils.lie import se3

    h, w = 120, 160
    k = np.array(
        [[130.0, 0, (w - 1) / 2], [0, 130.0, (h - 1) / 2], [0, 0, 1.0]],
        np.float32,
    )
    v, u = np.meshgrid(
        np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64),
        indexing="ij",
    )
    gray = (120 + 50 * np.sin(2 * np.pi * u / 23.0)
            + 40 * np.cos(2 * np.pi * v / 17.0)).astype(np.float32)

    def z_of(x, y):
        # Surface depth as a function of WORLD (x, y): z = 2 + bumps.
        return 2.0 + 0.2 * np.sin(2.5 * x) * np.cos(2.5 * y)

    x_w = (u - k[0, 2]) / k[0, 0]
    y_w = (v - k[1, 2]) / k[1, 1]
    # Solve depth along each ray: z = z_of(x_w * z, y_w * z); two
    # fixed-point sweeps converge (slopes << 1).
    z = np.full((h, w), 2.0)
    for _ in range(8):
        z = z_of(x_w * z, y_w * z)
    depth0 = z.astype(np.float32)

    rng = np.random.default_rng(0)
    cfg = TSDFConfig.around((0.0, 0.0, 2.0), 2.5, resolution=100)
    vol = make_volume(cfg)
    pose = np.eye(4)
    import jax.numpy as jnp_

    from dense_visual_odometry_tpu.models.tsdf import integrate as _integ

    for i in range(8):
        if i == 0:
            g, d = gray, depth0
        else:
            xi = rng.uniform(-1, 1, 6) * np.array(
                [8e-3, 8e-3, 1e-2, 4e-3, 4e-3, 5e-3]
            )
            pose = pose @ np.asarray(se3.exp(np.asarray(xi, np.float32)))
            g, d = render_view(gray, depth0, k, np.linalg.inv(pose))
        vol = _integ(
            vol, jnp_.asarray(d), jnp_.asarray(g), jnp_.asarray(k),
            jnp_.asarray(pose, jnp_.float32), cfg,
        )
    verts, faces, vgray = extract_mesh(vol, cfg)
    assert len(verts) > 1000
    # Point-to-surface: compare each vertex's z against z_of(x, y)
    # (surface is a graph over (x, y), interior region only).
    vx, vy, vz = verts[:, 0], verts[:, 1], verts[:, 2]
    interior = (np.abs(vx) < 0.6) & (np.abs(vy) < 0.45)
    err = np.abs(vz[interior] - z_of(vx[interior], vy[interior]))
    assert np.median(err) < cfg.voxel_size, (
        np.median(err), cfg.voxel_size
    )
    assert np.quantile(err, 0.9) < 2.5 * cfg.voxel_size
