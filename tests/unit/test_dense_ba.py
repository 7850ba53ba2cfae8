"""Dense BA (pose + inverse-depth, Schur complement) unit tests.

Analytic planar-scene fixtures: a textured constant-depth plane viewed by a
camera translating along x gives exact image shifts (same construction as
test_robust), so ground-truth poses, depths and photometric consistency
are all known in closed form.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dense_visual_odometry_tpu.models.dense_ba import (
    DenseBAConfig,
    build_dense_ba_data,
    optimize_dense_ba,
    optimize_dense_ba_sharded,
)

H, W = 48, 64
FX = 60.0
Z0 = 2.0
K_MAT = np.array(
    [[FX, 0.0, (W - 1) / 2], [0.0, FX, (H - 1) / 2], [0.0, 0.0, 1.0]],
    np.float32,
)


def _texture(u, v):
    # Moderate spatial frequencies: rich enough to constrain all DoF,
    # smooth enough that bilinear interpolation error stays small.
    return (
        120.0
        + 45.0 * np.sin(2 * np.pi * u / 23.0)
        + 35.0 * np.cos(2 * np.pi * v / 17.0)
        + 20.0 * np.sin(2 * np.pi * (u + 2 * v) / 41.0)
    )


def _planar_sequence(k, tx=0.02):
    """K frames of a plane at depth Z0, camera stepping +tx in x.

    -> (grays, depths, gt_poses) with pose_k = [I | -k*tx*e_x]
    (camera-to-world, world = frame-0 camera).
    """
    v, u = np.meshgrid(
        np.arange(H, dtype=np.float64), np.arange(W, dtype=np.float64),
        indexing="ij",
    )
    s = FX * tx / Z0
    grays, depths, poses = [], [], []
    for i in range(k):
        grays.append(_texture(u - i * s, v).astype(np.float32))
        depths.append(np.full((H, W), Z0, np.float32))
        p = np.eye(4)
        p[0, 3] = -i * tx
        poses.append(p)
    return grays, depths, np.stack(poses)


def _pose_err(poses, gt):
    return float(
        np.sqrt(np.mean(np.sum((poses[:, :3, 3] - gt[:, :3, 3]) ** 2, -1)))
    )


class TestDenseBA:
    def test_ground_truth_is_a_fixed_point(self):
        grays, depths, gt = _planar_sequence(4)
        data = build_dense_ba_data(grays, depths, K_MAT, grid_stride=4)
        cfg = DenseBAConfig(max_iterations=3)
        out = optimize_dense_ba(jnp.asarray(gt, jnp.float32), data, cfg)
        # Poses stay at ground truth; chi2 is bounded by bilinear
        # interpolation noise of the analytic texture (~1.5/point here).
        assert _pose_err(np.asarray(out.poses), gt) < 5e-4
        assert float(out.chi2) < 3.0 * np.asarray(data.valid).sum()
        # Depths stay near measured (the photometric term may absorb a
        # little interpolation bias).
        np.testing.assert_allclose(
            np.asarray(out.inv_depth), np.asarray(data.inv_depth0), atol=0.1
        )

    def test_recovers_perturbed_poses(self):
        grays, depths, gt = _planar_sequence(5, tx=0.02)
        data = build_dense_ba_data(grays, depths, K_MAT, grid_stride=4)
        rng = np.random.default_rng(3)
        noisy = gt.copy()
        noisy[1:, 0, 3] += rng.uniform(-0.008, 0.008, size=4)
        noisy[1:, 1, 3] += rng.uniform(-0.004, 0.004, size=4)
        err0 = _pose_err(noisy, gt)
        out = optimize_dense_ba(
            jnp.asarray(noisy, jnp.float32), data, DenseBAConfig(max_iterations=8)
        )
        err1 = _pose_err(np.asarray(out.poses), gt)
        assert err1 < 0.25 * err0
        hist = np.asarray(out.chi2_history)
        assert hist[-1] < hist[0]

    def test_depth_refinement_improves_corrupted_depth(self):
        """Corrupt the measured depth of one keyframe; the photometric
        terms must pull the inverse depths back toward truth."""
        grays, depths, gt = _planar_sequence(4, tx=0.05)
        depths = [d.copy() for d in depths]
        rng = np.random.default_rng(0)
        depths[1] *= (1.0 + rng.uniform(-0.2, 0.2, size=depths[1].shape)).astype(
            np.float32
        )
        data = build_dense_ba_data(grays, depths, K_MAT, grid_stride=4)
        cfg = DenseBAConfig(max_iterations=12, depth_anchor_weight=1e-3)
        out = optimize_dense_ba(jnp.asarray(gt, jnp.float32), data, cfg)
        rho_true = 1.0 / Z0
        err0 = np.abs(np.asarray(data.inv_depth0)[1] - rho_true).mean()
        err1 = np.abs(np.asarray(out.inv_depth)[1] - rho_true).mean()
        assert err1 < 0.5 * err0

    def test_sharded_matches_single_device(self):
        n_dev = jax.device_count()
        if n_dev < 2:
            pytest.skip("needs the multi-device CPU simulation")
        from jax.sharding import Mesh

        k = n_dev  # one owner per device
        grays, depths, gt = _planar_sequence(k, tx=0.015)
        data = build_dense_ba_data(grays, depths, K_MAT, grid_stride=6)
        rng = np.random.default_rng(1)
        noisy = gt.copy()
        noisy[1:, 0, 3] += rng.uniform(-0.005, 0.005, size=k - 1)
        cfg = DenseBAConfig(max_iterations=5)
        single = optimize_dense_ba(jnp.asarray(noisy, jnp.float32), data, cfg)
        mesh = Mesh(np.asarray(jax.devices()), ("data",))
        sharded = optimize_dense_ba_sharded(
            mesh, jnp.asarray(noisy, jnp.float32), data, cfg
        )
        # Guards the check_vma workaround in optimize_dense_ba_sharded:
        # with replication checking on, shard_map psums the AD cotangents
        # and the sharded Jacobians silently inflate ~K-fold while chi2
        # stays correct.  Residual tolerance covers f32 psum ordering.
        np.testing.assert_allclose(
            np.asarray(sharded.poses), np.asarray(single.poses), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(sharded.inv_depth), np.asarray(single.inv_depth),
            atol=1e-4,
        )
        np.testing.assert_allclose(
            float(sharded.chi2), float(single.chi2), rtol=1e-3
        )

    def test_keyframe_mesh_mismatch_rejected(self):
        n_dev = jax.device_count()
        if n_dev < 2:
            pytest.skip("needs the multi-device CPU simulation")
        from jax.sharding import Mesh

        grays, depths, gt = _planar_sequence(n_dev + 1)
        data = build_dense_ba_data(grays, depths, K_MAT, grid_stride=8)
        mesh = Mesh(np.asarray(jax.devices()), ("data",))
        with pytest.raises(ValueError, match="divide"):
            optimize_dense_ba_sharded(mesh, jnp.asarray(gt, jnp.float32), data)
