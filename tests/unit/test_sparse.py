"""Sparse (feature-based) VO pipeline tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dense_visual_odometry_tpu.models.sparse import (
    SparseVO,
    fit_from_matches,
    harris_corners,
    match_patches,
    track_sparse,
)

H, W = 120, 160
K = np.array(
    [[120.0, 0.0, (W - 1) / 2], [0.0, 120.0, (H - 1) / 2], [0.0, 0.0, 1.0]],
    dtype=np.float32,
)
Z0 = 2.0


def _textured(rng):
    """Blocky random texture — strong corners everywhere."""
    base = rng.uniform(50, 200, size=(H // 8, W // 8)).astype(np.float32)
    return np.kron(base, np.ones((8, 8), np.float32))


class TestHarris:
    def test_finds_checkerboard_corners(self):
        img = np.zeros((H, W), np.float32)
        img[: H // 2, : W // 2] = 200.0
        img[H // 2 :, W // 2 :] = 200.0
        corners, scores = jax.jit(lambda g: harris_corners(g, k=16))(jnp.asarray(img))
        corners = np.asarray(corners)
        scores = np.asarray(scores)
        assert scores[0] > 0
        # The strongest corner is near the central crossing.
        c = corners[0]
        assert abs(c[0] - W // 2) < 6 and abs(c[1] - H // 2) < 6

    def test_static_output_shape_on_flat_image(self):
        corners, scores = harris_corners(jnp.zeros((H, W)), k=32)
        assert corners.shape == (32, 2)
        assert np.all(np.asarray(scores) <= 0.0)


class TestMatching:
    def test_matches_pure_shift(self, rng):
        img = _textured(rng)
        shift = 5
        img2 = np.roll(img, shift, axis=1)
        corners, _ = harris_corners(jnp.asarray(img), k=64)
        m = jax.jit(match_patches)(jnp.asarray(img), jnp.asarray(img2), corners)
        valid = np.asarray(m.valid)
        assert valid.sum() >= 32
        duv = np.asarray(m.uv_curr - m.uv_prev)[valid]
        # Most matches recover the (shift, 0) displacement.
        med = np.median(duv, axis=0)
        assert med[0] == pytest.approx(shift, abs=1)
        assert med[1] == pytest.approx(0, abs=1)


class TestFit:
    def test_full_pipeline_recovers_translation(self, rng):
        img = _textured(rng)
        tx = 0.05
        s = K[0, 0] * tx / Z0  # = 3 px
        img2 = np.roll(img, -int(round(s)), axis=1)
        depth = np.full((H, W), Z0, np.float32)
        out = jax.jit(track_sparse)(
            jax.random.key(0),
            jnp.asarray(img), jnp.asarray(depth),
            jnp.asarray(img2), jnp.asarray(depth),
            jnp.asarray(K),
        )
        assert bool(out.success)
        est_tx = float(out.transform[0, 3])
        # Integer-pixel matching quantizes to ~1px accuracy: 1px = 0.0167m.
        assert est_tx == pytest.approx(-int(round(s)) * Z0 / K[0, 0], abs=0.02)

    def test_external_deep_matches_hook(self, rng):
        """The LoFTR-shaped interface: inject externally produced matches
        (as a deep matcher would, reference loftr.py:86-106) straight into
        fit_from_matches and recover a full 6-DoF motion — no Harris/ZNCC
        involved, subpixel float coordinates throughout."""
        from dense_visual_odometry_tpu.models.sparse import Matches
        from dense_visual_odometry_tpu.utils.lie import se3

        n = 200
        # Ground-truth transform: small rotation + translation.
        xi = jnp.asarray([0.02, -0.01, 0.015, 0.01, -0.008, 0.012], jnp.float32)
        t_gt = se3.exp(xi)
        # Random 3-D points in front of the previous camera.
        pts = np.stack(
            [
                rng.uniform(-1.0, 1.0, n),
                rng.uniform(-0.8, 0.8, n),
                rng.uniform(1.5, 3.0, n),
            ],
            axis=-1,
        ).astype(np.float32)
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        uv_prev = np.stack(
            [fx * pts[:, 0] / pts[:, 2] + cx, fy * pts[:, 1] / pts[:, 2] + cy],
            axis=-1,
        )
        pts_t = pts @ np.asarray(t_gt)[:3, :3].T + np.asarray(t_gt)[:3, 3]
        uv_curr = np.stack(
            [
                fx * pts_t[:, 0] / pts_t[:, 2] + cx,
                fy * pts_t[:, 1] / pts_t[:, 2] + cy,
            ],
            axis=-1,
        )
        inside = (
            (uv_prev[:, 0] > 1) & (uv_prev[:, 0] < W - 2)
            & (uv_prev[:, 1] > 1) & (uv_prev[:, 1] < H - 2)
            & (uv_curr[:, 0] > 1) & (uv_curr[:, 0] < W - 2)
            & (uv_curr[:, 1] > 1) & (uv_curr[:, 1] < H - 2)
        )
        # Dense depth maps consistent with the points (nearest pixel).
        depth_prev = np.zeros((H, W), np.float32)
        depth_curr = np.zeros((H, W), np.float32)
        for i in np.nonzero(inside)[0]:
            depth_prev[int(round(uv_prev[i, 1])), int(round(uv_prev[i, 0]))] = pts[i, 2]
            depth_curr[int(round(uv_curr[i, 1])), int(round(uv_curr[i, 0]))] = pts_t[i, 2]

        matches = Matches(
            uv_prev=jnp.asarray(uv_prev, jnp.float32),
            uv_curr=jnp.asarray(uv_curr, jnp.float32),
            confidence=jnp.ones((n,), jnp.float32),
            valid=jnp.asarray(inside),
        )
        out = fit_from_matches(
            jax.random.key(0), matches,
            jnp.asarray(depth_prev), jnp.asarray(depth_curr), jnp.asarray(K),
            depth_edge_tol=10.0,  # sparse synthetic depth has no edges
        )
        assert bool(out.success)
        xi_est = np.asarray(se3.log(out.transform))
        np.testing.assert_allclose(xi_est, np.asarray(xi), atol=2e-3)

    def test_insufficient_matches_fails(self):
        from dense_visual_odometry_tpu.models.sparse import Matches

        n = 32
        matches = Matches(
            uv_prev=jnp.zeros((n, 2)),
            uv_curr=jnp.zeros((n, 2)),
            confidence=jnp.zeros((n,)),
            valid=jnp.zeros((n,), bool),
        )
        depth = jnp.full((H, W), Z0)
        out = fit_from_matches(
            jax.random.key(0), matches, depth, depth, jnp.asarray(K)
        )
        assert not bool(out.success)

    def test_invalid_depth_rows_excluded(self, rng):
        img = _textured(rng)
        depth = np.full((H, W), Z0, np.float32)
        depth[:, : W // 2] = 0.0  # left half invalid
        out = jax.jit(track_sparse)(
            jax.random.key(0),
            jnp.asarray(img), jnp.asarray(depth),
            jnp.asarray(img), jnp.asarray(depth),
            jnp.asarray(K),
        )
        # Self-pair with half-valid depth: still succeeds at identity.
        assert bool(out.success)
        np.testing.assert_allclose(
            np.asarray(out.transform), np.eye(4), atol=5e-3
        )


class TestSparseSession:
    def test_session_tracks_shift_sequence(self, rng):
        img = _textured(rng)
        depth = (np.full((H, W), Z0 / 2e-4)).astype(np.uint16)  # raw DN
        from dense_visual_odometry_tpu.camera import CameraModel

        cam = CameraModel.create(K, 2e-4)
        vo = SparseVO(cam)
        vo.step(img, depth)
        pose = vo.step(np.roll(img, -3, axis=1), depth)
        assert vo.last_result is not None
        assert bool(vo.last_result.success)
        expected_tx = -3 * Z0 / K[0, 0]
        assert float(pose.matrix[0, 3] if hasattr(pose, "matrix") else pose[0, 3]) == pytest.approx(
            -expected_tx, abs=0.02
        )
