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
