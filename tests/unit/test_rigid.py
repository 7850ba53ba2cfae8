"""Procrustes + RANSAC tests (reference test_transform.py:16-75 model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dense_visual_odometry_tpu.utils.ransac import (
    max_samples_by_confidence,
    ransac_rigid,
)
from dense_visual_odometry_tpu.utils.rigid import fit_rigid_quat, fit_rigid_svd
from dense_visual_odometry_tpu.utils.lie import se3

fit_svd = jax.jit(fit_rigid_svd)
fit_quat = jax.jit(fit_rigid_quat)


def _random_transform(rng, scale=0.5):
    xi = rng.normal(size=6).astype(np.float32) * scale
    return np.asarray(jax.jit(se3.exp)(jnp.asarray(xi)), dtype=np.float64)


def _cloud(rng, n=50):
    return rng.normal(size=(n, 3)).astype(np.float32) * 2.0


@pytest.mark.parametrize("fit", [fit_svd, fit_quat], ids=["svd", "quat"])
class TestProcrustes:
    def test_identity(self, rng, fit):
        pts = _cloud(rng)
        out = fit(jnp.asarray(pts), jnp.asarray(pts))
        assert bool(out.valid)
        np.testing.assert_allclose(np.asarray(out.transform), np.eye(4), atol=1e-4)
        assert float(out.rmse) < 1e-3

    def test_known_transform(self, rng, fit):
        pts = _cloud(rng)
        t = _random_transform(rng)
        moved = pts @ t[:3, :3].T + t[:3, 3]
        out = fit(jnp.asarray(pts), jnp.asarray(moved))
        assert bool(out.valid)
        np.testing.assert_allclose(np.asarray(out.transform), t, atol=1e-4)

    def test_reflection_not_returned(self, fit):
        # Near-planar cloud that tempts SVD into a reflection.
        rng = np.random.default_rng(5)
        pts = rng.normal(size=(30, 3)).astype(np.float32)
        pts[:, 2] *= 0.01
        t = _random_transform(rng)
        moved = pts @ t[:3, :3].T + t[:3, 3]
        out = fit(jnp.asarray(pts), jnp.asarray(moved))
        rot = np.asarray(out.transform)[:3, :3]
        assert np.linalg.det(rot) == pytest.approx(1.0, abs=1e-4)

    def test_weights_downweight_outliers(self, rng, fit):
        pts = _cloud(rng)
        t = _random_transform(rng)
        moved = pts @ t[:3, :3].T + t[:3, 3]
        moved[:5] += 10.0  # gross outliers
        w = np.ones(len(pts), np.float32)
        w[:5] = 0.0
        out = fit(jnp.asarray(pts), jnp.asarray(moved), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(out.transform), t, atol=1e-4)

    def test_noise_near_truth(self, rng, fit):
        pts = _cloud(rng, n=200)
        t = _random_transform(rng)
        moved = pts @ t[:3, :3].T + t[:3, 3] + rng.normal(size=pts.shape).astype(np.float32) * 0.01
        out = fit(jnp.asarray(pts), jnp.asarray(moved))
        np.testing.assert_allclose(np.asarray(out.transform)[:3, 3], t[:3, 3], atol=0.02)

    def test_degenerate_collinear_flagged(self, fit, rng):
        line = np.linspace(0, 1, 20, dtype=np.float32)[:, None] * np.array([[1.0, 0, 0]], np.float32)
        out = fit(jnp.asarray(line), jnp.asarray(line + 1.0))
        # SVD variant flags collinearity via s[1]; quat variant at least
        # stays finite.
        assert np.all(np.isfinite(np.asarray(out.rmse)))

    def test_batched(self, rng, fit):
        pts = np.stack([_cloud(rng) for _ in range(4)])
        ts = np.stack([_random_transform(rng) for _ in range(4)])
        moved = np.einsum("bij,bnj->bni", ts[:, :3, :3], pts) + ts[:, None, :3, 3]
        out = fit(jnp.asarray(pts), jnp.asarray(moved.astype(np.float32)))
        assert out.transform.shape == (4, 4, 4)
        np.testing.assert_allclose(np.asarray(out.transform), ts, atol=1e-3)


class TestRansac:
    def test_confidence_formula(self):
        # Reference values: p=0.99, s=4, eps=0.5 -> 72 iterations.
        assert max_samples_by_confidence(0.99, 4, 0.5) == 72
        assert max_samples_by_confidence(0.99, 3, 1.0) == 1

    def test_rejects_outliers(self, rng):
        pts = _cloud(rng, n=100)
        t = _random_transform(rng)
        moved = (pts @ t[:3, :3].T + t[:3, 3]).astype(np.float32)
        n_out = 30
        moved[:n_out] = rng.normal(size=(n_out, 3)).astype(np.float32) * 5.0

        out = jax.jit(
            lambda k, s, d: ransac_rigid(k, s, d, threshold=0.05, num_hypotheses=64)
        )(jax.random.key(0), jnp.asarray(pts), jnp.asarray(moved))
        assert bool(out.fit.valid)
        assert int(out.inlier_count) >= 60
        np.testing.assert_allclose(np.asarray(out.fit.transform), t, atol=1e-3)
        # The planted outliers are excluded.
        assert not np.any(np.asarray(out.inliers)[:n_out])
