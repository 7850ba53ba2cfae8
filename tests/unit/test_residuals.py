"""Tests for the fused residual/Jacobian/normal-equation op.

Mirrors the reference's solver test strategy (SURVEY §4 item 3):
- residuals vanish when an image is warped onto itself at identity
  (reference test_cpu_robust_dense_visual_odometry.py:20-44);
- the analytic Jacobian is additionally validated against finite
  differences of the photometric error w.r.t. the twist (stronger than
  anything in the reference).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dense_visual_odometry_tpu.config import TWeighterConfig
from dense_visual_odometry_tpu.models.weighting import (
    huber_weights,
    t_distribution_weights,
)
from dense_visual_odometry_tpu.ops import gradients
from dense_visual_odometry_tpu.ops.residuals import (
    approximate_jacobian,
    deproject_grid,
    normal_equations,
    warp_residuals,
)
from dense_visual_odometry_tpu.utils.lie import se3

K = np.array(
    [[100.0, 0.0, 31.5], [0.0, 100.0, 23.5], [0.0, 0.0, 1.0]], dtype=np.float32
)
H, W = 48, 64


def _smooth_scene(rng):
    """A smooth synthetic intensity/depth pair (bilinear-interp friendly)."""
    v, u = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    gray = (
        100.0
        + 60.0 * np.sin(2 * np.pi * u / 37.0)
        + 40.0 * np.cos(2 * np.pi * v / 23.0)
        + 10.0 * np.sin(2 * np.pi * (u + v) / 53.0)
    ).astype(np.float32)
    depth = (2.0 + 0.5 * np.sin(2 * np.pi * u / 61.0) * np.cos(2 * np.pi * v / 41.0)).astype(
        np.float32
    )
    return gray, depth


class TestWarpResiduals:
    def test_identity_warp_zero_residual(self, rng):
        gray, depth = _smooth_scene(rng)
        res, jac, valid = warp_residuals(
            jnp.asarray(gray), jnp.asarray(depth), jnp.asarray(gray),
            jnp.asarray(K), jnp.eye(4),
            *gradients.sobel(jnp.asarray(gray)),
        )
        assert bool(jnp.any(valid))
        np.testing.assert_allclose(np.asarray(res)[np.asarray(valid)], 0.0, atol=1e-3)

    def test_invalid_depth_masked(self, rng):
        gray, depth = _smooth_scene(rng)
        depth[10:20, 10:20] = 0.0
        res, jac, valid = warp_residuals(
            jnp.asarray(gray), jnp.asarray(depth), jnp.asarray(gray),
            jnp.asarray(K), jnp.eye(4),
            *gradients.sobel(jnp.asarray(gray)),
        )
        valid = np.asarray(valid)
        assert not valid[10:20, 10:20].any()
        # Masked rows contribute exact zeros.
        assert np.all(np.asarray(res)[~valid] == 0.0)
        assert np.all(np.asarray(jac)[~valid] == 0.0)

    def test_deproject_project_roundtrip(self):
        _, depth = _smooth_scene(None)
        pts = deproject_grid(jnp.asarray(depth), jnp.asarray(K))
        # Reproject: u = fx x/z + cx etc.
        x, y, z = [np.asarray(pts[..., i]) for i in range(3)]
        u = K[0, 0] * x / z + K[0, 2]
        v = K[1, 1] * y / z + K[1, 2]
        uu, vv = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
        np.testing.assert_allclose(u, uu, atol=1e-3)
        np.testing.assert_allclose(v, vv, atol=1e-3)

    @pytest.mark.parametrize("mode", ["exact", "approx"])
    def test_jacobian_matches_finite_difference(self, rng, mode):
        """d(residual)/d(xi) at xi=0 for the update T <- exp(xi) @ T."""
        gray, depth = _smooth_scene(rng)
        # Second frame: the same scene warped by a small known motion would
        # be ideal; at linearization point T0=identity, I2 = I1 works and
        # keeps interpolation error tiny.
        g1 = jnp.asarray(gray)
        d1 = jnp.asarray(depth)
        g2 = g1
        gx, gy = gradients.sobel(g2)
        kj = jnp.asarray(K)

        pre = None
        if mode == "approx":
            gx1, gy1 = gradients.sobel(g1)
            pre = approximate_jacobian(g1, d1, kj, gx1, gy1)

        def residual_of_xi(xi):
            t = se3.exp(xi)
            if mode == "approx":
                r, _, vld = warp_residuals(g1, d1, g2, kj, t, precomputed_jacobian=pre)
            else:
                r, _, vld = warp_residuals(g1, d1, g2, kj, t, gx, gy)
            return r, vld

        r0, jac, valid0 = (
            warp_residuals(g1, d1, g2, kj, jnp.eye(4), gx, gy)
            if mode == "exact"
            else warp_residuals(g1, d1, g2, kj, jnp.eye(4), precomputed_jacobian=pre)
        )

        eps = 1e-4
        jac = np.asarray(jac)
        valid0 = np.asarray(valid0)
        # Interior pixels only: Sobel border handling and the 1/8 gradient
        # scale make edges noisier.
        interior = np.zeros_like(valid0)
        interior[4:-4, 4:-4] = True
        sel = valid0 & interior
        for k in range(6):
            xi = np.zeros(6, np.float32)
            xi[k] = eps
            rp, vp = residual_of_xi(jnp.asarray(xi))
            xi[k] = -eps
            rm, vm = residual_of_xi(jnp.asarray(xi))
            both = sel & np.asarray(vp) & np.asarray(vm)
            fd = (np.asarray(rp) - np.asarray(rm))[both] / (2 * eps)
            an = jac[..., k][both] / 8.0  # Sobel has gain 8 per pixel step
            denom = max(np.abs(fd).max(), 1.0)
            np.testing.assert_allclose(an / denom, fd / denom, atol=2e-2)


class TestNormalEquations:
    def test_matches_numpy(self, rng):
        n = 500
        jac = rng.normal(size=(n, 6)).astype(np.float32)
        res = rng.normal(size=(n,)).astype(np.float32)
        wts = rng.uniform(0.1, 2.0, size=(n,)).astype(np.float32)
        valid = rng.uniform(size=(n,)) > 0.3
        jac[~valid] = 0.0
        res[~valid] = 0.0
        wts[~valid] = 0.0

        sys = normal_equations(
            jnp.asarray(res), jnp.asarray(jac), jnp.asarray(wts), jnp.asarray(valid)
        )
        h_ref = (jac * wts[:, None]).T @ jac
        b_ref = -(jac * wts[:, None]).T @ res
        np.testing.assert_allclose(np.asarray(sys.hessian), h_ref, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(sys.rhs), b_ref, rtol=1e-4, atol=1e-3)
        assert int(sys.count) == int(valid.sum())
        np.testing.assert_allclose(
            float(sys.error), float((wts * res**2).sum() / valid.sum()), rtol=1e-4
        )

    def test_hessian_symmetric_psd(self, rng):
        gray, depth = _smooth_scene(rng)
        g = jnp.asarray(gray)
        res, jac, valid = warp_residuals(
            g, jnp.asarray(depth), g, jnp.asarray(K), jnp.eye(4), *gradients.sobel(g)
        )
        sys = normal_equations(res, jac, valid.astype(jnp.float32), valid)
        h = np.asarray(sys.hessian)
        np.testing.assert_allclose(h, h.T, rtol=1e-5)
        assert np.linalg.eigvalsh(h).min() >= -1e-3


class TestWeighting:
    def test_t_weights_range_and_mask(self, rng):
        r2 = jnp.asarray(rng.normal(size=(1000,)).astype(np.float32) ** 2)
        valid = jnp.asarray(rng.uniform(size=(1000,)) > 0.2)
        w = t_distribution_weights(r2, valid, TWeighterConfig())
        w = np.asarray(w)
        assert np.all(w[~np.asarray(valid)] == 0.0)
        assert np.all(w[np.asarray(valid)] > 0.0)
        # Larger residuals get smaller weights.
        r2n = np.asarray(r2)
        vm = np.asarray(valid)
        order = np.argsort(r2n[vm])
        wv = w[vm][order]
        assert wv[0] >= wv[-1]

    def test_t_weights_scale_equivariant(self):
        """The sigma^2 fixed point scales quadratically with residual scale.

        (mean(w r^2) IS sigma^2 at Kerl's fixed point, so comparing it
        across two residual scales tests the scale estimate itself.)
        """
        rng = np.random.default_rng(7)
        r = rng.normal(0, 3.0, size=(20000,)).astype(np.float32)
        cfg = TWeighterConfig(dof=5.0, max_iterations=200, tolerance=1e-10)
        ones = jnp.ones((20000,), dtype=bool)

        def sigma_sq_est(res):
            w = np.asarray(t_distribution_weights(jnp.asarray(res**2), ones, cfg))
            return float(np.mean(w * res**2))

        s1 = sigma_sq_est(r)
        s2 = sigma_sq_est(2.0 * r)
        assert s2 / s1 == pytest.approx(4.0, rel=0.05)
        assert s1 > 0.0

    def test_huber(self):
        r2 = jnp.asarray([1.0, 16.0, 64.0], dtype=jnp.float32)
        valid = jnp.asarray([True, True, False])
        w = np.asarray(huber_weights(r2, valid, delta=4.0))
        np.testing.assert_allclose(w, [1.0, 1.0, 0.0], atol=1e-6)
        w2 = np.asarray(huber_weights(jnp.asarray([64.0]), jnp.asarray([True]), delta=4.0))
        np.testing.assert_allclose(w2, [0.5], atol=1e-6)


class TestConfig:
    def test_reference_json_roundtrip(self, tmp_path):
        from dense_visual_odometry_tpu.config import RobustDVOConfig

        cfg_file = tmp_path / "config.json"
        cfg_file.write_text(
            '{"method": "robust-dvo", "use_gpu": true, "height": 480, "width": 640,'
            ' "levels": 3, "use_weighter": true, "sigma": 0.1,'
            ' "max_iterations": 50, "approximate_image2_gradient": true}'
        )
        cfg = RobustDVOConfig.from_json(cfg_file)
        assert cfg.levels == 3
        assert cfg.use_weighter
        assert cfg.sigma == pytest.approx(0.1)
        assert cfg.max_iterations == 50
        assert cfg.approximate_image2_gradient

    def test_unknown_key_rejected(self):
        from dense_visual_odometry_tpu.config import RobustDVOConfig

        with pytest.raises(ValueError, match="unknown config keys"):
            RobustDVOConfig.from_dict({"bogus": 1})

    def test_hashable_for_jit_static(self):
        from dense_visual_odometry_tpu.config import RobustDVOConfig

        assert hash(RobustDVOConfig()) == hash(RobustDVOConfig())
        assert RobustDVOConfig(levels=3) != RobustDVOConfig(levels=4)
