"""Illumination-compensated photometric tracking (``illumination="bias"``).

Real cameras auto-expose: brightness constancy breaks by a per-frame
gain/bias (the fr1-difficulty sensor model wobbles +-4 DN of bias).  The
bias mode adds one intensity-offset unknown per solve, eliminated
EXACTLY per iteration via a Schur complement on the normal equations
(``models/robust._bias_schur``).  Beyond-reference capability — the
reference's model is plain brightness constancy
(cpu_robust_dense_visual_odometry.py:191-194).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dense_visual_odometry_tpu.camera import CameraModel
from dense_visual_odometry_tpu.config import RobustDVOConfig
from dense_visual_odometry_tpu.models.robust import (
    FrameData,
    _bias_schur,
    track_pair,
)
from dense_visual_odometry_tpu.ops import pyramid as pyr_ops
from dense_visual_odometry_tpu.ops.residuals import ResidualSystem
from dense_visual_odometry_tpu.utils.lie import se3


def _scene(h=120, w=160, seed=0):
    from dense_visual_odometry_tpu.io.synthetic import render_view

    rng = np.random.default_rng(seed)
    # Smooth random texture + bumpy depth: enough structure for 4-level
    # tracking without any file fixtures.
    gray = rng.uniform(40, 210, (h // 8, w // 8)).astype(np.float32)
    import cv2

    gray = cv2.resize(gray, (w, h), interpolation=cv2.INTER_CUBIC)
    v, u = np.meshgrid(
        np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64),
        indexing="ij",
    )
    depth = (
        2.0 + 0.25 * np.sin(2 * np.pi * u / 40.0) * np.cos(2 * np.pi * v / 32.0)
    ).astype(np.float32)
    k = np.array(
        [[120.0, 0.0, (w - 1) / 2], [0.0, 120.0, (h - 1) / 2], [0, 0, 1.0]],
        np.float32,
    )
    return gray, depth, k, render_view


def _fd(gray, depth, levels=3):
    return FrameData(
        gray=pyr_ops.build_pyramid(jnp.asarray(gray), levels),
        depth_m=pyr_ops.build_pyramid(jnp.asarray(depth), levels),
    )


class TestBiasSchur:
    def test_matches_explicit_joint_solve(self):
        """The Schur-reduced pose system equals explicitly solving the
        7-unknown (pose + bias) normal equations and dropping the bias."""
        rng = np.random.default_rng(1)
        n = 200
        jac = rng.standard_normal((1, n, 6)).astype(np.float32)
        res = rng.standard_normal((1, n)).astype(np.float32)
        wts = rng.uniform(0.1, 1.0, (1, n)).astype(np.float32)
        valid = np.ones((1, n), bool)

        from dense_visual_odometry_tpu.ops.residuals import normal_equations

        sys6 = normal_equations(
            jnp.asarray(res).reshape(1, 10, 20),
            jnp.asarray(jac).reshape(1, 10, 20, 6),
            jnp.asarray(wts).reshape(1, 10, 20),
            jnp.asarray(valid).reshape(1, 10, 20),
        )
        red = _bias_schur(
            sys6,
            jnp.asarray(res).reshape(1, 10, 20),
            jnp.asarray(jac).reshape(1, 10, 20, 6),
            jnp.asarray(wts).reshape(1, 10, 20),
        )
        # Explicit 7x7 system with a ones column.
        m = np.concatenate([jac[0], np.ones((n, 1), np.float32)], axis=1)
        h7 = (m * wts[0][:, None]).T @ m
        b7 = -(m * wts[0][:, None]).T @ res[0]
        x7 = np.linalg.solve(h7, b7)
        x6 = np.linalg.solve(np.asarray(red.hessian[0]), np.asarray(red.rhs[0]))
        np.testing.assert_allclose(x6, x7[:6], rtol=1e-4, atol=1e-5)

    def test_centered_error_reported(self):
        rng = np.random.default_rng(2)
        res = (rng.standard_normal((1, 4, 5)) + 3.0).astype(np.float32)
        jac = rng.standard_normal((1, 4, 5, 6)).astype(np.float32)
        wts = np.ones((1, 4, 5), np.float32)
        from dense_visual_odometry_tpu.ops.residuals import normal_equations

        sys6 = normal_equations(
            jnp.asarray(res), jnp.asarray(jac), jnp.asarray(wts),
            jnp.asarray(wts > 0),
        )
        red = _bias_schur(sys6, jnp.asarray(res), jnp.asarray(jac), jnp.asarray(wts))
        mu = res.mean()
        expect = ((res - mu) ** 2).mean()
        np.testing.assert_allclose(float(red.error[0]), expect, rtol=1e-4)
        assert float(red.error[0]) < float(sys6.error[0])


class TestBiasTracking:
    @pytest.mark.parametrize("bias_dn", [10.0, -14.0])
    def test_recovers_motion_under_exposure_bias(self, bias_dn):
        """A constant intensity offset on the target image biases the
        plain photometric solve; illumination='bias' removes it."""
        gray, depth, k, render_view = _scene()
        xi = np.array([0.01, -0.006, 0.008, 0.004, -0.003, 0.002], np.float32)
        t = np.asarray(se3.exp(jnp.asarray(xi)), np.float64)
        g2, d2 = render_view(gray, depth, k, t)
        g2 = np.clip(g2 + bias_dn, 0.0, 255.0).astype(np.float32)

        camera = CameraModel(intrinsics=jnp.asarray(k), depth_scale=1.0)
        errs = {}
        for illum in (None, "bias"):
            cfg = RobustDVOConfig(
                levels=3, max_iterations=30, use_weighter=False,
                approximate_image2_gradient=True, lm_lambda0=1e-4,
                tolerance=1e-7, illumination=illum,
            )
            out = track_pair(_fd(gray, depth), _fd(g2, d2), camera, cfg)
            est = np.asarray(out.transform, np.float64)
            errs[illum] = np.linalg.norm(est[:3, 3] - t[:3, 3])
            assert bool(out.success)
        # Compensation recovers the true motion much more accurately.
        assert errs["bias"] < 0.5 * errs[None]
        assert errs["bias"] < 4e-3  # a few mm on a ~15 mm motion

    def test_no_bias_is_noop_quality(self):
        """On an exposure-clean pair the bias mode must not degrade."""
        gray, depth, k, render_view = _scene(seed=3)
        xi = np.array([0.008, 0.005, -0.006, -0.003, 0.002, 0.004], np.float32)
        t = np.asarray(se3.exp(jnp.asarray(xi)), np.float64)
        g2, d2 = render_view(gray, depth, k, t)
        camera = CameraModel(intrinsics=jnp.asarray(k), depth_scale=1.0)
        errs = {}
        for illum in (None, "bias"):
            cfg = RobustDVOConfig(
                levels=3, max_iterations=30, use_weighter=False,
                approximate_image2_gradient=True, lm_lambda0=1e-4,
                tolerance=1e-7, illumination=illum,
            )
            out = track_pair(_fd(gray, depth), _fd(g2, d2), camera, cfg)
            est = np.asarray(out.transform, np.float64)
            errs[illum] = np.linalg.norm(est[:3, 3] - t[:3, 3])
        assert errs["bias"] < errs[None] + 5e-4
