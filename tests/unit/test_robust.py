"""Gauss-Newton solver tests: synthetic known-motion recovery + real frames.

Synthetic tests are the jit-native version of the reference's solver
invariance tests (test_cpu_robust_dense_visual_odometry.py:20-73); the
real-pair test implements the end-to-end convergence check the reference
left commented out (:75-93).
"""

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from dense_visual_odometry_tpu.camera import CameraModel
from dense_visual_odometry_tpu.config import RobustDVOConfig
from dense_visual_odometry_tpu.models.robust import (
    FrameData,
    make_tracker,
    preprocess_frame,
    step_pose,
    track_pair,
)
from dense_visual_odometry_tpu.ops import pyramid as pyr_ops
from dense_visual_odometry_tpu.utils.lie import se3

H, W = 120, 160
K = np.array(
    [[120.0, 0.0, (W - 1) / 2], [0.0, 120.0, (H - 1) / 2], [0.0, 0.0, 1.0]],
    dtype=np.float32,
)
Z0 = 2.0


def _texture(u, v):
    """Smooth, feature-rich intensity function of pixel coordinates."""
    return (
        120.0
        + 50.0 * np.sin(2 * np.pi * u / 31.0)
        + 40.0 * np.cos(2 * np.pi * v / 23.0)
        + 25.0 * np.sin(2 * np.pi * (u + 2 * v) / 57.0)
        + 15.0 * np.cos(2 * np.pi * (3 * u - v) / 83.0)
    )


def _shifted_pair(tx):
    """Frame pair related by pure x-translation at constant depth Z0.

    transform maps prev->curr camera points, so the pixel shift is
    s = fx * tx / Z0 and I2(u) = I1(u - s).
    """
    v, u = np.meshgrid(np.arange(H, dtype=np.float64), np.arange(W, dtype=np.float64), indexing="ij")
    s = K[0, 0] * tx / Z0
    gray1 = _texture(u, v).astype(np.float32)
    gray2 = _texture(u - s, v).astype(np.float32)
    depth = np.full((H, W), Z0, dtype=np.float32)
    return gray1, gray2, depth


def _frame_data(gray, depth_m, levels):
    return FrameData(
        gray=pyr_ops.build_pyramid(jnp.asarray(gray), levels),
        depth_m=pyr_ops.build_pyramid(jnp.asarray(depth_m), levels),
    )


class TestSyntheticConvergence:
    def test_identity_pair_stays_identity(self):
        cfg = RobustDVOConfig(levels=3, max_iterations=30, tolerance=1e-7)
        gray1, _, depth = _shifted_pair(0.0)
        fd = _frame_data(gray1, depth, cfg.levels)
        camera = CameraModel.create(K, 1.0)
        result = track_pair(fd, fd, camera, cfg)
        assert bool(result.success)
        xi = np.asarray(se3.log(result.transform))
        np.testing.assert_allclose(xi, 0.0, atol=1e-4)

    @pytest.mark.parametrize("tx", [0.01, -0.02])
    def test_recovers_translation(self, tx):
        cfg = RobustDVOConfig(levels=3, max_iterations=60, tolerance=1e-9)
        gray1, gray2, depth = _shifted_pair(tx)
        prev = _frame_data(gray1, depth, cfg.levels)
        curr = _frame_data(gray2, depth, cfg.levels)
        camera = CameraModel.create(K, 1.0)
        result = track_pair(prev, curr, camera, cfg)
        assert bool(result.success)
        est = np.asarray(result.transform)
        assert est[0, 3] == pytest.approx(tx, abs=2e-3)
        np.testing.assert_allclose(est[1:3, 3], 0.0, atol=2e-3)
        # Rotation close to identity.
        np.testing.assert_allclose(est[:3, :3], np.eye(3), atol=2e-3)

    def test_recovers_small_rotation(self):
        """In-plane z-rotation of the camera about the optical axis."""
        angle = 0.01  # rad
        cfg = RobustDVOConfig(levels=3, max_iterations=60, tolerance=1e-9)
        v, u = np.meshgrid(np.arange(H, dtype=np.float64), np.arange(W, dtype=np.float64), indexing="ij")
        gray1 = _texture(u, v).astype(np.float32)
        # Camera rotates by +angle about z: pixel p in prev maps to
        # R(p - c) + c in curr (constant depth, principal-point centered).
        c = np.array([K[0, 2], K[1, 2]])
        ca, sa = np.cos(angle), np.sin(angle)
        # I2(p') = I1(p) with p' = Rot(p); equivalently I2(q) = I1(Rot^-1 q).
        du, dv = u - c[0], v - c[1]
        uq = ca * du + sa * dv + c[0]
        vq = -sa * du + ca * dv + c[1]
        gray2 = _texture(uq, vq).astype(np.float32)
        depth = np.full((H, W), Z0, dtype=np.float32)

        camera = CameraModel.create(K, 1.0)
        result = track_pair(
            _frame_data(gray1, depth, cfg.levels),
            _frame_data(gray2, depth, cfg.levels),
            camera,
            cfg,
        )
        assert bool(result.success)
        xi = np.asarray(se3.log(result.transform))
        assert xi[5] == pytest.approx(angle, abs=2e-3)  # omega_z
        np.testing.assert_allclose(xi[3:5], 0.0, atol=2e-3)

    def test_weighter_and_prior_still_converge(self):
        cfg = RobustDVOConfig(
            levels=3, max_iterations=60, tolerance=1e-9,
            use_weighter=True, sigma=10.0, max_increased_steps_allowed=2,
        )
        tx = 0.015
        gray1, gray2, depth = _shifted_pair(tx)
        camera = CameraModel.create(K, 1.0)
        result = track_pair(
            _frame_data(gray1, depth, cfg.levels),
            _frame_data(gray2, depth, cfg.levels),
            camera,
            cfg,
            last_transform=jnp.eye(4),
        )
        assert bool(result.success)
        assert np.asarray(result.transform)[0, 3] == pytest.approx(tx, abs=3e-3)

    def test_approximate_gradient_mode(self):
        cfg = RobustDVOConfig(
            levels=3, max_iterations=80, tolerance=1e-9,
            approximate_image2_gradient=True,
        )
        tx = 0.01
        gray1, gray2, depth = _shifted_pair(tx)
        camera = CameraModel.create(K, 1.0)
        result = track_pair(
            _frame_data(gray1, depth, cfg.levels),
            _frame_data(gray2, depth, cfg.levels),
            camera,
            cfg,
        )
        assert bool(result.success)
        assert np.asarray(result.transform)[0, 3] == pytest.approx(tx, abs=3e-3)

    @pytest.mark.parametrize("tx", [0.01, -0.02])
    def test_lm_mode_recovers_translation(self, tx):
        cfg = RobustDVOConfig(
            levels=3, max_iterations=60, tolerance=1e-9, lm_lambda0=1e-4,
        )
        gray1, gray2, depth = _shifted_pair(tx)
        camera = CameraModel.create(K, 1.0)
        result = track_pair(
            _frame_data(gray1, depth, cfg.levels),
            _frame_data(gray2, depth, cfg.levels),
            camera,
            cfg,
        )
        assert bool(result.success)
        est = np.asarray(result.transform)
        assert est[0, 3] == pytest.approx(tx, abs=2e-3)
        np.testing.assert_allclose(est[:3, :3], np.eye(3), atol=2e-3)

    def test_lm_uses_fewer_iterations_than_gn(self):
        """The predictive stop must save the trailing confirm evaluation."""
        gn = RobustDVOConfig(
            levels=3, max_iterations=60, relative_tolerance=1e-2,
            use_weighter=True,
        )
        lm = RobustDVOConfig(
            levels=3, max_iterations=60, relative_tolerance=1e-2,
            use_weighter=True, lm_lambda0=1e-4,
        )
        gray1, gray2, depth = _shifted_pair(0.015)
        camera = CameraModel.create(K, 1.0)
        prev = _frame_data(gray1, depth, 3)
        curr = _frame_data(gray2, depth, 3)
        r_gn = track_pair(prev, curr, camera, gn)
        r_lm = track_pair(prev, curr, camera, lm)
        assert bool(r_lm.success)
        it_gn = int(np.asarray(r_gn.diagnostics.iterations).sum())
        it_lm = int(np.asarray(r_lm.diagnostics.iterations).sum())
        assert it_lm < it_gn
        # Same answer to solver tolerance.
        np.testing.assert_allclose(
            np.asarray(r_lm.transform), np.asarray(r_gn.transform), atol=5e-4
        )

    def test_lm_with_prior_and_weighter(self):
        cfg = RobustDVOConfig(
            levels=3, max_iterations=60, lm_lambda0=1e-3,
            use_weighter=True, sigma=10.0,
        )
        tx = 0.015
        gray1, gray2, depth = _shifted_pair(tx)
        camera = CameraModel.create(K, 1.0)
        result = track_pair(
            _frame_data(gray1, depth, cfg.levels),
            _frame_data(gray2, depth, cfg.levels),
            camera,
            cfg,
            last_transform=jnp.eye(4),
        )
        assert bool(result.success)
        assert np.asarray(result.transform)[0, 3] == pytest.approx(tx, abs=3e-3)

    def test_lm_config_validation(self):
        with pytest.raises(ValueError, match="lm_lambda0"):
            RobustDVOConfig(lm_lambda0=-1.0)
        with pytest.raises(ValueError, match="lm_up"):
            RobustDVOConfig(lm_up=0.5)

    def test_hessian_evaluated_at_returned_estimate(self):
        """The Laplace information (BA edge weight) must be J^T W J at the
        RETURNED transform — including when the loop exits via the
        iteration cap right after an accepted increment (the case where
        the in-loop hessian lags the estimate by one GN step)."""
        from dense_visual_odometry_tpu.ops import gradients as grad_ops
        from dense_visual_odometry_tpu.ops.residuals import (
            normal_equations,
            warp_residuals,
        )

        # Tiny cap + impossible tolerance => guaranteed cap exit mid-descent.
        cfg = RobustDVOConfig(levels=1, max_iterations=3, tolerance=1e-12)
        gray1, gray2, depth = _shifted_pair(0.01)
        camera = CameraModel.create(K, 1.0)
        result = track_pair(
            _frame_data(gray1, depth, cfg.levels),
            _frame_data(gray2, depth, cfg.levels),
            camera,
            cfg,
        )
        gx, gy = grad_ops.sobel(jnp.asarray(gray2))
        res, jac, valid = warp_residuals(
            jnp.asarray(gray1), jnp.asarray(depth), jnp.asarray(gray2),
            jnp.asarray(K), result.transform, gx / 8.0, gy / 8.0,
        )
        fresh = normal_equations(res, jac, valid.astype(jnp.float32), valid)
        np.testing.assert_allclose(
            np.asarray(result.hessian), np.asarray(fresh.hessian),
            rtol=1e-5, atol=1e-3,
        )

    def test_step_pose_composition(self):
        cfg = RobustDVOConfig(levels=2, max_iterations=20)
        gray1, gray2, depth = _shifted_pair(0.01)
        camera = CameraModel.create(K, 1.0)
        result = track_pair(
            _frame_data(gray1, depth, cfg.levels),
            _frame_data(gray2, depth, cfg.levels),
            camera,
            cfg,
        )
        pose = step_pose(jnp.eye(4), result)
        # World pose moves by transform^-1.
        np.testing.assert_allclose(
            np.asarray(pose), np.asarray(se3.inverse(result.transform)), atol=1e-6
        )

    def test_bench_fast_config_converges(self):
        """The shipped TPU bench configuration (packed sampling +
        shift-stack + strides + approx Jacobian + subsampled unrollable
        weighter) must track the synthetic pair like the default config."""
        from dense_visual_odometry_tpu.config import TWeighterConfig

        cfg = RobustDVOConfig(
            levels=3, max_iterations=12, use_weighter=True,
            packed_sampling=True, grid_strides=(2, 1, 1),
            weighter=TWeighterConfig(scale_subsample=4),
            shift_stack_radius=4, shift_stack_levels=(0, 1),
            approximate_image2_gradient=True,
            relative_tolerance=1e-2, lm_lambda0=1e-4,
        )
        tx = 0.01
        gray1, gray2, depth = _shifted_pair(tx)
        camera = CameraModel.create(K, 1.0)
        result = track_pair(
            _frame_data(gray1, depth, cfg.levels),
            _frame_data(gray2, depth, cfg.levels),
            camera,
            cfg,
        )
        assert bool(result.success)
        assert np.asarray(result.transform)[0, 3] == pytest.approx(tx, abs=3e-3)

    @pytest.mark.parametrize("fused", [False, True])
    def test_esm_gradients_converge(self, fused):
        """ESM-averaged gradients (both the gather path and the fused
        frozen-window path) must track the synthetic pair at the same
        accuracy as the plain inverse-compositional Jacobian.

        ESM is a measured NEGATIVE on the bundled set (see
        benchmarks/RESULTS.md) and ships off; this pins the opt-in paths
        as correct so the knob stays usable for configs that want it.
        """
        from dense_visual_odometry_tpu.config import TWeighterConfig

        extra = (
            dict(
                shift_stack_radius=3, shift_stack_levels=(0, 1),
                use_pallas_stack=True, use_fused_iteration=True,
                freeze_shift_window=True,
            )
            if fused
            else {}
        )
        cfg = RobustDVOConfig(
            levels=3, max_iterations=12, use_weighter=True,
            packed_sampling=True, grid_strides=(2, 1, 1),
            weighter=TWeighterConfig(scale_subsample=4),
            approximate_image2_gradient=True,
            relative_tolerance=1e-2, lm_lambda0=1e-4,
            use_esm_gradients=True, esm_levels=(0, 1),
            **extra,
        )
        tx = 0.01
        gray1, gray2, depth = _shifted_pair(tx)
        camera = CameraModel.create(K, 1.0)
        result = track_pair(
            _frame_data(gray1, depth, cfg.levels),
            _frame_data(gray2, depth, cfg.levels),
            camera,
            cfg,
        )
        assert bool(result.success)
        assert np.asarray(result.transform)[0, 3] == pytest.approx(tx, abs=3e-3)

    def test_esm_config_validation(self):
        with pytest.raises(ValueError):
            RobustDVOConfig(use_esm_gradients=True)  # needs approx gradient
        with pytest.raises(ValueError):
            RobustDVOConfig(
                use_esm_gradients=True, approximate_image2_gradient=True,
                shift_stack_radius=3, use_fused_iteration=True,
                freeze_shift_window=False,
            )

    def _fused_lm_cfg(self, **overrides):
        from dense_visual_odometry_tpu.config import TWeighterConfig

        base = dict(
            levels=3, max_iterations=12, use_weighter=True,
            packed_sampling=True, grid_strides=(2, 1, 1),
            weighter=TWeighterConfig(scale_subsample=4),
            shift_stack_radius=3, shift_stack_levels=(0, 1),
            approximate_image2_gradient=True,
            relative_tolerance=1e-2, lm_lambda0=1e-4,
            use_pallas_stack=True, use_fused_iteration=True,
            freeze_shift_window=True,
        )
        base.update(overrides)
        return RobustDVOConfig(**base)

    def test_level_kernel_matches_lm_loop_translation(self):
        """The level-fused solver kernel (whole LM loop on-chip,
        ops/pallas/level_solver.py) must recover the same transform as
        the XLA LM loop it replaces (interpret mode on CPU)."""
        tx = 0.01
        gray1, gray2, depth = _shifted_pair(tx)
        camera = CameraModel.create(K, 1.0)
        prev = _frame_data(gray1, depth, 3)
        curr = _frame_data(gray2, depth, 3)
        results = {}
        for lk in (False, True):
            cfg = self._fused_lm_cfg(use_level_kernel=lk)
            r = track_pair(prev, curr, camera, cfg)
            assert bool(r.success)
            results[lk] = np.asarray(r.transform)
        # Same solve up to Cholesky-vs-LU rounding in the 6x6 system.
        np.testing.assert_allclose(
            results[True], results[False], atol=1e-5
        )
        assert results[True][0, 3] == pytest.approx(tx, abs=3e-3)

    def test_level_kernel_matches_lm_loop_rotation(self):
        angle = 0.01
        v, u = np.meshgrid(
            np.arange(H, dtype=np.float64),
            np.arange(W, dtype=np.float64), indexing="ij",
        )
        gray1 = _texture(u, v).astype(np.float32)
        c = np.array([K[0, 2], K[1, 2]])
        ca, sa = np.cos(angle), np.sin(angle)
        du, dv = u - c[0], v - c[1]
        gray2 = _texture(
            ca * du + sa * dv + c[0], -sa * du + ca * dv + c[1]
        ).astype(np.float32)
        depth = np.full((H, W), Z0, dtype=np.float32)
        camera = CameraModel.create(K, 1.0)
        prev = _frame_data(gray1, depth, 3)
        curr = _frame_data(gray2, depth, 3)
        results = {}
        for lk in (False, True):
            cfg = self._fused_lm_cfg(
                use_level_kernel=lk, max_iterations=30
            )
            r = track_pair(prev, curr, camera, cfg)
            assert bool(r.success)
            results[lk] = np.asarray(se3.log(r.transform))
        np.testing.assert_allclose(results[True], results[False], atol=1e-5)
        assert results[True][5] == pytest.approx(angle, abs=2e-3)

    def test_level_kernel_matches_lm_loop_with_motion_prior(self):
        """Motion-prior configs now ride the level kernel too: the
        in-kernel prior terms (H += (1/sigma) I, b += (1/sigma)
        log(anchor) via the Newton-arcsin se3.log) must reproduce the
        XLA loop, with the anchor re-anchored per accepted step."""
        tx = 0.01
        gray1, gray2, depth = _shifted_pair(tx)
        camera = CameraModel.create(K, 1.0)
        prev = _frame_data(gray1, depth, 3)
        curr = _frame_data(gray2, depth, 3)
        # Non-trivial anchor: a constant-velocity prior near (but not at)
        # the true motion, so log(anchor) != 0 drives b.
        anchor = np.eye(4, dtype=np.float32)
        anchor[0, 3] = 0.8 * tx
        anchor[1, 3] = 0.002
        for sigma, ref_energy in ((2e-7, False), (1e-4, True)):
            results = {}
            for lk in (False, True):
                cfg = self._fused_lm_cfg(
                    use_level_kernel=lk, sigma=sigma,
                    reference_prior_energy=ref_energy,
                )
                r = track_pair(
                    prev, curr, camera, cfg,
                    last_transform=jnp.asarray(anchor),
                )
                assert bool(r.success)
                results[lk] = np.asarray(r.transform)
            np.testing.assert_allclose(
                results[True], results[False], atol=1e-5
            )
        # Liveness: a strongly binding prior must move the kernel's
        # answer materially vs no prior.  (Note the magnitude is NOT
        # anchor-distance: the reference re-anchors ``old`` at every
        # LEVEL, so a binding prior pushes each level's increment toward
        # the full anchor — the effects compound across levels.  The
        # oracle tests pin that semantic against the actual reference.)
        cfg_tight = self._fused_lm_cfg(use_level_kernel=True, sigma=1e-9)
        cfg_off = self._fused_lm_cfg(use_level_kernel=True)
        r_tight = track_pair(
            prev, curr, camera, cfg_tight, last_transform=jnp.asarray(anchor)
        )
        r_off = track_pair(prev, curr, camera, cfg_off)
        assert (
            abs(float(r_tight.transform[0, 3]) - float(r_off.transform[0, 3]))
            > 1e-3
        )

    def test_level_kernel_matches_lm_loop_with_depth_residuals(self):
        """Depth-residual configs ride the level kernel (round-4): the
        in-kernel geometric term — a second frozen window over the
        CURRENT depth map tap-sampled alongside gray, the per-pixel
        Jacobian grad Z . J_w - [0,0,1,y',-x',0] rebuilt from the
        transformed points each iteration, Huber weights — must
        reproduce the XLA loop (which samples depth with a full
        bilinear; identical while displacements stay in the frozen
        ball, as at these motions)."""
        from dense_visual_odometry_tpu.io.synthetic import render_view

        rng = np.random.default_rng(3)
        v, u = np.meshgrid(
            np.arange(H, dtype=np.float64),
            np.arange(W, dtype=np.float64), indexing="ij",
        )
        gray1 = _texture(u, v).astype(np.float32)
        # Bumpy depth: the geometric term is informative (a flat wall
        # under in-plane translation has r_z == 0 throughout and the
        # test would pass vacuously).
        depth1 = (
            Z0
            + 0.25 * np.sin(2 * np.pi * u / 40.0)
            * np.cos(2 * np.pi * v / 32.0)
        ).astype(np.float32)
        xi = np.array([0.004, -0.002, 0.006, 0.0, 0.0, 0.004], np.float64)
        t_true = np.asarray(se3.exp(jnp.asarray(xi, jnp.float32)))
        gray2, depth2 = render_view(gray1, depth1, K, t_true)
        del rng
        prev = _frame_data(gray1, depth1, 3)
        curr = FrameData(
            gray=pyr_ops.build_pyramid(jnp.asarray(gray2), 3),
            depth_m=pyr_ops.build_pyramid(jnp.asarray(depth2), 3),
        )
        camera = CameraModel.create(K, 1.0)
        results = {}
        for lk in (False, True):
            cfg = self._fused_lm_cfg(
                use_level_kernel=lk, use_depth_residuals=True,
                max_iterations=20,
            )
            r = track_pair(prev, curr, camera, cfg)
            assert bool(r.success)
            results[lk] = np.asarray(r.transform)
        np.testing.assert_allclose(results[True], results[False], atol=1e-5)
        got = np.asarray(se3.log(jnp.asarray(results[True])))
        np.testing.assert_allclose(got, xi, atol=2e-3)
        # Liveness: the depth term must actually bind (a wrong-weight
        # no-op kernel would still pass the parity check above).
        cfg_heavy = self._fused_lm_cfg(
            use_level_kernel=True, use_depth_residuals=True,
            max_iterations=20, depth_weight=1e7, depth_huber_delta=1e4,
        )
        cfg_off = self._fused_lm_cfg(
            use_level_kernel=True, max_iterations=20
        )
        r_heavy = track_pair(prev, curr, camera, cfg_heavy)
        r_off = track_pair(prev, curr, camera, cfg_off)
        diff = np.abs(
            np.asarray(r_heavy.transform) - np.asarray(r_off.transform)
        ).max()
        assert diff > 1e-6

    def test_level_kernel_matches_lm_loop_affine_illumination(self):
        """"affine" illumination rides the level kernel (round-4 VERDICT
        task 6): the in-kernel gain+bias pre-fit + rank-2 Schur must
        reproduce the XLA loop's _affine_schur path, and must recover
        the geometry under a gain/bias perturbation that defeats both
        the plain and bias-only models."""
        from dense_visual_odometry_tpu.io.synthetic import render_view

        v, u = np.meshgrid(
            np.arange(H, dtype=np.float64),
            np.arange(W, dtype=np.float64), indexing="ij",
        )
        gray1 = _texture(u, v).astype(np.float32)
        depth1 = np.full((H, W), Z0, dtype=np.float32)
        xi = np.array([0.004, -0.002, 0.005, 0.0, 0.0, 0.003], np.float64)
        t_true = np.asarray(se3.exp(jnp.asarray(xi, jnp.float32)))
        gray2, depth2 = render_view(gray1, depth1, K, t_true)
        # Gain + bias exposure change: 12% gain, +9 DN bias.
        gray2 = np.clip(1.12 * gray2 + 9.0, 0.0, 255.0).astype(np.float32)
        prev = _frame_data(gray1, depth1, 3)
        curr = FrameData(
            gray=pyr_ops.build_pyramid(jnp.asarray(gray2), 3),
            depth_m=pyr_ops.build_pyramid(jnp.asarray(depth2), 3),
        )
        camera = CameraModel.create(K, 1.0)
        results = {}
        for lk in (False, True):
            cfg = self._fused_lm_cfg(
                use_level_kernel=lk, illumination="affine",
                max_iterations=20,
            )
            r = track_pair(prev, curr, camera, cfg)
            assert bool(r.success), f"level_kernel={lk}"
            results[lk] = np.asarray(r.transform)
        # 2e-5 (vs the other parity tests' 1e-5): the rank-2 Schur's
        # f32 2x2-determinant division amplifies summation-order noise
        # between the tap-sweep and bilinear sampling paths slightly.
        np.testing.assert_allclose(results[True], results[False], atol=2e-5)
        got = np.asarray(se3.log(jnp.asarray(results[True])))
        np.testing.assert_allclose(got, xi, atol=2e-3)
        # Liveness: under a strong pure-gain change the affine model
        # must beat bias-only (which can only absorb the offset).
        gray2g = np.clip(1.35 * gray2, 0.0, 255.0).astype(np.float32)
        curr_g = FrameData(
            gray=pyr_ops.build_pyramid(jnp.asarray(gray2g), 3),
            depth_m=pyr_ops.build_pyramid(jnp.asarray(depth2), 3),
        )
        err = {}
        for mode in ("bias", "affine"):
            cfg = self._fused_lm_cfg(
                use_level_kernel=True, illumination=mode,
                max_iterations=20,
            )
            r = track_pair(prev, curr_g, camera, cfg)
            got_m = np.asarray(se3.log(jnp.asarray(r.transform)))
            err[mode] = float(np.linalg.norm(got_m - xi))
        assert err["affine"] < err["bias"], err

    def test_se3_log_scalars_matches_library(self):
        """The kernel's Newton-arcsin se3.log is f32-exact against
        utils.lie.se3.log across the documented domain."""
        from dense_visual_odometry_tpu.ops.pallas.level_solver import (
            _se3_log_scalars,
        )

        rng = np.random.default_rng(0)
        for mag in (1e-8, 1e-5, 1e-3, 0.05, 0.3, 1.0, 2.0):
            for _ in range(5):
                xi = rng.standard_normal(6)
                xi[3:] *= mag / max(np.linalg.norm(xi[3:]), 1e-12)
                xi[:3] *= 0.3
                t_mat = np.asarray(se3.exp(jnp.asarray(xi, jnp.float32)))
                m = tuple(
                    jnp.float32(t_mat[r, c])
                    for r in range(3)
                    for c in range(4)
                )
                got = np.array([float(v) for v in _se3_log_scalars(m)])
                want = np.asarray(se3.log(jnp.asarray(t_mat)))
                np.testing.assert_allclose(got, want, atol=1e-6)

    def test_level_kernel_with_fallback_and_zero_depth(self):
        """The fallback lax.cond dispatch still works around the level
        kernel, and an all-invalid-depth pair stays finite (the kernel
        encodes invalid depth as NaN points; nothing may escape).

        Tracked under jit (make_tracker) like all product callers.
        The persistent-cache EXECUTABLE SERIALIZER segfaults on this
        program mid-suite (two giant cond branches: the full XLA LM loop
        and the interpret-mode level kernel; crash frame
        ``compilation_cache.put_executable_and_time``) — suppress the
        cache write for this test only.
        """
        import jax

        min_secs = jax.config.jax_persistent_cache_min_compile_time_secs
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1e9
        )
        try:
            tx = 0.01
            gray1, gray2, depth = _shifted_pair(tx)
            cfg = self._fused_lm_cfg(
                use_level_kernel=True, shift_stack_fallback=True,
                robust_init_selection=True,
            )
            tracker = make_tracker(cfg)
            r = tracker(
                _frame_data(gray1, depth, 3), _frame_data(gray2, depth, 3),
                K,
            )
            assert bool(r.success)
            assert np.asarray(r.transform)[0, 3] == pytest.approx(
                tx, abs=3e-3
            )
            # all-zero depth: must return finite identity-ish, not NaN
            r0 = tracker(
                _frame_data(gray1, np.zeros_like(depth), 3),
                _frame_data(gray2, np.zeros_like(depth), 3),
                K,
            )
            t0 = np.asarray(r0.transform)
            assert np.all(np.isfinite(t0))
            assert not bool(r0.success)
        finally:
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", min_secs
            )

    def test_init_scale_ladder_validation(self):
        with pytest.raises(ValueError, match="robust_init_selection"):
            RobustDVOConfig(init_scale_ladder=(0.5,))

    def test_init_scale_ladder_01_matches_pair_selector(self):
        """A {0, 1} ladder must reproduce the two-candidate selector."""
        import dataclasses

        gray1, gray2, depth = _shifted_pair(0.015)
        prev = _frame_data(gray1, depth, 3)
        curr = _frame_data(gray2, depth, 3)
        camera = CameraModel.create(K, 1.0)
        cfg_a = RobustDVOConfig(
            levels=3, max_iterations=10, robust_init_selection=True
        )
        cfg_b = dataclasses.replace(cfg_a, init_scale_ladder=(0.0, 1.0))
        guess = np.eye(4, dtype=np.float32)
        guess[0, 3] = 0.03  # overshoots the true 0.015 m motion
        ra = track_pair(prev, curr, camera, cfg_a, init_guess=jnp.asarray(guess))
        rb = track_pair(prev, curr, camera, cfg_b, init_guess=jnp.asarray(guess))
        np.testing.assert_allclose(
            np.asarray(ra.transform), np.asarray(rb.transform), atol=1e-6
        )

    def test_init_scale_ladder_picks_intermediate_scale(self):
        """Truth = half the guess: the a=0.5 rung starts AT the truth.

        With one level and one iteration the chosen hypothesis dominates
        the result, so the ladder run must land measurably closer to the
        true translation than the plain {identity, guess} selector (both
        of whose candidates are a full |tx| away).
        """
        import dataclasses

        tx = 0.02
        gray1, gray2, depth = _shifted_pair(tx)
        prev = _frame_data(gray1, depth, 1)
        curr = _frame_data(gray2, depth, 1)
        camera = CameraModel.create(K, 1.0)
        guess = np.eye(4, dtype=np.float32)
        guess[0, 3] = 2.0 * tx
        base = RobustDVOConfig(
            levels=1, max_iterations=1, robust_init_selection=True
        )
        ladder = dataclasses.replace(
            base, init_scale_ladder=(0.5, 1.5)
        )
        r_pair = track_pair(
            prev, curr, camera, base, init_guess=jnp.asarray(guess)
        )
        r_lad = track_pair(
            prev, curr, camera, ladder, init_guess=jnp.asarray(guess)
        )
        err_pair = abs(float(np.asarray(r_pair.transform)[0, 3]) - tx)
        err_lad = abs(float(np.asarray(r_lad.transform)[0, 3]) - tx)
        assert err_lad < err_pair
        assert err_lad < 2e-3

    def test_init_scale_ladder_batched_per_element(self):
        """Per-batch-element argmin: each element gets its own rung."""
        import dataclasses

        from dense_visual_odometry_tpu.parallel import stack_frame_data

        tx = 0.02
        g1a, g2a, depth = _shifted_pair(tx)        # truth = 0.5 * guess
        g1b, g2b, _ = _shifted_pair(2.0 * tx)      # truth = guess
        prev = stack_frame_data(
            [_frame_data(g1a, depth, 1), _frame_data(g1b, depth, 1)]
        )
        curr = stack_frame_data(
            [_frame_data(g2a, depth, 1), _frame_data(g2b, depth, 1)]
        )
        camera = CameraModel.create(K, 1.0)
        guess = np.eye(4, dtype=np.float32)
        guess[0, 3] = 2.0 * tx
        cfg = RobustDVOConfig(
            levels=1, max_iterations=1, robust_init_selection=True,
            init_scale_ladder=(0.5,),
        )
        r = track_pair(prev, curr, camera, cfg, init_guess=jnp.asarray(guess))
        est = np.asarray(r.transform)
        assert est[0, 0, 3] == pytest.approx(tx, abs=2e-3)
        assert est[1, 0, 3] == pytest.approx(2.0 * tx, abs=2e-3)

    def test_tracker_jit_wrapper(self):
        cfg = RobustDVOConfig(levels=2, max_iterations=20)
        tracker = make_tracker(cfg)
        gray1, gray2, depth = _shifted_pair(0.01)
        prev = _frame_data(gray1, depth, cfg.levels)
        curr = _frame_data(gray2, depth, cfg.levels)
        r1 = tracker(prev, curr, K)
        r2 = tracker(prev, curr, K)  # cached executable
        np.testing.assert_array_equal(np.asarray(r1.transform), np.asarray(r2.transform))


class TestRealFrames:
    @pytest.fixture(scope="class")
    def pair(self, test_data_dir: Path):
        import cv2

        gt = json.loads((test_data_dir / "ground_truth.json").read_text())
        camera = CameraModel.from_yaml(test_data_dir / "camera_intrinsics.yaml")
        frames = []
        for key in ("1", "2"):
            rgb = cv2.imread(str(test_data_dir / gt[key]["rgb"]))
            gray = cv2.cvtColor(rgb, cv2.COLOR_BGR2GRAY).astype(np.float32)
            depth = cv2.imread(
                str(test_data_dir / gt[key]["depth"]), cv2.IMREAD_ANYDEPTH
            ).astype(np.float32)
            pose = np.array(gt[key]["transformation"], dtype=np.float64)
            frames.append((gray, depth, pose))
        return camera, frames

    def test_ground_truth_transform_gives_small_residuals(self, pair):
        """Physics invariant: residual mean ~ 0 / small std when warping
        with the ground-truth transform (reference test :46-73)."""
        from dense_visual_odometry_tpu.ops import gradients as grad_ops
        from dense_visual_odometry_tpu.ops.residuals import warp_residuals

        camera, frames = pair
        (g1, d1, p1), (g2, d2, p2) = frames
        # transform maps cam1 points to cam2: T = p2^-1 @ p1.
        t_gt = jnp.asarray(np.linalg.inv(p2) @ p1, dtype=jnp.float32)
        depth_m = jnp.asarray(d1) * camera.depth_scale
        gx, gy = grad_ops.sobel(jnp.asarray(g2))
        res, _, valid = warp_residuals(
            jnp.asarray(g1), depth_m, jnp.asarray(g2),
            camera.intrinsics, t_gt, gx, gy,
        )
        r = np.asarray(res)[np.asarray(valid)]
        assert abs(r.mean()) < 10.0
        assert r.std() < 40.0

    def test_track_real_pair_beats_identity(self, pair):
        """End-to-end: estimated transform closer to GT than identity is."""
        camera, frames = pair
        (g1, d1, p1), (g2, d2, p2) = frames
        cfg = RobustDVOConfig(levels=4, max_iterations=100, use_weighter=True)
        prev = preprocess_frame(jnp.asarray(g1), jnp.asarray(d1), camera, levels=cfg.levels)
        curr = preprocess_frame(jnp.asarray(g2), jnp.asarray(d2), camera, levels=cfg.levels)
        result = track_pair(prev, curr, camera, cfg)
        assert bool(result.success)

        t_gt = np.linalg.inv(p2) @ p1
        est = np.asarray(result.transform, dtype=np.float64)
        err_est = np.linalg.norm(est[:3, 3] - t_gt[:3, 3])
        err_id = np.linalg.norm(t_gt[:3, 3])
        assert err_est < err_id * 0.5
        assert err_est < 0.05  # within 5 cm on a consecutive TUM-style pair


class TestPerLevelIterationCaps:
    def test_caps_apply_per_level(self):
        """max_iterations_per_level bounds each level's executed
        iterations independently (both the level kernel and the XLA
        loop read the per-level cap)."""
        from dense_visual_odometry_tpu.config import TWeighterConfig

        tx = 0.012
        gray1, gray2, depth = _shifted_pair(tx)
        camera = CameraModel.create(K, 1.0)
        prev = _frame_data(gray1, depth, 3)
        curr = _frame_data(gray2, depth, 3)
        base = dict(
            levels=3, use_weighter=True, packed_sampling=True,
            weighter=TWeighterConfig(scale_subsample=4),
            shift_stack_radius=3, shift_stack_levels=(0, 1),
            approximate_image2_gradient=True, lm_lambda0=1e-4,
            use_pallas_stack=True, use_fused_iteration=True,
            freeze_shift_window=True, use_level_kernel=True,
            tolerance=1e-9, max_iterations=25,
        )
        r_full = track_pair(prev, curr, camera, RobustDVOConfig(**base))
        iters_full = np.asarray(r_full.diagnostics.iterations)
        # Choose caps strictly below what the uncapped solve executed.
        caps = (int(iters_full[2]) - 1, 25, max(1, int(iters_full[0]) - 2))
        cfg = RobustDVOConfig(
            **base, max_iterations_per_level=(caps[0], caps[1], caps[2])
        )
        r = track_pair(prev, curr, camera, cfg)
        iters = np.asarray(r.diagnostics.iterations)
        # diagnostics stack coarse-to-fine: index 0 = coarsest = level 2.
        assert iters[0] <= caps[2], (iters, caps)
        assert iters[2] <= caps[0], (iters, caps)
        assert bool(r.success)
        assert np.asarray(r.transform)[0, 3] == pytest.approx(tx, abs=3e-3)
