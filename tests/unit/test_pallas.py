"""Pallas kernels vs their XLA twins (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dense_visual_odometry_tpu.ops.residuals import normal_equations


class TestStackWarpKernel:
    @pytest.mark.parametrize("stride", [1, 2])
    def test_matches_xla_twin(self, rng, stride):
        from dense_visual_odometry_tpu.ops.pallas.stackwarp import (
            shift_stack_sample_pallas,
        )
        from dense_visual_odometry_tpu.ops.shiftwarp import shift_stack_sample

        s = stride
        h, w = 40, 56
        hp, wp = (h + s - 1) // s, (w + s - 1) // s
        img = jnp.asarray(rng.uniform(0, 255, size=(2, h, w)).astype(np.float32))
        vv, uu = np.meshgrid(
            np.arange(hp, dtype=np.float32) * s,
            np.arange(wp, dtype=np.float32) * s,
            indexing="ij",
        )
        du = rng.uniform(-2.0, 2.0, size=(2, hp, wp)).astype(np.float32) + 5.0
        dv = rng.uniform(-2.0, 2.0, size=(2, hp, wp)).astype(np.float32) - 3.0
        u = jnp.asarray(uu[None] + du)
        v = jnp.asarray(vv[None] + dv)
        a, va = shift_stack_sample(img, u, v, radius=3, grid_stride=s)
        b, vb = shift_stack_sample_pallas(
            img, u, v, radius=3, grid_stride=s, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
        m = np.asarray(va)
        np.testing.assert_allclose(
            np.asarray(a)[m], np.asarray(b)[m], atol=1e-3
        )

    def test_solver_path_with_pallas_stack(self):
        """track_pair with use_pallas_stack (interpreted off-TPU) matches
        the XLA shift-stack path."""
        from dense_visual_odometry_tpu.camera import CameraModel
        from dense_visual_odometry_tpu.config import RobustDVOConfig
        from dense_visual_odometry_tpu.models.robust import FrameData, track_pair
        from dense_visual_odometry_tpu.ops import pyramid as pyr_ops

        h, w = 64, 96
        k = np.array(
            [[80.0, 0, (w - 1) / 2], [0, 80.0, (h - 1) / 2], [0, 0, 1]],
            np.float32,
        )
        v, u = np.meshgrid(
            np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64),
            indexing="ij",
        )
        tex = lambda uu: (  # noqa: E731
            120 + 50 * np.sin(2 * np.pi * uu / 23.0) + 40 * np.cos(2 * np.pi * v / 17.0)
        )
        tx = 0.01
        s = 80.0 * tx / 2.0
        g1 = tex(u).astype(np.float32)
        g2 = tex(u - s).astype(np.float32)
        d = np.full((h, w), 2.0, np.float32)

        def fd(g):
            return FrameData(
                gray=pyr_ops.build_pyramid(jnp.asarray(g), 2),
                depth_m=pyr_ops.build_pyramid(jnp.asarray(d), 2),
            )

        base = dict(
            levels=2, max_iterations=20, shift_stack_radius=4,
            shift_stack_levels=(0, 1), packed_sampling=True,
            approximate_image2_gradient=True,
        )
        cam = CameraModel.create(k, 1.0)
        r_xla = track_pair(fd(g1), fd(g2), cam, RobustDVOConfig(**base))
        r_pl = track_pair(
            fd(g1), fd(g2), cam, RobustDVOConfig(**base, use_pallas_stack=True)
        )
        assert bool(r_pl.success)
        np.testing.assert_allclose(
            np.asarray(r_pl.transform), np.asarray(r_xla.transform), atol=1e-4
        )
        assert float(r_pl.transform[0, 3]) == pytest.approx(tx, abs=2e-3)


class TestFusedIterationKernel:
    def _problem(self, rng, b=2, h=40, w=56, stride=1, illum_bias=False):
        """Random-but-realistic fused-iteration inputs plus the XLA
        reference computation with matched weighter semantics."""
        from dense_visual_odometry_tpu.config import TWeighterConfig
        from dense_visual_odometry_tpu.models.weighting import (
            t_distribution_weights_with_scale,
        )
        from dense_visual_odometry_tpu.ops.shiftwarp import shift_stack_sample

        s = stride
        hp, wp = (h + s - 1) // s, (w + s - 1) // s
        img = jnp.asarray(rng.uniform(0, 255, size=(b, h, w)).astype(np.float32))
        gray_prev = jnp.asarray(
            rng.uniform(0, 255, size=(b, hp, wp)).astype(np.float32)
        )
        vv, uu = np.meshgrid(
            np.arange(hp, dtype=np.float32) * s,
            np.arange(wp, dtype=np.float32) * s,
            indexing="ij",
        )
        u = jnp.asarray(uu[None] + rng.uniform(-2, 2, (b, hp, wp)).astype(np.float32) + 3.0)
        v = jnp.asarray(vv[None] + rng.uniform(-2, 2, (b, hp, wp)).astype(np.float32) - 2.0)
        valid_geom = jnp.asarray(rng.uniform(size=(b, hp, wp)) > 0.2)
        jac = jnp.asarray(rng.normal(size=(b, hp, wp, 6)).astype(np.float32))
        lam0 = jnp.full((b,), 1.0 / 25.0, jnp.float32)

        # XLA reference: stack sample -> residual -> unrolled full-res
        # t-scale -> weights -> normal equations.
        wcfg = TWeighterConfig(scale_subsample=1, unroll_iterations=3)
        warped, warp_ok = shift_stack_sample(
            img, u, v, radius=4, grid_stride=s, coord_mask=valid_geom
        )
        valid = valid_geom & warp_ok
        res = jnp.where(valid, warped - gray_prev, 0.0)
        if illum_bias:
            # Mirror models/robust.py's bias path: valid-mean centering
            # before the t-scale, weighted Schur elimination after.
            nv = jnp.maximum(jnp.sum(valid, (-2, -1)).astype(jnp.float32), 1.0)
            mu0 = jnp.sum(res, (-2, -1)) / nv
            res = jnp.where(valid, res - mu0[..., None, None], 0.0)
        weights, lam_ref = t_distribution_weights_with_scale(
            res * res, valid, wcfg, event_ndim=2, init_lambda=lam0
        )
        jac_m = jnp.where(valid[..., None], jac, 0.0)
        ref = normal_equations(res, jac_m, weights, valid)
        if illum_bias:
            from dense_visual_odometry_tpu.models.robust import _bias_schur

            ref = _bias_schur(ref, res, jac_m, weights)
        inputs = dict(
            gray_prev=gray_prev, gray_curr=img, u=u, v=v,
            valid_geom=valid_geom, jacobian=jac, lam0=lam0,
            radius=4, grid_stride=s, dof=wcfg.dof, unroll=3,
        )
        return inputs, ref, lam_ref

    @pytest.mark.parametrize("stride", [1, 2])
    def test_matches_xla_pipeline(self, rng, stride):
        from dense_visual_odometry_tpu.ops.pallas.fused_iter import (
            fused_shift_iteration,
        )

        inputs, ref, lam_ref = self._problem(rng, stride=stride)
        hess, rhs, err, count, lam = fused_shift_iteration(
            **inputs, interpret=True
        )
        np.testing.assert_allclose(np.asarray(count), np.asarray(ref.count))
        np.testing.assert_allclose(
            np.asarray(lam), np.asarray(lam_ref), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(err), np.asarray(ref.error), rtol=1e-4
        )
        scale = max(np.abs(np.asarray(ref.hessian)).max(), 1e-6)
        np.testing.assert_allclose(
            np.asarray(hess) / scale, np.asarray(ref.hessian) / scale,
            atol=1e-5,
        )
        bscale = max(np.abs(np.asarray(ref.rhs)).max(), 1e-6)
        np.testing.assert_allclose(
            np.asarray(rhs) / bscale, np.asarray(ref.rhs) / bscale, atol=1e-5
        )

    @pytest.mark.parametrize("stride", [1, 2])
    def test_illum_bias_matches_xla_pipeline(self, rng, stride):
        """With illum_bias the kernel centers residuals by the valid
        mean before the t-scale and emits the (s, rho, g) reductions;
        the host-side rank-1 Schur must reproduce the XLA bias path
        (center -> weights -> normal_equations -> _bias_schur)."""
        from dense_visual_odometry_tpu.ops.pallas.fused_iter import (
            fused_shift_iteration,
        )

        inputs, ref, lam_ref = self._problem(
            rng, stride=stride, illum_bias=True
        )
        hess, rhs, err, count, lam = fused_shift_iteration(
            **inputs, illum_bias=True, interpret=True
        )
        np.testing.assert_allclose(np.asarray(count), np.asarray(ref.count))
        np.testing.assert_allclose(
            np.asarray(lam), np.asarray(lam_ref), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(err), np.asarray(ref.error), rtol=1e-4
        )
        scale = max(np.abs(np.asarray(ref.hessian)).max(), 1e-6)
        np.testing.assert_allclose(
            np.asarray(hess) / scale, np.asarray(ref.hessian) / scale,
            atol=1e-5,
        )
        bscale = max(np.abs(np.asarray(ref.rhs)).max(), 1e-6)
        np.testing.assert_allclose(
            np.asarray(rhs) / bscale, np.asarray(ref.rhs) / bscale, atol=1e-5
        )

    @pytest.mark.parametrize("stride", [1, 2])
    def test_frozen_window_matches(self, rng, stride):
        """Passing a pre-extracted (planes, cu, cv) window reproduces the
        per-call extraction exactly when frozen at the same coordinates."""
        from dense_visual_odometry_tpu.ops.pallas.fused_iter import (
            fused_shift_iteration,
        )
        from dense_visual_odometry_tpu.ops.pallas.stackwarp import (
            compute_recenter,
            extract_parity_planes,
        )

        inputs, _, _ = self._problem(rng, stride=stride)
        ref = fused_shift_iteration(**inputs, interpret=True)
        u, v, vg = inputs["u"], inputs["v"], inputs["valid_geom"]
        hp, wp = u.shape[-2], u.shape[-1]
        cu, cv = compute_recenter(u, v, inputs["radius"], stride, vg)
        planes = extract_parity_planes(
            inputs["gray_curr"], cu, cv, hp, wp, inputs["radius"], stride
        )
        froz = fused_shift_iteration(
            **inputs, frozen=(planes, cu, cv), interpret=True
        )
        for a, b in zip(ref, froz):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
            )

    def test_weighter_off(self, rng):
        from dense_visual_odometry_tpu.ops.pallas.fused_iter import (
            fused_shift_iteration,
        )
        from dense_visual_odometry_tpu.ops.shiftwarp import shift_stack_sample

        inputs, _, _ = self._problem(rng)
        hess, rhs, err, count, lam = fused_shift_iteration(
            **{**inputs, "use_tweights": False}, interpret=True
        )
        warped, warp_ok = shift_stack_sample(
            inputs["gray_curr"], inputs["u"], inputs["v"], radius=4,
            grid_stride=1, coord_mask=inputs["valid_geom"],
        )
        valid = inputs["valid_geom"] & warp_ok
        res = jnp.where(valid, warped - inputs["gray_prev"], 0.0)
        jac_m = jnp.where(valid[..., None], inputs["jacobian"], 0.0)
        ref = normal_equations(
            res, jac_m, valid.astype(jnp.float32), valid
        )
        np.testing.assert_allclose(
            np.asarray(err), np.asarray(ref.error), rtol=1e-4
        )
        scale = max(np.abs(np.asarray(ref.hessian)).max(), 1e-6)
        np.testing.assert_allclose(
            np.asarray(hess) / scale, np.asarray(ref.hessian) / scale,
            atol=1e-5,
        )

    def test_solver_path_fused(self):
        """track_pair with use_fused_iteration (interpreted off-TPU)
        recovers the same motion as the unfused Pallas-stack path."""
        from dense_visual_odometry_tpu.camera import CameraModel
        from dense_visual_odometry_tpu.config import (
            RobustDVOConfig,
            TWeighterConfig,
        )
        from dense_visual_odometry_tpu.models.robust import FrameData, track_pair
        from dense_visual_odometry_tpu.ops import pyramid as pyr_ops

        h, w = 64, 96
        k = np.array(
            [[80.0, 0, (w - 1) / 2], [0, 80.0, (h - 1) / 2], [0, 0, 1]],
            np.float32,
        )
        v, u = np.meshgrid(
            np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64),
            indexing="ij",
        )
        tex = lambda uu: (  # noqa: E731
            120 + 50 * np.sin(2 * np.pi * uu / 23.0) + 40 * np.cos(2 * np.pi * v / 17.0)
        )
        tx = 0.01
        s = 80.0 * tx / 2.0
        g1 = tex(u).astype(np.float32)
        g2 = tex(u - s).astype(np.float32)
        d = np.full((h, w), 2.0, np.float32)

        def fd(g):
            return FrameData(
                gray=pyr_ops.build_pyramid(jnp.asarray(g), 2),
                depth_m=pyr_ops.build_pyramid(jnp.asarray(d), 2),
            )

        base = dict(
            levels=2, max_iterations=20, shift_stack_radius=4,
            shift_stack_levels=(0, 1), packed_sampling=True,
            approximate_image2_gradient=True, use_weighter=True,
            weighter=TWeighterConfig(scale_subsample=1, unroll_iterations=3),
            lm_lambda0=1e-4, relative_tolerance=1e-2,
        )
        cam = CameraModel.create(k, 1.0)
        r_ref = track_pair(
            fd(g1), fd(g2), cam, RobustDVOConfig(**base, use_pallas_stack=True)
        )
        r_fused = track_pair(
            fd(g1), fd(g2), cam,
            RobustDVOConfig(**base, use_fused_iteration=True),
        )
        assert bool(r_fused.success)
        np.testing.assert_allclose(
            np.asarray(r_fused.transform), np.asarray(r_ref.transform),
            atol=1e-4,
        )
        assert float(r_fused.transform[0, 3]) == pytest.approx(tx, abs=2e-3)

        # Level-start frozen window: same solve, window extracted once per
        # level instead of per evaluation.
        import dataclasses

        r_frozen = track_pair(
            fd(g1), fd(g2), cam,
            dataclasses.replace(
                RobustDVOConfig(**base, use_fused_iteration=True),
                freeze_shift_window=True,
            ),
        )
        assert bool(r_frozen.success)
        np.testing.assert_allclose(
            np.asarray(r_frozen.transform), np.asarray(r_fused.transform),
            atol=1e-4,
        )
