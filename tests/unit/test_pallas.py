"""Pallas kernels vs their XLA twins (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dense_visual_odometry_tpu.ops.pallas.reduction import normal_equations_pallas
from dense_visual_odometry_tpu.ops.residuals import normal_equations


def _case(rng, b, h, w, all_valid=False):
    res = jnp.asarray(rng.normal(size=(b, h, w)).astype(np.float32))
    jac = jnp.asarray(rng.normal(size=(b, h, w, 6)).astype(np.float32))
    wts = jnp.asarray(rng.uniform(0, 1, size=(b, h, w)).astype(np.float32))
    valid = (
        jnp.ones((b, h, w), bool)
        if all_valid
        else jnp.asarray(rng.uniform(size=(b, h, w)) > 0.3)
    )
    return res, jac, wts, valid


def _check(a, b):
    for name in ("hessian", "rhs", "error", "count"):
        x = np.asarray(getattr(a, name))
        y = np.asarray(getattr(b, name))
        denom = max(np.abs(y).max(), 1e-6)
        np.testing.assert_allclose(x / denom, y / denom, atol=5e-6)


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


class TestReductionKernel:
    @pytest.mark.parametrize("shape", [(2, 32, 128), (1, 64, 256), (3, 24, 128)])
    def test_matches_xla(self, rng, shape):
        case = _case(rng, *shape)
        _check(
            normal_equations_pallas(*case, interpret=True),
            normal_equations(*case),
        )

    def test_unbatched_input(self, rng):
        res, jac, wts, valid = _case(rng, 1, 32, 128)
        a = normal_equations_pallas(res[0], jac[0], wts[0], valid[0], interpret=True)
        b = normal_equations(res[0], jac[0], wts[0], valid[0])
        _check(a, b)
        assert a.hessian.shape == (6, 6)

    def test_hessian_symmetric(self, rng):
        case = _case(rng, 2, 32, 128, all_valid=True)
        out = normal_equations_pallas(*case, interpret=True)
        h = np.asarray(out.hessian)
        np.testing.assert_allclose(h, np.swapaxes(h, -1, -2), rtol=1e-6)
