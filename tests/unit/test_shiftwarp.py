"""Shift-stack (gather-free) warp vs the gather-based bilinear sampler."""

import jax.numpy as jnp
import numpy as np
import pytest

from dense_visual_odometry_tpu.ops.interp import bilinear_sample
from dense_visual_odometry_tpu.ops.shiftwarp import shift_stack_sample

H, W = 40, 56


@pytest.fixture()
def image(rng):
    return jnp.asarray(rng.uniform(0, 255, size=(H, W)).astype(np.float32))


def _flow_coords(rng, scale):
    vv, uu = np.meshgrid(
        np.arange(H, dtype=np.float32), np.arange(W, dtype=np.float32), indexing="ij"
    )
    du = rng.uniform(-scale, scale, size=(H, W)).astype(np.float32)
    dv = rng.uniform(-scale, scale, size=(H, W)).astype(np.float32)
    return jnp.asarray(uu + du), jnp.asarray(vv + dv)


class TestShiftStack:
    @pytest.mark.parametrize("radius,scale", [(2, 1.4), (3, 2.5), (5, 4.2)])
    def test_matches_bilinear_inside_ball(self, image, rng, radius, scale):
        u, v = _flow_coords(rng, scale)
        vals_s, valid_s = shift_stack_sample(image, u, v, radius=radius)
        vals_b, valid_b = bilinear_sample(image, u, v)
        valid = np.asarray(valid_s)
        # Inside the ball the two samplers agree to float precision.
        np.testing.assert_allclose(
            np.asarray(vals_s)[valid], np.asarray(vals_b)[valid], atol=1e-3
        )
        # Shift-stack validity is a subset of plain bounds validity.
        assert not np.any(valid & ~np.asarray(valid_b))
        assert valid.mean() > 0.5

    def test_identity_flow_exact(self, image):
        vv, uu = jnp.meshgrid(
            jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
            indexing="ij",
        )
        vals, valid = shift_stack_sample(image, uu, vv, radius=2)
        np.testing.assert_allclose(
            np.asarray(vals)[np.asarray(valid)],
            np.asarray(image)[np.asarray(valid)],
            atol=1e-4,
        )

    def test_constant_large_flow_recentered(self, image):
        """A constant 10 px shift is absorbed by recentering: fully valid
        and exact (matches the gather-based sampler)."""
        vv, uu = jnp.meshgrid(
            jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
            indexing="ij",
        )
        vals_s, valid_s = shift_stack_sample(image, uu + 10.0, vv, radius=3)
        vals_b, valid_b = bilinear_sample(image, uu + 10.0, vv)
        m = np.asarray(valid_s)
        assert m.mean() > 0.5
        np.testing.assert_allclose(
            np.asarray(vals_s)[m], np.asarray(vals_b)[m], atol=1e-3
        )

    def test_large_spread_flagged_invalid(self, image):
        """Flow SPREAD beyond the radius (not absorbable by recentering)
        is reported invalid rather than silently wrong."""
        vv, uu = jnp.meshgrid(
            jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
            indexing="ij",
        )
        # Left half shifts -8, right half +8: mean ~0, spread 8 > radius.
        du = jnp.where(uu < W // 2, -8.0, 8.0)
        vals, valid = shift_stack_sample(image, uu + du, vv, radius=3)
        assert not bool(np.asarray(valid).any())
        np.testing.assert_array_equal(np.asarray(vals), 0.0)

    def test_strided_grid_matches_bilinear(self, image, rng):
        """Stride-2 sample grid: coordinates at full-res pixels (2j, 2i)."""
        s = 2
        hp, wp = H // s, W // s
        vv, uu = np.meshgrid(
            np.arange(hp, dtype=np.float32) * s,
            np.arange(wp, dtype=np.float32) * s,
            indexing="ij",
        )
        du = rng.uniform(-1.4, 1.4, size=(hp, wp)).astype(np.float32)
        dv = rng.uniform(-1.4, 1.4, size=(hp, wp)).astype(np.float32)
        u = jnp.asarray(uu + du)
        v = jnp.asarray(vv + dv)
        vals_s, valid_s = shift_stack_sample(image, u, v, radius=2, grid_stride=s)
        vals_b, _ = bilinear_sample(image, u, v)
        m = np.asarray(valid_s)
        assert m.mean() > 0.5
        np.testing.assert_allclose(
            np.asarray(vals_s)[m], np.asarray(vals_b)[m], atol=1e-3
        )

    def test_batched(self, rng):
        imgs = jnp.asarray(rng.uniform(0, 255, size=(3, H, W)).astype(np.float32))
        u, v = _flow_coords(rng, 1.5)
        u = jnp.broadcast_to(u, (3, H, W))
        v = jnp.broadcast_to(v, (3, H, W))
        vals_s, valid_s = shift_stack_sample(imgs, u, v, radius=2)
        vals_b, _ = bilinear_sample(imgs, u, v)
        m = np.asarray(valid_s)
        np.testing.assert_allclose(
            np.asarray(vals_s)[m], np.asarray(vals_b)[m], atol=1e-3
        )
