"""Image-op tests, validated against OpenCV as the golden oracle
(the reference implements these with cv2: medianBlur+decimate pyramid at
image_pyramid.py:19-21, Sobel at jacobian.py:70-71)."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dense_visual_odometry_tpu.ops import gradients, interp, pyramid

median3x3 = jax.jit(pyramid.median3x3)
pyr_down = jax.jit(pyramid.pyr_down)
sobel = jax.jit(gradients.sobel)
bilinear = jax.jit(interp.bilinear_sample)


class TestMedianPyramid:
    def test_median_matches_cv2_uint8(self, rng):
        img = rng.integers(0, 256, size=(64, 80), dtype=np.uint8)
        ours = np.asarray(median3x3(jnp.asarray(img, jnp.float32)))
        ref = cv2.medianBlur(img, 3).astype(np.float32)
        assert np.array_equal(ours, ref)

    def test_median_matches_cv2_uint16(self, rng):
        img = rng.integers(0, 65535, size=(48, 64), dtype=np.uint16)
        ours = np.asarray(median3x3(jnp.asarray(img, jnp.float32)))
        ref = cv2.medianBlur(img, 3).astype(np.float32)
        assert np.array_equal(ours, ref)

    def test_pyr_down_matches_reference_semantics(self, rng):
        img = rng.integers(0, 256, size=(64, 80), dtype=np.uint8)
        ours = np.asarray(pyr_down(jnp.asarray(img, jnp.float32)))
        ref = cv2.medianBlur(img, 3)[::2, ::2].astype(np.float32)
        assert np.array_equal(ours, ref)

    def test_build_pyramid_shapes(self, rng):
        img = jnp.asarray(rng.normal(size=(64, 80)), jnp.float32)
        pyr = pyramid.build_pyramid(img, 4)
        assert [p.shape for p in pyr] == [(64, 80), (32, 40), (16, 20), (8, 10)]
        assert np.array_equal(pyr[0], img)

    def test_batched(self, rng):
        imgs = rng.integers(0, 256, size=(3, 32, 40), dtype=np.uint8)
        ours = np.asarray(median3x3(jnp.asarray(imgs, jnp.float32)))
        for i in range(3):
            assert np.array_equal(ours[i], cv2.medianBlur(imgs[i], 3).astype(np.float32))

    def test_rgb_to_gray(self):
        rgb = jnp.asarray([[[100.0, 200.0, 50.0]]])
        gray = pyramid.rgb_to_gray(rgb)
        assert np.isclose(float(gray[0, 0]), 0.299 * 100 + 0.587 * 200 + 0.114 * 50, atol=1e-3)

    def test_preprocess_depth_clamps_far(self):
        raw = jnp.asarray([[1000, 30000]], jnp.uint16)  # 0.2 m, 6 m at 2e-4
        z = pyramid.preprocess_depth(raw, 2e-4, max_distance=5.0)
        assert np.allclose(z, [[0.2, 0.0]], atol=1e-6)


class TestSobel:
    def test_matches_cv2(self, rng):
        img = rng.integers(0, 256, size=(32, 48)).astype(np.float32)
        gx, gy = sobel(jnp.asarray(img))
        ref_gx = cv2.Sobel(img, cv2.CV_32FC1, 1, 0, ksize=3, borderType=cv2.BORDER_REFLECT)
        ref_gy = cv2.Sobel(img, cv2.CV_32FC1, 0, 1, ksize=3, borderType=cv2.BORDER_REFLECT)
        assert np.allclose(gx, ref_gx, atol=1e-3)
        assert np.allclose(gy, ref_gy, atol=1e-3)

    def test_vertical_line_image(self):
        # Golden case mirroring the reference's synthetic-line test
        # (tests/.../test_jacobian.py:48-73): a bright column produces pure
        # x-gradient of opposite signs on each side and zero y-gradient.
        img = np.zeros((10, 10), np.float32)
        img[:, 5] = 255.0
        gx, gy = sobel(jnp.asarray(img))
        gx = np.asarray(gx)
        assert np.all(gx[:, 4] > 0) and np.all(gx[:, 6] < 0)
        assert np.allclose(np.asarray(gy)[1:-1], 0.0)


class TestBilinear:
    def test_exact_on_grid(self, rng):
        img = jnp.asarray(rng.normal(size=(16, 20)), jnp.float32)
        # Interior grid points reproduce the image exactly
        u, v = jnp.meshgrid(jnp.arange(19.0), jnp.arange(15.0))
        vals, valid = bilinear(img, u, v)
        assert bool(valid.all())
        assert np.allclose(vals, np.asarray(img)[:15, :19], atol=1e-6)

    def test_midpoint_average(self):
        img = jnp.asarray([[0.0, 10.0], [20.0, 30.0]])
        vals, valid = bilinear(img, jnp.asarray([0.5]), jnp.asarray([0.5]))
        assert bool(valid[0]) and np.isclose(float(vals[0]), 15.0)

    def test_bounds_convention_matches_reference(self):
        # Valid iff floor(u)+1 <= W-1 (reference cpu_...py:241): the last
        # row/col and anything negative are invalid.
        img = jnp.zeros((8, 8))
        u = jnp.asarray([-0.1, 0.0, 6.999, 7.0, 7.5])
        v = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0])
        _, valid = bilinear(img, u, v)
        assert list(np.asarray(valid)) == [False, True, True, False, False]

    def test_oob_returns_zero_not_nan(self):
        img = jnp.full((4, 4), 7.0)
        vals, valid = bilinear(img, jnp.asarray([-5.0, 10.0]), jnp.asarray([0.0, 0.0]))
        assert not bool(valid.any())
        assert np.all(np.isfinite(np.asarray(vals))) and np.allclose(vals, 0.0)

    def test_matches_cv2_remap(self, rng):
        img = rng.integers(0, 256, size=(32, 40)).astype(np.float32)
        u = (rng.random(size=(200,)) * 37 + 1).astype(np.float32)
        v = (rng.random(size=(200,)) * 29 + 1).astype(np.float32)
        vals, valid = bilinear(jnp.asarray(img), jnp.asarray(u), jnp.asarray(v))
        ref = cv2.remap(img, u.reshape(-1, 1), v.reshape(-1, 1), cv2.INTER_LINEAR).reshape(-1)
        ours = np.asarray(vals)
        ok = np.asarray(valid)
        assert ok.all()
        assert np.allclose(ours, ref, atol=1e-2)
