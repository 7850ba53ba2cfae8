"""Packed-tap sampling ops: f16 pair packing + gather-halved bilinear."""

import jax.numpy as jnp
import numpy as np
import pytest

from dense_visual_odometry_tpu.ops.interp import (
    bilinear_sample,
    bilinear_sample_packed,
    nearest_sample_packed,
    pack_neighbors,
    pack_pair_f16,
    unpack_pair_f16,
)


class TestPacking:
    def test_pair_roundtrip_exact_for_f16_values(self, rng):
        a = rng.integers(0, 256, size=(16, 32)).astype(np.float32)
        b = rng.integers(0, 256, size=(16, 32)).astype(np.float32)
        pa, pb = unpack_pair_f16(pack_pair_f16(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_array_equal(np.asarray(pa), a)
        np.testing.assert_array_equal(np.asarray(pb), b)

    def test_pack_neighbors_layout(self):
        img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
        a, b = unpack_pair_f16(pack_neighbors(img))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(img))
        expected_right = np.asarray(img)[:, [1, 2, 3, 3]]
        np.testing.assert_array_equal(np.asarray(b), expected_right)

    def test_f16_precision_bound(self, rng):
        x = rng.uniform(0, 255, size=(64,)).astype(np.float32)
        a, _ = unpack_pair_f16(pack_pair_f16(jnp.asarray(x), jnp.asarray(x)))
        # f16 has 11-bit significand: relative error < 2^-11.
        np.testing.assert_allclose(np.asarray(a), x, rtol=5e-4)


class TestPackedBilinear:
    @pytest.fixture()
    def image(self, rng):
        return jnp.asarray(rng.uniform(0, 255, size=(48, 64)).astype(np.float32))

    def test_matches_unpacked(self, image, rng):
        u = jnp.asarray(rng.uniform(-2, 66, size=(20, 30)).astype(np.float32))
        v = jnp.asarray(rng.uniform(-2, 50, size=(20, 30)).astype(np.float32))
        ref_vals, ref_valid = bilinear_sample(image, u, v)
        packed_vals, packed_valid = bilinear_sample_packed(
            pack_neighbors(image), u, v
        )
        np.testing.assert_array_equal(np.asarray(ref_valid), np.asarray(packed_valid))
        np.testing.assert_allclose(
            np.asarray(packed_vals), np.asarray(ref_vals), atol=0.25
        )

    def test_integer_coords_exact(self, image):
        vv, uu = jnp.meshgrid(jnp.arange(20.0), jnp.arange(30.0), indexing="ij")
        vals, valid = bilinear_sample_packed(pack_neighbors(image), uu, vv)
        np.testing.assert_allclose(
            np.asarray(vals)[np.asarray(valid)],
            np.asarray(image)[:20, :30][np.asarray(valid)],
            atol=0.15,
        )

    def test_batched(self, rng):
        imgs = jnp.asarray(rng.uniform(0, 255, size=(3, 32, 40)).astype(np.float32))
        u = jnp.asarray(rng.uniform(0, 38, size=(3, 16, 20)).astype(np.float32))
        v = jnp.asarray(rng.uniform(0, 30, size=(3, 16, 20)).astype(np.float32))
        pv, _ = bilinear_sample_packed(pack_neighbors(imgs), u, v)
        rv, _ = bilinear_sample(imgs, u, v)
        np.testing.assert_allclose(np.asarray(pv), np.asarray(rv), atol=0.25)


class TestNearestPacked:
    def test_two_channels_one_gather(self, rng):
        gx = rng.uniform(-50, 50, size=(32, 40)).astype(np.float32)
        gy = rng.uniform(-50, 50, size=(32, 40)).astype(np.float32)
        packed = pack_pair_f16(jnp.asarray(gx), jnp.asarray(gy))
        u = jnp.asarray(rng.uniform(0, 39, size=(10, 12)).astype(np.float32))
        v = jnp.asarray(rng.uniform(0, 31, size=(10, 12)).astype(np.float32))
        a, b, valid = nearest_sample_packed(packed, u, v)
        ui = np.clip(np.round(np.asarray(u)).astype(int), 0, 39)
        vi = np.clip(np.round(np.asarray(v)).astype(int), 0, 31)
        np.testing.assert_allclose(np.asarray(a), gx[vi, ui], rtol=5e-4, atol=0.05)
        np.testing.assert_allclose(np.asarray(b), gy[vi, ui], rtol=5e-4, atol=0.05)
        assert bool(np.all(np.asarray(valid)))

    def test_oob_invalid(self):
        packed = pack_pair_f16(jnp.ones((8, 8)), jnp.ones((8, 8)))
        a, b, valid = nearest_sample_packed(
            packed, jnp.asarray([[-1.0, 9.0]]), jnp.asarray([[0.0, 0.0]])
        )
        assert not np.asarray(valid).any()
        np.testing.assert_array_equal(np.asarray(a), 0.0)
