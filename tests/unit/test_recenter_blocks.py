"""Per-row-block recentering: slab layout, per-block windows, solver parity.

The block path (``RobustDVOConfig.recenter_blocks``) gives each row block
its own integer window center so the shift ball only covers the
within-block displacement spread (ROADMAP perf item 1).  These tests pin:
the extraction invariant (per-block windows address the source image
exactly like the single-center extraction does per element), the slab
re-layout, the coverage advantage on row-dependent flow, and end-to-end
solver parity with the single-center level kernel.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dense_visual_odometry_tpu.camera import CameraModel
from dense_visual_odometry_tpu.config import RobustDVOConfig, TWeighterConfig
from dense_visual_odometry_tpu.models.robust import (
    FrameData,
    track_pair,
)
from dense_visual_odometry_tpu.ops import pyramid as pyr_ops
from dense_visual_odometry_tpu.ops.pallas.stackwarp import (
    block_layout,
    compute_recenter_blocks,
    extract_parity_planes,
    extract_parity_planes_blocks,
    shift_coverage_blocks,
    slab_stack,
)
from dense_visual_odometry_tpu.ops.shiftwarp import shift_coverage
from dense_visual_odometry_tpu.utils.lie import se3

H, W = 120, 160
K = np.array(
    [[120.0, 0.0, (W - 1) / 2], [0.0, 120.0, (H - 1) / 2], [0.0, 0.0, 1.0]],
    dtype=np.float32,
)
Z0 = 2.0


def _texture(u, v):
    return (
        120.0
        + 50.0 * np.sin(2 * np.pi * u / 31.0)
        + 40.0 * np.cos(2 * np.pi * v / 23.0)
        + 25.0 * np.sin(2 * np.pi * (u + 2 * v) / 57.0)
        + 15.0 * np.cos(2 * np.pi * (3 * u - v) / 83.0)
    )


def _frame_data(gray, depth_m, levels):
    return FrameData(
        gray=pyr_ops.build_pyramid(jnp.asarray(gray), levels),
        depth_m=pyr_ops.build_pyramid(jnp.asarray(depth_m), levels),
    )


def _fused_cfg(**overrides):
    base = dict(
        levels=3, max_iterations=12, use_weighter=True,
        packed_sampling=True, grid_strides=(2, 1, 1),
        weighter=TWeighterConfig(scale_subsample=4),
        shift_stack_radius=3, shift_stack_levels=(0, 1),
        approximate_image2_gradient=True,
        relative_tolerance=1e-2, lm_lambda0=1e-4,
        use_pallas_stack=True, use_fused_iteration=True,
        freeze_shift_window=True, use_level_kernel=True,
    )
    base.update(overrides)
    return RobustDVOConfig(**base)


class TestBlockExtraction:
    def test_single_block_matches_plain_extraction(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.normal(size=(2, 37, 53)).astype(np.float32))
        s, radius = 2, 3
        grid_hp, grid_wp = 19, 27
        cu = jnp.asarray([3, -2], jnp.int32)
        cv = jnp.asarray([-1, 4], jnp.int32)
        plain = extract_parity_planes(
            img, cu, cv, grid_hp, grid_wp, radius, s
        )
        blocks = extract_parity_planes_blocks(
            img, cu[:, None], cv[:, None], grid_hp, grid_wp, radius, s,
            n_blocks=1,
        )
        # One block = one slab whose height equals the plain plane height.
        assert blocks.shape == plain.shape
        np.testing.assert_array_equal(
            np.asarray(blocks), np.asarray(plain)
        )

    def test_block_extraction_addresses_source_per_block(self):
        """planes[pa*s+pb, k*slab_h + mm, nn] ==
        img[cv_k + k*t*s + s*mm + pa - r, cu_k + s*nn + pb - r]."""
        s, radius, n_blocks = 2, 2, 3
        grid_hp, grid_wp = 12, 9
        h, w = grid_hp * s, grid_wp * s
        img_np = (
            np.arange(h)[:, None] * 1000.0 + np.arange(w)[None, :]
        ).astype(np.float32)
        cu = np.array([[1, -2, 0]], np.int32)
        cv = np.array([[-1, 2, 1]], np.int32)
        planes = np.asarray(
            extract_parity_planes_blocks(
                jnp.asarray(img_np[None]), jnp.asarray(cu),
                jnp.asarray(cv), grid_hp, grid_wp, radius, s, n_blocks,
            )
        )[0]
        nblk, t, halo = block_layout(grid_hp, n_blocks, radius, s)
        slab_h = t + halo
        for k in range(nblk):
            for pa in range(s):
                for pb in range(s):
                    for mm in range(2):
                        for nn in range(2, 4):
                            r_src = cv[0, k] + k * t * s + s * mm + pa - radius
                            c_src = cu[0, k] + s * nn + pb - radius
                            if not (0 <= r_src < h and 0 <= c_src < w):
                                continue
                            got = planes[pa * s + pb, k * slab_h + mm, nn]
                            assert got == img_np[r_src, c_src], (
                                k, pa, pb, mm, nn
                            )

    def test_slab_stack_layout(self):
        x = jnp.arange(5 * 7, dtype=jnp.float32).reshape(5, 7)
        out = np.asarray(slab_stack(x, 5, 2, 1, 1))
        nblk, t, halo = block_layout(5, 2, 1, 1)
        assert (nblk, t, halo) == (2, 3, 2)
        assert out.shape == (2 * (3 + 2), 7)
        np.testing.assert_array_equal(out[0:5], np.asarray(x)[0:5])
        np.testing.assert_array_equal(out[5:7], np.asarray(x)[3:5])
        # Rows past the grid are zero padding.
        np.testing.assert_array_equal(out[7:9], np.asarray(x)[0:2] * 0.0)


class TestBlockCoverage:
    def test_row_dependent_flow_kept_by_blocks(self):
        """A +-5 px row-split horizontal flow overwhelms a radius-3 ball
        around any single center but is fully covered per block."""
        hp, wp = 32, 40
        col = np.arange(wp, dtype=np.float32)[None, :]
        row = np.arange(hp, dtype=np.float32)[:, None]
        shift = np.where(row < hp // 2, -5.0, 5.0)
        u = jnp.asarray(np.broadcast_to(col + shift, (hp, wp)))
        v = jnp.asarray(np.broadcast_to(row, (hp, wp)).copy())
        single = float(shift_coverage(u, v, 3, 1))
        blocks = float(shift_coverage_blocks(u, v, 3, 1, 2))
        assert single < 0.1
        assert blocks > 0.99

    def test_recenter_blocks_means(self):
        hp, wp = 16, 8
        col = np.arange(wp, dtype=np.float32)[None, :]
        row = np.arange(hp, dtype=np.float32)[:, None]
        shift = np.where(row < hp // 2, 2.0, -3.0)
        u = jnp.asarray(np.broadcast_to(col + shift, (hp, wp)))
        v = jnp.asarray(np.broadcast_to(row + 1.0, (hp, wp)).copy())
        cu, cv = compute_recenter_blocks(u, v, 3, 1, 2)
        np.testing.assert_array_equal(np.asarray(cu), [2, -3])
        np.testing.assert_array_equal(np.asarray(cv), [1, 1])


class TestBlockSolver:
    def test_blocks_match_single_center_translation(self):
        tx = 0.01
        v, u = np.meshgrid(
            np.arange(H, dtype=np.float64),
            np.arange(W, dtype=np.float64), indexing="ij",
        )
        s = K[0, 0] * tx / Z0
        gray1 = _texture(u, v).astype(np.float32)
        gray2 = _texture(u - s, v).astype(np.float32)
        depth = np.full((H, W), Z0, dtype=np.float32)
        camera = CameraModel.create(K, 1.0)
        prev = _frame_data(gray1, depth, 3)
        curr = _frame_data(gray2, depth, 3)
        results = {}
        for nb in (None, 4):
            cfg = _fused_cfg(recenter_blocks=nb)
            r = track_pair(prev, curr, camera, cfg)
            assert bool(r.success)
            results[nb] = np.asarray(r.transform)
        # Pure translation: every block center equals the global one, so
        # the block path differs only in summation order / the slab
        # layout's masked halo rows.
        np.testing.assert_allclose(results[4], results[None], atol=1e-4)
        assert results[4][0, 3] == pytest.approx(tx, abs=3e-3)

    def test_blocks_recover_rotation(self):
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
        cfg = _fused_cfg(recenter_blocks=4, max_iterations=30)
        r = track_pair(
            _frame_data(gray1, depth, 3), _frame_data(gray2, depth, 3),
            camera, cfg,
        )
        assert bool(r.success)
        xi = np.asarray(se3.log(r.transform))
        assert xi[5] == pytest.approx(angle, abs=2e-3)

    def test_blocks_with_fallback_trigger(self):
        """The per-block coverage trigger + fallback dispatch compile and
        keep an all-zero-depth pair finite."""
        v, u = np.meshgrid(
            np.arange(H, dtype=np.float64),
            np.arange(W, dtype=np.float64), indexing="ij",
        )
        gray = _texture(u, v).astype(np.float32)
        zero_depth = np.zeros((H, W), np.float32)
        camera = CameraModel.create(K, 1.0)
        cfg = _fused_cfg(
            recenter_blocks=4, shift_stack_fallback=True,
        )
        r = track_pair(
            _frame_data(gray, zero_depth, 3),
            _frame_data(gray, zero_depth, 3),
            camera, cfg,
        )
        assert np.all(np.isfinite(np.asarray(r.transform)))

    def test_config_validation(self):
        with pytest.raises(ValueError):
            RobustDVOConfig(recenter_blocks=4)  # needs use_level_kernel
        with pytest.raises(ValueError):
            _fused_cfg(
                recenter_blocks=4, use_esm_gradients=True,
                esm_levels=(0,),
            )
        with pytest.raises(ValueError):
            _fused_cfg(shift_stack_radius_y=2)  # needs blocks
        with pytest.raises(ValueError):
            _fused_cfg(recenter_blocks=4, shift_stack_radius_y=5)  # > rx


class TestAnisotropicBall:
    def test_extraction_addresses_source_anisotropic(self):
        s, rx, ry, n_blocks = 2, 3, 2, 2
        grid_hp, grid_wp = 10, 9
        h, w = grid_hp * s, grid_wp * s
        img_np = (
            np.arange(h)[:, None] * 1000.0 + np.arange(w)[None, :]
        ).astype(np.float32)
        cu = np.array([[1, -2]], np.int32)
        cv = np.array([[-1, 2]], np.int32)
        planes = np.asarray(
            extract_parity_planes_blocks(
                jnp.asarray(img_np[None]), jnp.asarray(cu),
                jnp.asarray(cv), grid_hp, grid_wp, rx, s, n_blocks,
                radius_y=ry,
            )
        )[0]
        nblk, t, halo = block_layout(grid_hp, n_blocks, ry, s)
        slab_h = t + halo
        # plane[pa*s+pb, k*slab_h + mm, nn]
        #   == img[cv_k + k*t*s + s*mm + pa - ry, cu_k + s*nn + pb - rx]
        for k in range(nblk):
            for pa in range(s):
                for pb in range(s):
                    for mm in range(2, 4):
                        for nn in range(2, 4):
                            r_src = cv[0, k] + k * t * s + s * mm + pa - ry
                            c_src = cu[0, k] + s * nn + pb - rx
                            if not (0 <= r_src < h and 0 <= c_src < w):
                                continue
                            got = planes[pa * s + pb, k * slab_h + mm, nn]
                            assert got == img_np[r_src, c_src]

    def test_solver_matches_isotropic_on_translation(self):
        tx = 0.01
        v, u = np.meshgrid(
            np.arange(H, dtype=np.float64),
            np.arange(W, dtype=np.float64), indexing="ij",
        )
        s = K[0, 0] * tx / Z0
        gray1 = _texture(u, v).astype(np.float32)
        gray2 = _texture(u - s, v).astype(np.float32)
        depth = np.full((H, W), Z0, dtype=np.float32)
        camera = CameraModel.create(K, 1.0)
        prev = _frame_data(gray1, depth, 3)
        curr = _frame_data(gray2, depth, 3)
        r_iso = track_pair(
            prev, curr, camera, _fused_cfg(recenter_blocks=4)
        )
        r_ani = track_pair(
            prev, curr, camera,
            _fused_cfg(recenter_blocks=4, shift_stack_radius_y=2),
        )
        assert bool(r_ani.success)
        # Horizontal flow, zero vertical displacement: shrinking the
        # vertical radius must not change the pixels used.
        np.testing.assert_allclose(
            np.asarray(r_ani.transform), np.asarray(r_iso.transform),
            atol=1e-4,
        )
        assert np.asarray(r_ani.transform)[0, 3] == pytest.approx(
            tx, abs=3e-3
        )

    def test_coverage_anisotropic(self):
        hp, wp = 32, 40
        col = np.arange(wp, dtype=np.float32)[None, :]
        row = np.arange(hp, dtype=np.float32)[:, None]
        # Vertical flow that jumps by block: covered per block at ry=2.
        vshift = np.where(row < hp // 2, -4.0, 4.0)
        u = jnp.asarray(np.broadcast_to(col, (hp, wp)).copy())
        v = jnp.asarray(np.broadcast_to(row + vshift, (hp, wp)))
        cov = float(
            shift_coverage_blocks(u, v, 3, 1, 2, radius_y=2)
        )
        assert cov > 0.99
        # The same flow with a single center at ry=2 keeps almost nothing.
        single = float(
            shift_coverage_blocks(u, v, 3, 1, 1, radius_y=2)
        )
        assert single < 0.1
