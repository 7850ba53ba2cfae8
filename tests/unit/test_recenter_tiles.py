"""Per-TILE (2-D) recentering: mosaic layout, coverage, solver parity.

Round-4 VERDICT task 1: row blocks only absorb the VERTICAL component of
a rotation's displacement field; tiles absorb the local mean in both
axes, which keeps SLAM frame-to-keyframe solves (rotation spread ~24 px
image-wide, ~2.4 px per 32-px tile) inside the radius-3 shift ball and
therefore on the level-fused kernel.  These tests pin: the coverage
advantage on rotation-like flow, end-to-end solver parity with the
single-center kernel on translation, rotation recovery beyond the
row-block regime, the tile fallback trigger, and config validation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dense_visual_odometry_tpu.camera import CameraModel
from dense_visual_odometry_tpu.config import RobustDVOConfig, TWeighterConfig
from dense_visual_odometry_tpu.models.robust import FrameData, track_pair
from dense_visual_odometry_tpu.ops import pyramid as pyr_ops
from dense_visual_odometry_tpu.ops.pallas.stackwarp import (
    compute_recenter_tiles,
    shift_coverage_blocks,
    shift_coverage_tiles,
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


class TestTileCoverage:
    def test_rotation_flow_kept_by_tiles_not_rows(self):
        """An in-plane rotation's displacement varies along BOTH axes:
        a 3-px-per-half-image rotation-like field defeats the global
        center AND row blocks (horizontal gradient along columns), but
        per-tile centers cover it fully."""
        hp, wp = 64, 64
        col = np.arange(wp, dtype=np.float32)[None, :]
        row = np.arange(hp, dtype=np.float32)[:, None]
        theta = 0.22  # rad: corner displacement ~7 px
        cx, cy = (wp - 1) / 2, (hp - 1) / 2
        # Rotation displacement field about the image centre.
        u = jnp.asarray(
            col + (-theta) * (row - cy) * np.ones_like(col)
        )
        v = jnp.asarray(row + theta * (col - cx) * np.ones_like(row))
        single = float(shift_coverage(u, v, 3, 1))
        rows_only = float(shift_coverage_blocks(u, v, 3, 1, 8))
        tiles = float(shift_coverage_tiles(u, v, 3, 1, 8, 8))
        assert single < 0.55
        # Row blocks absorb only dv(row); du(row) remains unbounded.
        assert rows_only < 0.75
        assert tiles > 0.97, (single, rows_only, tiles)

    def test_tile_means(self):
        hp, wp = 16, 16
        col = np.arange(wp, dtype=np.float32)[None, :]
        row = np.arange(hp, dtype=np.float32)[:, None]
        shift_u = np.where(col < wp // 2, 2.0, -3.0) * np.ones((hp, 1))
        shift_v = np.where(row < hp // 2, 1.0, 4.0) * np.ones((1, wp))
        u = jnp.asarray(col + shift_u)
        v = jnp.asarray(row + shift_v)
        cu, cv = compute_recenter_tiles(u, v, 3, 1, 2, 2)
        np.testing.assert_array_equal(np.asarray(cu), [[2, -3], [2, -3]])
        np.testing.assert_array_equal(np.asarray(cv), [[1, 1], [4, 4]])


class TestTileSolver:
    def test_tiles_match_single_center_translation(self):
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
            cfg = _fused_cfg(
                recenter_blocks=4 if nb else None,
                recenter_col_blocks=nb,
            )
            r = track_pair(prev, curr, camera, cfg)
            assert bool(r.success)
            results[nb] = np.asarray(r.transform)
        # Pure translation: every tile center equals the global one, so
        # the tile path differs only in summation order / masked halo.
        np.testing.assert_allclose(results[4], results[None], atol=1e-4)
        assert results[4][0, 3] == pytest.approx(tx, abs=3e-3)

    def test_tiles_recover_larger_rotation_than_blocks(self):
        """A 2.5-deg in-plane rotation (corner displacement ~4.4 px at
        this extent — outside the global radius-3 ball) is recovered on
        the tile path."""
        angle = 0.044
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
        cfg = _fused_cfg(
            recenter_blocks=6, recenter_col_blocks=6, max_iterations=30,
            # Keep the solve on the kernel path: this test pins the tile
            # kernel's ability to handle the warp, not the trigger.
            fallback_max_rotation=1.0,
        )
        r = track_pair(
            _frame_data(gray1, depth, 3), _frame_data(gray2, depth, 3),
            camera, cfg,
        )
        assert bool(r.success)
        xi = np.asarray(se3.log(r.transform))
        assert xi[5] == pytest.approx(angle, abs=3e-3)

    def test_tiles_with_fallback_trigger(self):
        """Tile coverage trigger + fallback dispatch compile; an
        all-zero-depth pair stays finite."""
        v, u = np.meshgrid(
            np.arange(H, dtype=np.float64),
            np.arange(W, dtype=np.float64), indexing="ij",
        )
        gray = _texture(u, v).astype(np.float32)
        zero_depth = np.zeros((H, W), np.float32)
        camera = CameraModel.create(K, 1.0)
        cfg = _fused_cfg(
            recenter_blocks=4, recenter_col_blocks=4,
            shift_stack_fallback=True,
        )
        r = track_pair(
            _frame_data(gray, zero_depth, 3),
            _frame_data(gray, zero_depth, 3),
            camera, cfg,
        )
        assert np.all(np.isfinite(np.asarray(r.transform)))

    def test_config_validation(self):
        with pytest.raises(ValueError):
            RobustDVOConfig(recenter_col_blocks=4)  # needs row count
        with pytest.raises(ValueError):
            _fused_cfg(recenter_blocks=1, recenter_col_blocks=4,
                       use_level_kernel=False)
