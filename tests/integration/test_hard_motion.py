"""Hard-motion stress suite: fast-path validity under large motion.

The shipped fast configuration (shift-stack radius 4 + precomputed
Jacobian) assumes small residual warps; pixels outside the recentered
shift ball are silently masked (ops/shiftwarp.py).  The bundled 10-frame
set is nearly motionless, so nothing there certifies behaviour under real
motion.  This suite renders sequences with EXACT ground truth at
escalating motion magnitudes (io/synthetic) and enforces:

- the reference-default configuration tracks every magnitude;
- the fast path + ``shift_stack_fallback`` degrades gracefully: ATE stays
  within 2x of the reference-default config even at ~10x the bundled
  set's motion (VERDICT r1 acceptance bound);
- the coverage trigger actually fires (the raw fast path without
  fallback is measurably worse on the rotation-heavy case).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from dense_visual_odometry_tpu import metrics
from dense_visual_odometry_tpu.config import RobustDVOConfig, TWeighterConfig
from dense_visual_odometry_tpu.io import load_bundled_sequence, synthetic
from dense_visual_odometry_tpu.models.session import OdometrySession
from dense_visual_odometry_tpu.ops import pyramid as pyr_ops
from dense_visual_odometry_tpu.camera import CameraModel


def _fast_cfg(**kw):
    base = dict(
        levels=4, max_iterations=12, use_weighter=True,
        packed_sampling=True, grid_strides=(2, 2, 1, 1),
        weighter=TWeighterConfig(scale_subsample=4),
        shift_stack_radius=4, shift_stack_levels=(0, 1, 2),
        approximate_image2_gradient=True,
        relative_tolerance=1e-2, lm_lambda0=1e-4,
        constant_velocity_init=True,
    )
    base.update(kw)
    return RobustDVOConfig(**base)


REFERENCE_CFG = RobustDVOConfig(levels=4, use_weighter=True, max_iterations=50)


@pytest.fixture(scope="module")
def scene(test_data_dir):
    """Full-res real frame as the rendering source."""
    import cv2

    seq = load_bundled_sequence(test_data_dir)
    rgb, depth_raw = seq.frame(0)
    gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY).astype(np.float32)
    depth = depth_raw.astype(np.float32) * seq.camera.depth_scale
    k_mat = np.asarray(seq.camera.intrinsics, np.float32)
    camera = CameraModel.create(k_mat, 1.0)  # depths already metric
    return gray, depth, k_mat, camera


def _track(camera, grays, depths, cfg):
    session = OdometrySession(camera, cfg)
    poses = [
        np.asarray(session.step(g, d).matrix, np.float64)
        for g, d in zip(grays, depths)
    ]
    return np.stack(poses)


def _run_case(scene, radius, angle, advance, cfg, n=6):
    gray, depth, k_mat, camera = scene
    gt = synthetic.orbit_trajectory(n, radius=radius, angle=angle, advance=advance)
    grays, depths = synthetic.render_sequence(gray, depth, k_mat, gt)
    poses = _track(camera, grays, depths, cfg)
    ate, _ = metrics.ate_rmse(poses, gt)
    return float(ate)


class TestHardMotion:
    # Bundled-set motion is ~2 mm/frame; "10x the bundled set's motion"
    # corresponds to the mid case; the large case goes further.
    CASES = {
        "mild": dict(radius=0.01, angle=0.01, advance=0.005),
        "translation-10x": dict(radius=0.05, angle=0.02, advance=0.03),
        "rotation-heavy": dict(radius=0.01, angle=0.12, advance=0.005),
    }

    @pytest.mark.parametrize("case", list(CASES))
    def test_fallback_config_degrades_gracefully(self, scene, case):
        params = self.CASES[case]
        ate_ref = _run_case(scene, cfg=REFERENCE_CFG, **params)
        ate_fast = _run_case(
            scene,
            cfg=_fast_cfg(shift_stack_fallback=True, robust_init_selection=True),
            **params,
        )
        # Reference config must actually track (sanity on the fixture).
        assert ate_ref < 0.05
        # Graceful degradation: within 2x of the reference config plus the
        # fast path's decimation floor (~4 mm on the bundled set).
        assert ate_fast < 2.0 * ate_ref + 0.005

    def test_fallback_beats_raw_fast_path_on_rotation(self, scene):
        params = self.CASES["rotation-heavy"]
        ate_fb = _run_case(
            scene,
            cfg=_fast_cfg(shift_stack_fallback=True, robust_init_selection=True),
            **params,
        )
        ate_raw = _run_case(scene, cfg=_fast_cfg(), **params)
        # The rotation-heavy case pushes displacement spread beyond the
        # shift ball: the raw fast path silently masks pixels and loses
        # accuracy; the fallback must be strictly better.
        assert ate_fb < ate_raw

    def test_scale_gated_retrack_rescues_cold_starts(self, scene):
        """Every estimate-based trigger reads zero at an identity init:
        the biased fast path "converges" instantly on the first frame and
        the mistrack poisons every later constant-velocity warm start, so
        the per-level triggers never get an estimate that carries the
        motion.  The converged IRLS residual scale is estimate-INDEPENDENT
        (well-tracked frames end <= ~5 intensity units, mistracked ones
        >= ~21, see benchmarks/RESULTS.md) — the scale-gated retrack
        re-solves flagged frames on the robust path and must rescue the
        rotation-heavy case (measured 28.6 -> 10.6 mm)."""
        params = self.CASES["rotation-heavy"]
        cfg_no = _fast_cfg(
            shift_stack_fallback=True, robust_init_selection=True
        )
        cfg_rt = dataclasses.replace(cfg_no, retrack_max_scale=10.0)
        ate_no = _run_case(scene, cfg=cfg_no, **params)
        ate_rt = _run_case(scene, cfg=cfg_rt, **params)
        assert ate_rt < 0.6 * ate_no
        assert ate_rt < 0.015
        # And it must not disturb well-tracked sequences (no spurious
        # retrack: easy frames end far below the scale threshold).
        mild = self.CASES["mild"]
        ate_no_mild = _run_case(scene, cfg=cfg_no, **mild)
        ate_rt_mild = _run_case(scene, cfg=cfg_rt, **mild)
        assert ate_rt_mild < ate_no_mild + 5e-4

    def test_coverage_trigger_fires(self, scene):
        """Unit-level check that the rotation-heavy warp actually drops
        coverage below the fallback threshold at the finest level."""
        from dense_visual_odometry_tpu.ops.residuals import _warp_geometry
        from dense_visual_odometry_tpu.ops.shiftwarp import shift_coverage

        gray, depth, k_mat, camera = scene
        angle = 0.12
        c, s = np.cos(angle), np.sin(angle)
        t = np.eye(4, dtype=np.float32)
        t[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        _, u, v, valid_geom = _warp_geometry(
            jnp.asarray(depth), jnp.asarray(k_mat), jnp.asarray(t)
        )
        cov = float(
            shift_coverage(u, v, radius=4, grid_stride=1, coord_mask=valid_geom)
        )
        assert cov < 0.6
        # And a small warp keeps coverage high.
        t_small = np.eye(4, dtype=np.float32)
        t_small[0, 3] = 0.003
        _, u2, v2, vg2 = _warp_geometry(
            jnp.asarray(depth), jnp.asarray(k_mat), jnp.asarray(t_small)
        )
        cov2 = float(
            shift_coverage(u2, v2, radius=4, grid_stride=1, coord_mask=vg2)
        )
        assert cov2 > 0.9
