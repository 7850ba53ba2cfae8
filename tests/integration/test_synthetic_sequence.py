"""Harder accuracy benchmark: rendered sequence with exact ground truth.

Renders a 12-frame all-six-DoF trajectory from one real frame
(io/synthetic.py) and requires the tracker to stay within a tight ATE —
motions here are ~5x larger than the bundled set's.
"""

import numpy as np
import pytest

from dense_visual_odometry_tpu import metrics
from dense_visual_odometry_tpu.config import RobustDVOConfig
from dense_visual_odometry_tpu.io import load_bundled_sequence
from dense_visual_odometry_tpu.io.synthetic import (
    orbit_trajectory,
    render_sequence,
    render_view,
)
from dense_visual_odometry_tpu.models.session import OdometrySession


@pytest.fixture(scope="module")
def source(test_data_dir_module):
    import cv2

    seq = load_bundled_sequence(test_data_dir_module, size=1)
    rgb, depth = seq.frame(0)
    gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY).astype(np.float32)
    depth_m = depth.astype(np.float32) * seq.camera.depth_scale
    return gray, depth_m, np.asarray(seq.camera.intrinsics), seq.camera


@pytest.fixture(scope="module")
def test_data_dir_module():
    import os
    from pathlib import Path

    d = Path(os.environ.get("DVO_TEST_DATA", "/root/reference/tests/test_data"))
    if not (d / "ground_truth.json").exists():
        pytest.skip("bundled RGB-D test frames not available")
    return d


class TestRenderView:
    def test_identity_reproduces_frame(self, source):
        gray, depth_m, k, _ = source
        g, d = render_view(gray, depth_m, k, np.eye(4))
        valid = (d > 0) & (depth_m > 0)
        assert valid.mean() > 0.6
        # Splatting is nearest-pixel: intensities match closely.
        diff = np.abs(g - gray)[valid]
        assert np.median(diff) <= 3.0  # radius-1 splat blurs neighbours

    def test_translation_creates_holes(self, source):
        gray, depth_m, k, _ = source
        t = np.eye(4)
        t[0, 3] = 0.3
        g, d = render_view(gray, depth_m, k, t)
        # Large sideways motion: a strip of disocclusion holes appears.
        assert (d == 0).mean() > 0.05
        assert (d > 0).mean() > 0.3


class TestSyntheticTrajectory:
    @pytest.mark.parametrize("cfg_name,cfg", [
        ("default", RobustDVOConfig(levels=4, use_weighter=True)),
        ("fast", RobustDVOConfig(
            levels=4, max_iterations=12, use_weighter=True,
            packed_sampling=True, grid_strides=(2, 2, 1, 1),
            shift_stack_radius=4, shift_stack_levels=(0, 1, 2),
            approximate_image2_gradient=True,
        )),
    ])
    def test_tracks_orbit(self, source, cfg_name, cfg):
        gray, depth_m, k, camera = source
        n = 12
        poses_gt = orbit_trajectory(n, radius=0.04, angle=0.03, advance=0.015)
        grays, depths = render_sequence(gray, depth_m, k, poses_gt)

        from dense_visual_odometry_tpu.camera import CameraModel

        cam = CameraModel(intrinsics=camera.intrinsics, depth_scale=1.0)
        session = OdometrySession(cam, cfg)
        est = np.stack(
            [np.asarray(session.step(g, d).matrix, np.float64)
             for g, d in zip(grays, depths)]
        )
        assert np.all(np.isfinite(est))
        ate, per = metrics.ate_rmse(est, poses_gt)
        # Rendered frames have splat noise + disocclusion holes; bound is
        # looser than the quasi-static bundled set but still tight
        # relative to the ~6 cm of total motion.
        assert ate < 0.02, f"{cfg_name}: ATE {ate * 1000:.1f} mm too high"
