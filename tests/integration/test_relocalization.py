"""Failure recovery: relocalization after sustained tracking loss.

The reference's only loss handling is "skip the pose update and try the
next frame" (base_dense_visual_odometry.py:75-86) — against a stale
keyframe that never works once the camera has actually moved on.  The
SLAM session adds an error-level loss gate (``track_max_error``: a
finite solve over enough pixels can still be a WRONG alignment) and
appearance relocalization: after ``relocalize_after`` lost frames the
frame descriptor is matched against all retained keyframes and the best
candidates are dense-verified in one batched call.
"""

import numpy as np
import pytest

from dense_visual_odometry_tpu import metrics
from dense_visual_odometry_tpu.camera import CameraModel
from dense_visual_odometry_tpu.config import RobustDVOConfig
from dense_visual_odometry_tpu.io import load_bundled_sequence, synthetic
from dense_visual_odometry_tpu.models.slam import KeyframePolicy, SlamSession


@pytest.fixture(scope="module")
def scenario(test_data_dir):
    """An outbound trajectory, a blackout, then a revisit of the start."""
    import cv2

    seq = load_bundled_sequence(test_data_dir, size=1)
    rgb, depth_raw = seq.frame(0)
    gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY).astype(np.float32)
    depth = depth_raw.astype(np.float32) * seq.camera.depth_scale
    k_mat = np.asarray(seq.camera.intrinsics, np.float32)
    camera = CameraModel.create(k_mat, 1.0)

    # Outbound: strong yaw sweep so the final keyframe's view barely
    # overlaps the start.
    n_out = 8
    gt_out = []
    for t in range(n_out):
        a = -0.04 * t
        c, s = np.cos(a), np.sin(a)
        p = np.eye(4)
        p[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        p[:3, 3] = [0.01 * t, 0.0, 0.005 * t]
        gt_out.append(p)
    gt_out = np.stack(gt_out)
    grays, depths = synthetic.render_sequence(gray, depth, k_mat, gt_out)

    # Blackout frames: nothing valid to track.
    black_g = np.zeros_like(grays[0])
    black_d = np.zeros_like(depths[0])

    # Revisit: back near the starting pose.
    revisit_pose = np.eye(4)
    revisit_pose[:3, 3] = [0.005, 0.0, 0.0]
    g_rev, d_rev = synthetic.render_view(
        gray, depth, k_mat, np.linalg.inv(revisit_pose)
    )
    return camera, grays, depths, gt_out, (black_g, black_d), (g_rev, d_rev, revisit_pose)


def _policy(**kw):
    base = dict(
        max_translation=0.03, max_rotation=0.08, window=4,
        loop_closure=False, track_max_error=500.0,
        relocalize_after=2, relocalize_min_similarity=0.5,
    )
    base.update(kw)
    return KeyframePolicy(**base)


CFG = RobustDVOConfig(levels=4, use_weighter=True, max_iterations=50)


def test_relocalizes_after_blackout(scenario):
    camera, grays, depths, gt_out, (bg, bd), (g_rev, d_rev, rev_pose) = scenario
    slam = SlamSession(camera, CFG, _policy())
    for g, d in zip(grays, depths):
        slam.step(g, d)
    assert slam.num_keyframes >= 2  # the yaw sweep forced promotions

    for _ in range(3):
        slam.step(bg, bd)  # blackout: lost (no valid depth)

    pose = np.asarray(slam.step(g_rev, d_rev).matrix, np.float64)
    assert len(slam.relocalizations) == 1
    frame_idx, kf_id = slam.relocalizations[0]
    # Re-anchored at an EARLY keyframe (the revisit looks like the start,
    # not like the yawed-away active keyframe).
    assert kf_id == 0
    err = np.linalg.norm(pose[:3, 3] - rev_pose[:3, 3])
    assert err < 0.01  # recovered pose within 10 mm of ground truth

    # Tracking continues normally from the re-anchored keyframe.
    pose2 = np.asarray(slam.step(g_rev, d_rev).matrix, np.float64)
    assert len(slam.relocalizations) == 1  # no further relocalization
    assert np.linalg.norm(pose2[:3, 3] - rev_pose[:3, 3]) < 0.01


def test_without_relocalization_stays_lost(scenario):
    camera, grays, depths, gt_out, (bg, bd), (g_rev, d_rev, rev_pose) = scenario
    slam = SlamSession(camera, CFG, _policy(relocalize=False))
    for g, d in zip(grays, depths):
        slam.step(g, d)
    frozen = np.asarray(slam.frame_poses[-1], np.float64)
    for _ in range(3):
        slam.step(bg, bd)
    pose = np.asarray(slam.step(g_rev, d_rev).matrix, np.float64)
    # The error gate keeps the wrong alignment out, so the pose stays
    # frozen at the pre-blackout estimate — far from the revisit truth.
    np.testing.assert_allclose(pose, frozen, atol=1e-9)
    assert np.linalg.norm(pose[:3, 3] - rev_pose[:3, 3]) > 0.05


def test_relocalization_state_checkpoints(scenario, tmp_path):
    from dense_visual_odometry_tpu.io.checkpoint import (
        load_slam_session,
        save_slam_session,
    )

    camera, grays, depths, gt_out, (bg, bd), (g_rev, d_rev, rev_pose) = scenario
    slam = SlamSession(camera, CFG, _policy())
    for g, d in zip(grays, depths):
        slam.step(g, d)
    for _ in range(3):
        slam.step(bg, bd)
    slam.step(g_rev, d_rev)
    assert slam.relocalizations and slam._active_kf == 0

    path = save_slam_session(tmp_path / "slam.npz", slam)
    fresh = SlamSession(camera, CFG, _policy())
    load_slam_session(path, fresh)
    assert fresh.relocalizations == slam.relocalizations
    assert fresh._active_kf == slam._active_kf
    # The restored session tracks from the re-anchored keyframe: the next
    # step must agree with the original session bit-exactly.
    a = np.asarray(slam.step(g_rev, d_rev).matrix)
    b = np.asarray(fresh.step(g_rev, d_rev).matrix)
    np.testing.assert_array_equal(a, b)
