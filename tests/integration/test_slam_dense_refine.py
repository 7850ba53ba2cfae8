"""SlamSession.refine_dense: the dense BA pass wired into the live session.

Dense BA (models/dense_ba.py) is proven standalone against the pose
graph; this covers the session integration — marshaling retained
keyframe FrameData into DenseBAData, loop-closure-aware target tables,
in-place keyframe-pose update with world-frame re-anchoring.
"""


import jax.numpy as jnp
import numpy as np
import pytest

from dense_visual_odometry_tpu.camera import CameraModel
from dense_visual_odometry_tpu.config import RobustDVOConfig
from dense_visual_odometry_tpu.io import load_bundled_sequence, synthetic
from dense_visual_odometry_tpu.models.dense_ba import DenseBAConfig
from dense_visual_odometry_tpu.models.slam import KeyframePolicy, SlamSession
from dense_visual_odometry_tpu.ops import pyramid as pyr_ops
from dense_visual_odometry_tpu.utils.lie import se3


def _kf_ate(slam, gt):
    est = np.stack([slam.keyframe_poses[k] for k in range(slam.num_keyframes)])
    ref = gt[np.asarray(slam.keyframe_indices)]
    return float(np.sqrt(np.mean(np.sum((est[:, :3, 3] - ref[:, :3, 3]) ** 2, -1))))


@pytest.fixture(scope="module")
def tracked(test_data_dir):
    import cv2

    seq = load_bundled_sequence(test_data_dir)
    rgb, depth_raw = seq.frame(0)
    gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY).astype(np.float32)
    depth = depth_raw.astype(np.float32) * seq.camera.depth_scale
    gray_h = np.asarray(pyr_ops.build_pyramid(jnp.asarray(gray), 2)[1])
    depth_h = np.asarray(pyr_ops.build_pyramid(jnp.asarray(depth), 2)[1])
    k_half = np.asarray(seq.camera.at(1), np.float32)

    gt = synthetic.orbit_trajectory(6, radius=0.02, angle=0.02, advance=0.01)
    grays, depths = synthetic.render_sequence(gray_h, depth_h, k_half, gt)

    camera = CameraModel.create(k_half, 1.0)
    cfg = RobustDVOConfig(levels=3, use_weighter=True, max_iterations=30)
    # Promote every frame so all six poses are dense-BA variables.
    policy = KeyframePolicy(
        max_translation=1e-9, max_rotation=1e-9, window=4, loop_closure=False
    )
    slam = SlamSession(camera, cfg, policy)
    for g, d in zip(grays, depths):
        slam.step(g, d)
    assert slam.num_keyframes == 6
    return slam, gt.astype(np.float64)


def test_refine_dense_pulls_corrupted_poses_back(tracked):
    slam, gt = tracked

    # Replace the keyframe poses by a GT-anchored noisy odometry walk
    # (perturbed relative motions, composed — accumulated-drift shape).
    # Corrupting the SESSION-tracked poses instead does not make a
    # stable test: tracker drift is photometrically self-consistent
    # (each pose sits at a pairwise photometric optimum of the rendered
    # frames), so dense BA removes injected noise but not the drift —
    # see benchmarks/RESULTS.md.  The strong-recovery claim is owned by
    # test_dense_ba_synthetic; this test guards the session plumbing.
    rng = np.random.default_rng(7)
    anchor0 = gt[0].copy()
    walk = [anchor0]
    for i in range(1, slam.num_keyframes):
        rel = np.linalg.inv(gt[i - 1]) @ gt[i]
        xi = np.asarray(se3.log(jnp.asarray(rel, jnp.float32)), np.float64)
        xi[:3] += rng.normal(0, 0.004, 3)
        xi[3:] += rng.normal(0, 0.002, 3)
        walk.append(
            walk[-1] @ np.asarray(se3.exp(jnp.asarray(xi, jnp.float32)), np.float64)
        )
    for k in range(slam.num_keyframes):
        slam.keyframe_poses[k] = walk[k].copy()
    ate_noisy = _kf_ate(slam, gt)
    assert ate_noisy > 0.005

    # A fabricated loop closure exercises the loop-aware target table.
    slam.loop_closures.append((0, slam.num_keyframes - 1, 0.0))
    result = slam.refine_dense(
        grid_stride=8, window=2,
        config=DenseBAConfig(max_iterations=20, depth_anchor_weight=1e3),
    )
    assert result is not None
    ate_refined = _kf_ate(slam, gt)
    # Dense photometry pulls the walk most of the way back to the scene.
    assert ate_refined < 0.6 * ate_noisy
    # World anchor untouched.
    np.testing.assert_allclose(slam.keyframe_poses[0], anchor0, atol=1e-9)
    # The per-frame trajectory reflects the refinement.
    traj = slam.optimized_trajectory()
    assert traj.shape == (6, 4, 4)


def test_depth_feedback_cuts_subsequent_tracking_error(test_data_dir):
    """``refine_dense(update_depths=True)`` feeds BA-refined inverse
    depths back into the live keyframe pyramids; tracking AFTER the
    refinement then runs against better geometry.

    Scenario: keyframe depths corrupted by a smooth multiplicative
    miscalibration field (+-8%); dense BA with a weak depth anchor
    recovers the true structure from multi-view photometric consistency.
    Measured at authoring time: relative-pose error of the two
    post-refinement frames drops 1.07 -> 0.42 mm and 1.49 -> 0.80 mm
    with feedback vs without (same BA, same poses — only the fed-back
    depth differs)."""
    import cv2

    seq = load_bundled_sequence(test_data_dir)
    rgb, depth_raw = seq.frame(0)
    gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY).astype(np.float32)
    depth = depth_raw.astype(np.float32) * seq.camera.depth_scale
    gray_h = np.asarray(pyr_ops.build_pyramid(jnp.asarray(gray), 2)[1])
    depth_h = np.asarray(pyr_ops.build_pyramid(jnp.asarray(depth), 2)[1])
    k_half = np.asarray(seq.camera.at(1), np.float32)

    n = 8
    gt = synthetic.orbit_trajectory(n, radius=0.03, angle=0.02, advance=0.012)
    grays, depths = synthetic.render_sequence(gray_h, depth_h, k_half, gt)
    h, w = depth_h.shape
    vv, uu = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    field = 1.0 + 0.08 * np.sin(2 * np.pi * uu / w) * np.cos(2 * np.pi * vv / h)
    corrupted = [d * field for d in depths]

    camera = CameraModel.create(k_half, 1.0)
    cfg = RobustDVOConfig(levels=3, use_weighter=True, max_iterations=30)

    def run(update_depths):
        policy = KeyframePolicy(
            max_translation=1e-9, max_rotation=1e-9, window=4,
            loop_closure=False,
        )
        slam = SlamSession(camera, cfg, policy)
        for i in range(6):
            slam.step(grays[i], corrupted[i])
        slam.refine_dense(
            grid_stride=4, window=3,
            config=DenseBAConfig(max_iterations=25, depth_anchor_weight=1e1),
            update_depths=update_depths,
        )
        # Stop promotions; the remaining frames track against keyframe 5.
        slam.policy = KeyframePolicy(
            max_translation=1e9, max_rotation=1e9, window=4,
            loop_closure=False,
        )
        errs = []
        for i in range(6, n):
            pose = np.asarray(slam.step(grays[i], corrupted[i]).matrix)
            rel_est = np.linalg.inv(slam.keyframe_poses[5]) @ pose
            rel_gt = np.linalg.inv(gt[5]) @ gt[i]
            errs.append(np.linalg.norm(rel_est[:3, 3] - rel_gt[:3, 3]))
        return np.asarray(errs)

    e_nofb = run(False)
    e_fb = run(True)
    assert np.all(e_fb < 0.75 * e_nofb), (e_fb, e_nofb)


def test_refine_dense_requires_two_keyframes(tracked):
    slam, _ = tracked
    lone = SlamSession(slam.camera, slam.config, slam.policy)
    assert lone.refine_dense() is None  # no keyframes yet -> no-op
