"""Frame-to-model tracking (virtual TSDF keyframes) end-to-end accuracy.

The tracker must recover the bundled sequence's motion against raycast
virtual keyframes to the same accuracy class as plain odometry — the
virtual keyframe is a DENOISED render of the same geometry, so matching
odometry proves the raycast is photometrically/geometrically faithful
enough to track against.
"""

import numpy as np

from dense_visual_odometry_tpu import metrics
from dense_visual_odometry_tpu.config import RobustDVOConfig, TWeighterConfig
from dense_visual_odometry_tpu.io import load_bundled_sequence
from dense_visual_odometry_tpu.models.frame_to_model import (
    FrameToModelTracker,
)
from dense_visual_odometry_tpu.models.tsdf import TSDFConfig


def test_tracks_bundled_sequence():
    seq = load_bundled_sequence(size=6)
    cfg = RobustDVOConfig(
        levels=4, max_iterations=12, use_weighter=True,
        packed_sampling=True, grid_strides=(2, 2, 1, 1),
        weighter=TWeighterConfig(scale_subsample=4),
        shift_stack_radius=3, shift_stack_levels=(0, 1, 2),
        approximate_image2_gradient=True,
        relative_tolerance=1e-2, lm_lambda0=1e-4,
        use_pallas_stack=True, use_fused_iteration=True,
        freeze_shift_window=True, use_level_kernel=True,
    )
    tcfg = TSDFConfig.around(
        (0.0, 0.0, 1.5), 5.0, resolution=128, truncation=4 * 5.0 / 128
    )
    tracker = FrameToModelTracker(seq.camera, cfg, tcfg)
    for rgb, depth in seq:
        tracker.step(rgb, depth)
    poses = tracker.trajectory()
    assert tracker.failures == 0
    assert tracker.renders >= 1
    gt_rel = np.einsum(
        "ij,njk->nik", np.linalg.inv(seq.gt_poses[0]), seq.gt_poses[: len(poses)]
    )
    ate, _ = metrics.ate_rmse(poses, gt_rel)
    # Plain odometry lands ~4.2 mm on this set; the virtual-keyframe
    # reference carries voxel quantization (39 mm voxels here), so the
    # bound is looser but still sub-centimeter-class.
    assert ate < 0.02, f"frame-to-model ATE {ate * 1e3:.1f} mm"


def test_kinfu_mode_tracks_bundled_sequence():
    """Per-frame-render (KinectFusion-loop) mode: one fused donated
    program per frame; must track the bundled set like keyframe mode."""
    from dense_visual_odometry_tpu.models.frame_to_model import (
        ModelTrackerPolicy,
    )

    seq = load_bundled_sequence(size=6)
    cfg = RobustDVOConfig(
        levels=4, max_iterations=12, use_weighter=True,
        packed_sampling=True, grid_strides=(2, 2, 1, 1),
        weighter=TWeighterConfig(scale_subsample=4),
        shift_stack_radius=3, shift_stack_levels=(0, 1, 2),
        approximate_image2_gradient=True,
        relative_tolerance=1e-2, lm_lambda0=1e-4,
        use_pallas_stack=True, use_fused_iteration=True,
        freeze_shift_window=True, use_level_kernel=True,
    )
    tcfg = TSDFConfig.around(
        (0.0, 0.0, 1.5), 4.0, resolution=192, truncation=4 * 4.0 / 192
    )
    tracker = FrameToModelTracker(
        seq.camera, cfg, tcfg,
        policy=ModelTrackerPolicy(render_every_frame=True, raycast="march"),
    )
    for rgb, depth in seq:
        tracker.step(rgb, depth)
    poses = tracker.trajectory()
    assert tracker.failures == 0
    gt_rel = np.einsum(
        "ij,njk->nik", np.linalg.inv(seq.gt_poses[0]),
        seq.gt_poses[: len(poses)],
    )
    ate, _ = metrics.ate_rmse(poses, gt_rel)
    assert ate < 0.02, f"kinfu-mode ATE {ate * 1e3:.1f} mm"


def test_kinfu_mode_with_brick_volume():
    """KinectFusion loop against the BRICK volume (round-4 VERDICT task
    4): same bundled-set accuracy class at a HIGHER virtual resolution
    than the dense test for a fraction of the memory, with the sparse
    allocation staying well inside the pool."""
    from dense_visual_odometry_tpu.models.brick_tsdf import BrickTSDFConfig
    from dense_visual_odometry_tpu.models.frame_to_model import (
        ModelTrackerPolicy,
    )

    seq = load_bundled_sequence(size=6)
    cfg = RobustDVOConfig(
        levels=4, max_iterations=12, use_weighter=True,
        packed_sampling=True, grid_strides=(2, 2, 1, 1),
        weighter=TWeighterConfig(scale_subsample=4),
        shift_stack_radius=3, shift_stack_levels=(0, 1, 2),
        approximate_image2_gradient=True,
        relative_tolerance=1e-2, lm_lambda0=1e-4,
        use_pallas_stack=True, use_fused_iteration=True,
        freeze_shift_window=True, use_level_kernel=True,
    )
    tcfg = BrickTSDFConfig.around(
        (0.0, 0.0, 1.5), 4.0, resolution=256, truncation=4 * 4.0 / 256,
        pool_size=8192, active_bricks=6144,
    )
    tracker = FrameToModelTracker(
        seq.camera, cfg, tcfg,
        policy=ModelTrackerPolicy(render_every_frame=True, raycast="march"),
    )
    for rgb, depth in seq:
        tracker.step(rgb, depth)
    poses = tracker.trajectory()
    assert tracker.failures == 0
    assert int(tracker.volume.n_dropped) == 0
    assert 0 < int(tracker.volume.n_used) < tcfg.pool_size
    gt_rel = np.einsum(
        "ij,njk->nik", np.linalg.inv(seq.gt_poses[0]),
        seq.gt_poses[: len(poses)],
    )
    ate, _ = metrics.ate_rmse(poses, gt_rel)
    assert ate < 0.02, f"brick kinfu ATE {ate * 1e3:.1f} mm"
