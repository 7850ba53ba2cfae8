"""Keyframe SLAM pipeline + checkpoint/resume tests (bundled real frames)."""

import numpy as np
import pytest

from dense_visual_odometry_tpu import metrics
from dense_visual_odometry_tpu.config import RobustDVOConfig
from dense_visual_odometry_tpu.io import load_bundled_sequence
from dense_visual_odometry_tpu.io.checkpoint import (
    load_session,
    load_slam_session,
    load_trajectory_state,
    save_session,
    save_slam_session,
    save_trajectory_state,
)
from dense_visual_odometry_tpu.models.session import OdometrySession
from dense_visual_odometry_tpu.models.slam import KeyframePolicy, SlamSession


@pytest.fixture(scope="module")
def short_seq(test_data_dir):
    return load_bundled_sequence(test_data_dir)


class TestSlamSession:
    def test_tracks_bundled_sequence(self, short_seq):
        slam = SlamSession(
            short_seq.camera,
            RobustDVOConfig(levels=4, use_weighter=True),
            # Aggressive policy so this short easy sequence still creates
            # several keyframes and exercises the BA path.
            KeyframePolicy(max_translation=0.01, max_rotation=0.01, window=4),
        )
        for rgb, depth in short_seq:
            slam.step(rgb, depth)
        assert slam.num_keyframes >= 3

        traj = slam.optimized_trajectory()
        assert traj.shape == (len(short_seq), 4, 4)
        assert np.all(np.isfinite(traj))

        gt_rel = np.einsum(
            "ij,njk->nik", np.linalg.inv(short_seq.gt_poses[0]), short_seq.gt_poses
        )
        ate, _ = metrics.ate_rmse(traj, gt_rel)
        assert ate < 0.02, f"SLAM ATE too high: {ate}"

    def test_frame_to_keyframe_reduces_updates(self, short_seq):
        """With a lax policy the whole easy sequence should fit in very few
        keyframes (frame-to-keyframe tracking, not frame-to-frame)."""
        slam = SlamSession(
            short_seq.camera,
            RobustDVOConfig(levels=4, use_weighter=True),
            KeyframePolicy(max_translation=0.5, max_rotation=0.5),
        )
        for rgb, depth in short_seq:
            slam.step(rgb, depth)
        assert slam.num_keyframes <= 2
        traj = slam.optimized_trajectory()
        gt_rel = np.einsum(
            "ij,njk->nik", np.linalg.inv(short_seq.gt_poses[0]), short_seq.gt_poses
        )
        ate, _ = metrics.ate_rmse(traj, gt_rel)
        assert ate < 0.02


class TestLoopClosure:
    def test_loops_detected_and_improve_ba(self, short_seq):
        slam = SlamSession(
            short_seq.camera,
            RobustDVOConfig(levels=4, use_weighter=True),
            KeyframePolicy(
                max_translation=0.008, max_rotation=0.008,
                loop_min_gap=2, window=6,
            ),
        )
        for rgb, depth in short_seq:
            slam.step(rgb, depth)
        # The bundled sequence barely moves: plenty of verifiable loops.
        assert len(slam.loop_closures) >= 3
        for j, k, err in slam.loop_closures:
            assert k - j >= 2
            assert err <= slam.policy.loop_max_error

        slam.optimize_full()
        traj = slam.optimized_trajectory()
        gt_rel = np.einsum(
            "ij,njk->nik", np.linalg.inv(short_seq.gt_poses[0]), short_seq.gt_poses
        )
        ate, _ = metrics.ate_rmse(traj, gt_rel)
        assert ate < 0.01

    def test_loops_disabled(self, short_seq):
        slam = SlamSession(
            short_seq.camera,
            RobustDVOConfig(levels=3),
            KeyframePolicy(max_translation=0.008, loop_closure=False),
        )
        for rgb, depth in short_seq:
            slam.step(rgb, depth)
        assert slam.loop_closures == []


class TestCheckpoint:
    def test_session_save_resume_bitexact(self, short_seq, tmp_path):
        cfg = RobustDVOConfig(levels=3, use_weighter=True)
        a = OdometrySession(short_seq.camera, cfg)
        frames = [short_seq.frame(i) for i in range(4)]

        for rgb, depth in frames[:2]:
            a.step(rgb, depth)
        ckpt = save_session(tmp_path / "state.npz", a)

        # Continue A; restore B from checkpoint and feed the same frames.
        b = OdometrySession(short_seq.camera, cfg)
        b.step(*frames[0])  # allocate state with right shapes
        load_session(ckpt, b)

        for rgb, depth in frames[2:]:
            pa = np.asarray(a.step(rgb, depth).matrix)
            pb = np.asarray(b.step(rgb, depth).matrix)
            np.testing.assert_array_equal(pa, pb)

    def test_slam_save_resume_bitexact(self, short_seq, tmp_path):
        cfg = RobustDVOConfig(levels=3, use_weighter=True)
        policy = KeyframePolicy(max_translation=0.01, max_rotation=0.01, window=4)
        a = SlamSession(short_seq.camera, cfg, policy)
        frames = [short_seq.frame(i) for i in range(6)]

        for rgb, depth in frames[:3]:
            a.step(rgb, depth)
        ckpt = save_slam_session(tmp_path / "slam.npz", a)

        b = SlamSession(short_seq.camera, cfg, policy)
        load_slam_session(ckpt, b)
        assert b.num_keyframes == a.num_keyframes
        assert b.keyframe_indices == a.keyframe_indices

        for rgb, depth in frames[3:]:
            pa = np.asarray(a.step(rgb, depth).matrix)
            pb = np.asarray(b.step(rgb, depth).matrix)
            np.testing.assert_array_equal(pa, pb)
        np.testing.assert_array_equal(
            a.optimized_trajectory(), b.optimized_trajectory()
        )

    def test_slam_empty_rejected(self, short_seq, tmp_path):
        s = SlamSession(short_seq.camera)
        with pytest.raises(ValueError, match="no keyframes"):
            save_slam_session(tmp_path / "s.npz", s)

    def test_level_mismatch_rejected(self, short_seq, tmp_path):
        a = OdometrySession(short_seq.camera, RobustDVOConfig(levels=3))
        a.step(*short_seq.frame(0))
        ckpt = save_session(tmp_path / "s.npz", a)
        b = OdometrySession(short_seq.camera, RobustDVOConfig(levels=4))
        b.step(*short_seq.frame(0))
        with pytest.raises(ValueError, match="pyramid levels"):
            load_session(ckpt, b)

    def test_empty_session_rejected(self, short_seq, tmp_path):
        s = OdometrySession(short_seq.camera)
        with pytest.raises(ValueError, match="no state"):
            save_session(tmp_path / "s.npz", s)

    def test_trajectory_state_roundtrip(self, tmp_path, rng):
        poses = rng.normal(size=(7, 4, 4))
        ts = np.arange(7.0)
        p = save_trajectory_state(tmp_path / "t.npz", poses, ts, frame_index=7)
        data = load_trajectory_state(p)
        np.testing.assert_array_equal(data["poses"], poses)
        assert data["frame_index"] == 7
        np.testing.assert_array_equal(data["timestamps"], ts)


class TestTwoStepTracking:
    def test_two_step_matches_single_step_accuracy(self, short_seq):
        """Two-step tracking (frame-to-frame kernel solve + short
        frame-to-keyframe refinement in one program) must track the
        bundled sequence to the same accuracy class as the direct
        frame-to-keyframe solve, with keyframe promotions exercised."""
        cfg = RobustDVOConfig(levels=4, use_weighter=True, lm_lambda0=1e-4)
        results = {}
        for two_step in (False, True):
            slam = SlamSession(
                short_seq.camera, cfg,
                KeyframePolicy(
                    max_translation=0.01, max_rotation=0.01, window=4,
                    two_step_tracking=two_step,
                ),
            )
            for rgb, depth in short_seq:
                slam.step(rgb, depth)
            traj = slam.optimized_trajectory()
            gt_rel = np.einsum(
                "ij,njk->nik", np.linalg.inv(short_seq.gt_poses[0]),
                short_seq.gt_poses,
            )
            ate, _ = metrics.ate_rmse(traj, gt_rel)
            results[two_step] = (ate, slam.num_keyframes)
        assert results[True][1] >= 3  # promotions happened
        assert results[True][0] < 0.02, results
        # Same accuracy class (the refinement keeps the keyframe anchor).
        assert results[True][0] < 2.5 * results[False][0] + 1e-3, results
