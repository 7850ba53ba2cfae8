"""Batched multi-stream session: lockstep tracking of B cameras."""

import numpy as np
import pytest

from dense_visual_odometry_tpu.config import RobustDVOConfig
from dense_visual_odometry_tpu.io import load_bundled_sequence
from dense_visual_odometry_tpu.models.batched_session import BatchedOdometrySession
from dense_visual_odometry_tpu.models.session import OdometrySession


@pytest.fixture(scope="module")
def seq(test_data_dir):
    return load_bundled_sequence(test_data_dir, size=4)


CFG = RobustDVOConfig(levels=3, use_weighter=True)


@pytest.fixture(scope="module")
def test_data_dir():
    import os
    from pathlib import Path

    d = Path(os.environ.get("DVO_TEST_DATA", "/root/reference/tests/test_data"))
    if not (d / "ground_truth.json").exists():
        pytest.skip("bundled RGB-D test frames not available")
    return d


class TestBatchedSession:
    def test_matches_single_stream(self, seq):
        """B identical streams must produce the single-session trajectory."""
        b = 3
        batched = BatchedOdometrySession(seq.camera, CFG)
        single = OdometrySession(seq.camera, CFG)
        for rgb, depth in seq:
            rgb_b = np.stack([rgb] * b)
            depth_b = np.stack([depth] * b)
            poses_b = np.asarray(batched.step(rgb_b, depth_b))
            pose_s = np.asarray(single.step(rgb, depth).matrix)
            for i in range(b):
                np.testing.assert_allclose(poses_b[i], pose_s, atol=1e-5)

    def test_per_stream_failure_isolated(self, seq):
        """A dead stream (zero depth) must not disturb the others."""
        b = 2
        batched = BatchedOdometrySession(seq.camera, CFG)
        frames = [seq.frame(i) for i in range(3)]
        rgb0, d0 = frames[0]

        batched.step(np.stack([rgb0] * b), np.stack([d0] * b))
        rgb1, d1 = frames[1]
        # Stream 1 gets a dead depth frame.
        dead = np.zeros_like(d1)
        poses = np.asarray(
            batched.step(np.stack([rgb1, rgb1]), np.stack([d1, dead]))
        )
        out = batched.last_output
        assert bool(out.success[0])
        assert not bool(out.success[1])
        # Stream 1 pose unchanged (identity from frame 0).
        np.testing.assert_allclose(poses[1], np.eye(4), atol=1e-6)
        assert not np.allclose(poses[0], np.eye(4), atol=1e-6)

        # Stream 1 recovers against its retained frame 0.
        rgb2, d2 = frames[2]
        batched.step(np.stack([rgb2, rgb2]), np.stack([d2, d2]))
        assert bool(batched.last_output.success[1])

    def test_reset_stream(self, seq):
        batched = BatchedOdometrySession(seq.camera, CFG)
        rgb, depth = seq.frame(0)
        rgb1, d1 = seq.frame(1)
        batched.step(np.stack([rgb, rgb]), np.stack([depth, depth]))
        batched.step(np.stack([rgb1, rgb1]), np.stack([d1, d1]))
        batched.reset_stream(0)
        poses = np.asarray(batched.poses)
        np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-6)
        assert not np.allclose(poses[1], np.eye(4), atol=1e-6)
