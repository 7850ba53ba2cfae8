"""End-to-end session + IO + metrics tests on the bundled 10-frame set.

This is the full-trajectory convergence test the reference left commented
out (test_cpu_robust_dense_visual_odometry.py:75-93), plus loader and
report round-trips.
"""

import json

import numpy as np
import pytest

from dense_visual_odometry_tpu import metrics
from dense_visual_odometry_tpu.config import RobustDVOConfig
from dense_visual_odometry_tpu.io import (
    load_bundled_sequence,
    load_tum_sequence,
    trajectory,
)
from dense_visual_odometry_tpu.models.session import OdometrySession


class TestBundledSequence:
    def test_loader(self, test_data_dir):
        seq = load_bundled_sequence(test_data_dir)
        assert len(seq) == 10
        assert seq.gt_poses.shape == (10, 4, 4)
        rgb, depth = seq.frame(0)
        assert rgb.shape == (480, 640, 3)
        assert depth.shape == (480, 640)
        assert depth.dtype == np.uint16
        assert seq.camera.depth_scale == pytest.approx(2e-4)

    def test_loader_size_subset(self, test_data_dir):
        seq = load_bundled_sequence(test_data_dir, size=3)
        assert len(seq) == 3

    def test_missing_dir(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_bundled_sequence(tmp_path / "nope")

    def test_full_trajectory_ate(self, test_data_dir):
        """Track all 10 frames; ATE-RMSE must be small (< 2 cm)."""
        seq = load_bundled_sequence(test_data_dir)
        session = OdometrySession(seq.camera, RobustDVOConfig(levels=4, use_weighter=True))
        poses = [np.asarray(session.step(rgb, depth).matrix) for rgb, depth in seq]
        poses = np.stack(poses).astype(np.float64)
        assert np.all(np.isfinite(poses))

        gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(seq.gt_poses[0]), seq.gt_poses)
        ate, _ = metrics.ate_rmse(poses, gt_rel)
        assert ate < 0.02, f"ATE-RMSE too high: {ate}"

    def test_deterministic_across_runs(self, test_data_dir):
        """SURVEY §5 race-detection replacement: the functional design
        must be bitwise deterministic — the reference's fastmath parallel
        reductions were not."""
        seq = load_bundled_sequence(test_data_dir, size=4)
        cfg = RobustDVOConfig(levels=3, use_weighter=True)

        def run():
            session = OdometrySession(seq.camera, cfg)
            return np.stack(
                [np.asarray(session.step(r, d).matrix) for r, d in seq]
            )

        np.testing.assert_array_equal(run(), run())

    def test_config_files_load(self):
        from pathlib import Path

        for name in ("reference_default.json", "tpu_fast.json"):
            cfg = RobustDVOConfig.from_json(
                Path(__file__).resolve().parents[2] / "configs" / name
            )
            assert cfg.levels == 4

    def test_tracking_failure_keeps_state(self, test_data_dir):
        """An all-zero-depth frame must not corrupt pose or previous frame."""
        seq = load_bundled_sequence(test_data_dir, size=3)
        session = OdometrySession(seq.camera, RobustDVOConfig(levels=3))
        rgb0, d0 = seq.frame(0)
        rgb1, d1 = seq.frame(1)
        session.step(rgb0, d0)
        pose_before = np.asarray(session.step(rgb1, d1).matrix)

        # Frame with no valid depth: solver cannot succeed.
        bad_depth = np.zeros_like(d1)
        pose_after = np.asarray(session.step(rgb1, bad_depth).matrix)
        assert not bool(session.last_output.success)
        np.testing.assert_array_equal(pose_before, pose_after)

        # Recovery: a good frame still tracks against the retained frame 1.
        rgb2, d2 = seq.frame(2)
        session.step(rgb2, d2)
        assert bool(session.last_output.success)


class TestTumLoader:
    @pytest.fixture()
    def fake_tum_dir(self, tmp_path, test_data_dir):
        """Assemble a minimal TUM-format dir from the bundled frames."""
        import shutil

        seq = load_bundled_sequence(test_data_dir, size=3)
        (tmp_path / "rgb").mkdir()
        (tmp_path / "depth").mkdir()
        rgb_lines, depth_lines, gt_lines = ["# rgb"], ["# depth"], ["# gt"]
        for i in range(3):
            ts = 1000.0 + i * 0.05
            shutil.copy(seq.rgb_paths[i], tmp_path / "rgb" / f"{ts:.6f}.png")
            shutil.copy(seq.depth_paths[i], tmp_path / "depth" / f"{ts + 0.01:.6f}.png")
            rgb_lines.append(f"{ts:.6f} rgb/{ts:.6f}.png")
            depth_lines.append(f"{ts + 0.01:.6f} depth/{ts + 0.01:.6f}.png")
            t = seq.gt_poses[i][:3, 3]
            gt_lines.append(f"{ts:.6f} {t[0]} {t[1]} {t[2]} 0 0 0 1")
        (tmp_path / "rgb.txt").write_text("\n".join(rgb_lines))
        (tmp_path / "depth.txt").write_text("\n".join(depth_lines))
        (tmp_path / "groundtruth.txt").write_text("\n".join(gt_lines))
        return tmp_path

    def test_association(self, fake_tum_dir, test_data_dir):
        seq = load_tum_sequence(
            fake_tum_dir, camera_yaml=test_data_dir / "camera_intrinsics.yaml"
        )
        assert len(seq) == 3
        assert seq.gt_poses.shape == (3, 4, 4)
        rgb, depth = seq.frame(0)
        assert rgb.shape == (480, 640, 3)
        # Rotation part identity (quaternion 0 0 0 1).
        np.testing.assert_allclose(seq.gt_poses[0][:3, :3], np.eye(3), atol=1e-12)

    def test_missing_dir(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_tum_sequence(tmp_path / "nope")


class TestTrajectoryIO:
    def test_tum_roundtrip(self, tmp_path, rng):
        from dense_visual_odometry_tpu.utils.lie import Pose

        n = 5
        poses = []
        for i in range(n):
            xi = rng.normal(scale=0.3, size=(6,)).astype(np.float32)
            poses.append(np.asarray(Pose.from_xi(xi).matrix, dtype=np.float64))
        ts = np.arange(n, dtype=np.float64) + 0.5
        path = trajectory.save_tum_trajectory(tmp_path / "traj.txt", ts, poses)
        ts2, poses2 = trajectory.load_tum_trajectory(path)
        np.testing.assert_allclose(ts2, ts, atol=1e-6)
        for a, b in zip(poses, poses2):
            np.testing.assert_allclose(a, b, atol=1e-4)

    def test_report_json(self, tmp_path):
        eye = np.eye(4)
        path = trajectory.save_report(
            tmp_path / "report.json",
            sequence_info={"type": "test"},
            timestamps=[0.0, 1.0],
            estimated_poses=[eye, eye],
            transforms=[eye, eye],
            summary={"ate_rmse_m": 0.001},
        )
        data = json.loads(path.read_text())
        assert data["summary"]["ate_rmse_m"] == pytest.approx(0.001)
        assert len(data["estimated_poses"]) == 2


class TestMetrics:
    def test_ate_zero_for_identical(self, rng):
        from dense_visual_odometry_tpu.utils.lie import Pose

        poses = np.stack(
            [
                np.asarray(Pose.from_xi(rng.normal(scale=0.2, size=6).astype(np.float32)).matrix)
                for _ in range(6)
            ]
        ).astype(np.float64)
        ate, err = metrics.ate_rmse(poses, poses)
        assert ate == pytest.approx(0.0, abs=1e-9)

    def test_ate_alignment_removes_global_offset(self, rng):
        traj = np.tile(np.eye(4), (8, 1, 1))
        traj[:, :3, 3] = rng.normal(size=(8, 3))
        offset = np.eye(4)
        offset[:3, 3] = [10.0, -5.0, 2.0]
        moved = np.einsum("ij,njk->nik", offset, traj)
        ate_aligned, _ = metrics.ate_rmse(moved, traj, align=True)
        ate_raw, _ = metrics.ate_rmse(moved, traj, align=False)
        assert ate_aligned < 1e-9
        assert ate_raw > 1.0

    def test_rpe_identity(self):
        traj = np.tile(np.eye(4), (5, 1, 1))
        traj[:, 0, 3] = np.arange(5)  # constant velocity in x
        t_err, r_err = metrics.rpe(traj, traj)
        assert t_err == pytest.approx(0.0, abs=1e-12)
        assert r_err == pytest.approx(0.0, abs=1e-12)

    def test_per_frame_errors(self):
        a = np.tile(np.eye(4), (3, 1, 1))
        b = a.copy()
        b[:, 0, 3] = 0.5
        trans, rot = metrics.per_frame_errors(a, b)
        np.testing.assert_allclose(trans, 0.5)
        np.testing.assert_allclose(rot, 0.0, atol=1e-12)


class TestBenchmarkCLI:
    def test_cli_on_bundled(self, tmp_path, test_data_dir, capsys):
        from dense_visual_odometry_tpu.apps import benchmark

        args = benchmark.parse_args(
            ["test", "-d", str(test_data_dir), "--size", "3", "-o", str(tmp_path)]
        )
        summary = benchmark.run(args)
        assert summary["frames"] == 3
        assert "ate_rmse_m" in summary
        assert (tmp_path / "trajectory.txt").exists()
        assert (tmp_path / "report.json").exists()
