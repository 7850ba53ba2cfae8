"""Visualizer + profiling utility tests."""

import json

import numpy as np
import pytest

from dense_visual_odometry_tpu.utils.profiling import WallClock, device_memory_stats


class TestVisualize:
    @pytest.fixture()
    def report(self, tmp_path):
        n = 6
        poses = np.tile(np.eye(4), (n, 1, 1))
        poses[:, 0, 3] = np.linspace(0, 0.5, n)
        data = {
            "sequence": {"type": "test"},
            "timestamps": list(range(n)),
            "estimated_poses": poses.tolist(),
            "transformations": poses.tolist(),
            "ground_truth_poses": poses.tolist(),
        }
        p = tmp_path / "report.json"
        p.write_text(json.dumps(data))
        return p

    def test_plot_from_report(self, report, tmp_path):
        from dense_visual_odometry_tpu.apps import visualize

        out = visualize.main(["report", str(report), "-o", str(tmp_path / "t.png")])
        assert out.exists()
        assert out.stat().st_size > 1000

    def test_trajectory_mode(self, tmp_path):
        from dense_visual_odometry_tpu.apps import visualize
        from dense_visual_odometry_tpu.io import trajectory

        poses = np.tile(np.eye(4), (4, 1, 1))
        traj = trajectory.save_tum_trajectory(
            tmp_path / "traj.txt", np.arange(4.0), poses
        )
        out = visualize.main(["trajectory", str(traj), "-o", str(tmp_path / "t.png")])
        assert out.exists()

    def test_ply_cloud(self, report, tmp_path, test_data_dir):
        from dense_visual_odometry_tpu.apps import visualize

        ply = tmp_path / "c.ply"
        visualize.main(
            ["report", str(report), "-o", str(tmp_path / "t.png"),
             "--ply", str(ply), "--benchmark", "test",
             "--stride", "5", "--max-points", "5000"]
        )
        text = ply.read_text()
        assert text.startswith("ply")
        assert "element vertex 5000" in text

    def test_animated_replay(self, report, tmp_path):
        from dense_visual_odometry_tpu.apps import visualize

        gif = tmp_path / "replay.gif"
        visualize.main(
            ["report", str(report), "-o", str(tmp_path / "t.png"),
             "--animate", str(gif), "--animate-stride", "3",
             "--max-points", "2000"]
        )
        data = gif.read_bytes()
        assert data[:6] in (b"GIF87a", b"GIF89a")
        assert len(data) > 5000

    def test_missing_file(self):
        from dense_visual_odometry_tpu.apps import visualize

        with pytest.raises(FileNotFoundError):
            visualize.main(["report", "/nonexistent/report.json"])


class TestProfiling:
    def test_wallclock_summary(self):
        clock = WallClock()
        for _ in range(5):
            with clock.span("phase"):
                pass
        s = clock.summary()["phase"]
        assert s["count"] == 5
        assert s["mean_ms"] >= 0.0
        assert s["p95_ms"] >= s["p50_ms"]

    def test_wallclock_add(self):
        clock = WallClock()
        clock.add("x", 0.5)
        clock.add("x", 0.1)
        s = clock.summary(skip_first=False)["x"]
        assert s["total_s"] == pytest.approx(0.6)

    def test_trace_annotation_noop(self):
        from dense_visual_odometry_tpu.utils.profiling import annotate, trace_span

        with trace_span("test"):
            x = 1 + 1

        @annotate("fn")
        def f(a):
            return a * 2

        assert f(21) == 42

    def test_memory_stats_shape(self):
        stats = device_memory_stats()
        assert stats is None or isinstance(stats, dict)
