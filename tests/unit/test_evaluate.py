"""Trajectory-evaluation CLI + robust pose-graph kernel tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dense_visual_odometry_tpu.io import trajectory
from dense_visual_odometry_tpu.models.posegraph import (
    PoseGraphEdges,
    optimize_pose_graph,
)
from dense_visual_odometry_tpu.utils.lie import se3


class TestEvaluateCLI:
    def _write(self, path, ts, poses):
        trajectory.save_tum_trajectory(path, ts, poses)

    def test_identical_trajectories(self, tmp_path, capsys):
        from dense_visual_odometry_tpu.apps import evaluate

        n = 8
        poses = np.tile(np.eye(4), (n, 1, 1))
        poses[:, 0, 3] = np.linspace(0, 1, n)
        ts = np.arange(n, dtype=float)
        self._write(tmp_path / "a.txt", ts, poses)
        self._write(tmp_path / "b.txt", ts, poses)
        rc = evaluate.main([str(tmp_path / "a.txt"), str(tmp_path / "b.txt")])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["pairs"] == n
        assert out["ate_rmse_m"] == pytest.approx(0.0, abs=1e-5)

    def test_offset_association_and_error(self, tmp_path, capsys):
        from dense_visual_odometry_tpu.apps import evaluate

        n = 6
        gt = np.tile(np.eye(4), (n, 1, 1))
        gt[:, 0, 3] = np.arange(n, dtype=float)
        est = gt.copy()
        est[:, 1, 3] += 0.1  # constant offset, removed by alignment
        ts = np.arange(n, dtype=float)
        self._write(tmp_path / "est.txt", ts + 0.005, est)  # slight ts jitter
        self._write(tmp_path / "gt.txt", ts, gt)
        evaluate.main(
            [str(tmp_path / "est.txt"), str(tmp_path / "gt.txt")]
        )
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["pairs"] == n
        assert out["ate_rmse_m"] == pytest.approx(0.0, abs=1e-4)  # aligned
        # Unaligned keeps the offset.
        evaluate.main(
            [str(tmp_path / "est.txt"), str(tmp_path / "gt.txt"), "--no-align"]
        )
        out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out2["ate_rmse_m"] == pytest.approx(0.1, abs=1e-3)

    def test_no_association(self, tmp_path, capsys):
        from dense_visual_odometry_tpu.apps import evaluate

        poses = np.tile(np.eye(4), (3, 1, 1))
        self._write(tmp_path / "a.txt", [0.0, 1.0, 2.0], poses)
        self._write(tmp_path / "b.txt", [100.0, 101.0, 102.0], poses)
        rc = evaluate.main([str(tmp_path / "a.txt"), str(tmp_path / "b.txt")])
        assert rc == 1


class TestRobustPoseGraph:
    def test_outlier_loop_closure_downweighted(self, rng):
        """A wildly wrong loop closure must not shatter the solution when
        the Huber kernel is on."""
        k = 5
        se3_exp = jax.jit(se3.exp)
        gt = jnp.stack(
            [se3_exp(jnp.asarray(rng.normal(size=6) * 0.2, jnp.float32)) for _ in range(k)]
        )
        meas = jnp.stack([se3.inverse(gt[t]) @ gt[t + 1] for t in range(k - 1)])
        bogus = se3_exp(jnp.asarray([1.0, -1.0, 0.5, 0.4, -0.3, 0.2], jnp.float32))
        edges = PoseGraphEdges(
            i=jnp.asarray(list(range(k - 1)) + [0], jnp.int32),
            j=jnp.asarray(list(range(1, k)) + [k - 1], jnp.int32),
            measurement=jnp.concatenate([meas, bogus[None]]),
            information=jnp.broadcast_to(jnp.eye(6, dtype=jnp.float32), (k, 6, 6)),
        )
        out_plain = optimize_pose_graph(gt, edges, max_iterations=15)
        out_robust = optimize_pose_graph(
            gt, edges, max_iterations=15, robust_delta=0.3
        )

        def max_err(poses):
            errs = []
            for t in range(k):
                rel = se3.inverse(poses[0]) @ poses[t]
                rel_gt = se3.inverse(gt[0]) @ gt[t]
                errs.append(
                    float(jnp.linalg.norm(se3.log(se3.inverse(rel_gt) @ rel)))
                )
            return max(errs)

        assert max_err(out_robust.poses) < 0.05
        assert max_err(out_plain.poses) > 2 * max_err(out_robust.poses)
