"""Pose-graph GN tests: exact recovery, loop closure, noise averaging."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dense_visual_odometry_tpu.models.posegraph import (
    PoseGraphEdges,
    concat_edges,
    edge_residual,
    odometry_chain_edges,
    optimize_pose_graph,
)
from dense_visual_odometry_tpu.utils.lie import se3

se3_exp = jax.jit(se3.exp)


def _random_poses(rng, k, scale=0.4):
    return jnp.stack(
        [se3_exp(jnp.asarray(rng.normal(size=6) * scale, jnp.float32)) for _ in range(k)]
    )


def _chain_edges_from_poses(poses, info_scale=1.0):
    k = poses.shape[0]
    meas = jnp.stack(
        [se3.inverse(poses[t]) @ poses[t + 1] for t in range(k - 1)]
    )
    info = jnp.broadcast_to(jnp.eye(6) * info_scale, (k - 1, 6, 6)).astype(jnp.float32)
    return PoseGraphEdges(
        i=jnp.arange(k - 1, dtype=jnp.int32),
        j=jnp.arange(1, k, dtype=jnp.int32),
        measurement=meas,
        information=info,
    )


class TestEdgeResidual:
    def test_zero_at_consistency(self, rng):
        x_i = se3_exp(jnp.asarray(rng.normal(size=6) * 0.3, jnp.float32))
        x_j = se3_exp(jnp.asarray(rng.normal(size=6) * 0.3, jnp.float32))
        z = se3.inverse(x_i) @ x_j
        r = jax.jit(edge_residual)(x_i, x_j, z)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-5)


class TestOptimize:
    def test_perfect_chain_unchanged(self, rng):
        gt = _random_poses(rng, 5)
        edges = _chain_edges_from_poses(gt)
        out = optimize_pose_graph(gt, edges, max_iterations=5)
        assert float(out.chi2) < 1e-6
        np.testing.assert_allclose(np.asarray(out.poses), np.asarray(gt), atol=1e-4)

    def test_corrupted_init_recovers(self, rng):
        """Chain measurements are exact; initial poses are perturbed ->
        optimization must snap them back (up to the fixed gauge pose 0)."""
        gt = _random_poses(rng, 6)
        edges = _chain_edges_from_poses(gt)
        noisy = jnp.stack(
            [gt[0]]
            + [
                se3_exp(jnp.asarray(rng.normal(size=6) * 0.05, jnp.float32)) @ gt[t]
                for t in range(1, 6)
            ]
        )
        out = optimize_pose_graph(noisy, edges, max_iterations=20)
        assert float(out.chi2) < 1e-6
        for t in range(6):
            rel_est = se3.inverse(out.poses[0]) @ out.poses[t]
            rel_gt = se3.inverse(gt[0]) @ gt[t]
            np.testing.assert_allclose(
                np.asarray(rel_est), np.asarray(rel_gt), atol=1e-3
            )

    def test_loop_closure_distributes_drift(self, rng):
        """A drifted odometry chain plus an exact loop-closure edge: the
        final pose must move toward the loop-closure constraint."""
        k = 5
        gt = _random_poses(rng, k, scale=0.3)
        chain = _chain_edges_from_poses(gt, info_scale=1.0)
        # Corrupt one chain measurement (simulated drift).
        drift = se3_exp(jnp.asarray([0.05, 0, 0, 0, 0, 0.02], jnp.float32))
        meas = chain.measurement.at[2].set(chain.measurement[2] @ drift)
        chain = chain._replace(measurement=meas)
        # Exact, strongly weighted loop closure 0 -> k-1.
        loop = PoseGraphEdges(
            i=jnp.asarray([0], jnp.int32),
            j=jnp.asarray([k - 1], jnp.int32),
            measurement=(se3.inverse(gt[0]) @ gt[k - 1])[None],
            information=(jnp.eye(6) * 100.0)[None].astype(jnp.float32),
        )
        edges = concat_edges(chain, loop)
        # Integrate the drifted chain for the init.
        init = [gt[0]]
        for t in range(k - 1):
            init.append(init[-1] @ chain.measurement[t])
        init = jnp.stack(init)

        err_before = np.linalg.norm(
            np.asarray(init[-1][:3, 3] - gt[-1][:3, 3])
        )
        out = optimize_pose_graph(init, edges, max_iterations=20)
        err_after = np.linalg.norm(
            np.asarray(out.poses[-1][:3, 3] - gt[-1][:3, 3])
        )
        assert err_after < err_before * 0.2
        assert float(out.chi2) < float("inf")

    def test_odometry_chain_edges_convention(self, rng):
        """odometry_chain_edges converts tracker transforms (prev->curr
        camera) into relative poses correctly: integrating them must
        reproduce pose composition ``pose @ T^-1``."""
        n = 4
        transforms = jnp.stack(
            [se3_exp(jnp.asarray(rng.normal(size=6) * 0.1, jnp.float32)) for _ in range(n)]
        )
        edges = odometry_chain_edges(transforms)
        pose = jnp.eye(4)
        poses = [pose]
        for t in range(n):
            pose = pose @ se3.inverse(transforms[t])
            poses.append(pose)
        for t in range(n):
            r = edge_residual(poses[t], poses[t + 1], edges.measurement[t])
            np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-5)

    def test_information_weighting(self, rng):
        """Two conflicting edges between the same pair: the solution must
        land near the strongly weighted one."""
        x0 = jnp.eye(4)
        t_strong = se3_exp(jnp.asarray([0.1, 0, 0, 0, 0, 0], jnp.float32))
        t_weak = se3_exp(jnp.asarray([0.3, 0, 0, 0, 0, 0], jnp.float32))
        edges = PoseGraphEdges(
            i=jnp.asarray([0, 0], jnp.int32),
            j=jnp.asarray([1, 1], jnp.int32),
            measurement=jnp.stack([t_strong, t_weak]),
            information=jnp.stack(
                [jnp.eye(6) * 100.0, jnp.eye(6) * 1.0]
            ).astype(jnp.float32),
        )
        init = jnp.stack([x0, t_weak])
        out = optimize_pose_graph(init, edges, max_iterations=15)
        x1 = float(out.poses[1][0, 3])
        assert x1 == pytest.approx(0.1, abs=0.02)
