"""Distributed (edge-sharded, psum-reduced) pose-graph BA on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dense_visual_odometry_tpu.models.posegraph import (
    PoseGraphEdges,
    optimize_pose_graph,
)
from dense_visual_odometry_tpu.parallel.batched import make_mesh
from dense_visual_odometry_tpu.parallel.distributed import (
    optimize_pose_graph_sharded,
    pad_edges,
)
from dense_visual_odometry_tpu.utils.lie import se3

se3_exp = jax.jit(se3.exp)

needs_mesh = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 simulated devices"
)


def _graph(rng, k=6, extra_edges=5):
    gt = jnp.stack(
        [se3_exp(jnp.asarray(rng.normal(size=6) * 0.3, jnp.float32)) for _ in range(k)]
    )
    i_list = list(range(k - 1))
    j_list = list(range(1, k))
    for _ in range(extra_edges):
        a, b = sorted(rng.choice(k, size=2, replace=False))
        i_list.append(int(a))
        j_list.append(int(b))
    i = jnp.asarray(i_list, jnp.int32)
    j = jnp.asarray(j_list, jnp.int32)
    meas = jax.vmap(lambda a, b: se3.inverse(gt[a]) @ gt[b])(i, j)
    info = jnp.broadcast_to(jnp.eye(6, dtype=jnp.float32), (len(i_list), 6, 6))
    edges = PoseGraphEdges(i=i, j=j, measurement=meas, information=info)
    noisy = jnp.stack(
        [gt[0]]
        + [
            se3_exp(jnp.asarray(rng.normal(size=6) * 0.05, jnp.float32)) @ gt[t]
            for t in range(1, k)
        ]
    )
    return gt, noisy, edges


class TestPadEdges:
    def test_padding_noop_contribution(self, rng):
        gt, noisy, edges = _graph(rng)
        padded = pad_edges(edges, 8)
        assert padded.i.shape[0] % 8 == 0
        out_a = optimize_pose_graph(noisy, edges, max_iterations=10)
        out_b = optimize_pose_graph(noisy, padded, max_iterations=10)
        np.testing.assert_allclose(
            np.asarray(out_a.poses), np.asarray(out_b.poses), atol=1e-5
        )


@needs_mesh
class TestShardedBA:
    def test_matches_single_device(self, rng):
        gt, noisy, edges = _graph(rng)
        mesh = make_mesh()
        out_s = optimize_pose_graph_sharded(mesh, noisy, edges, max_iterations=15)
        out_r = optimize_pose_graph(noisy, pad_edges(edges, 8), max_iterations=15)
        np.testing.assert_allclose(
            np.asarray(out_s.poses), np.asarray(out_r.poses), atol=1e-4
        )
        assert float(out_s.chi2) < 1e-5

    def test_recovers_relative_structure(self, rng):
        gt, noisy, edges = _graph(rng, k=8, extra_edges=8)
        mesh = make_mesh()
        out = optimize_pose_graph_sharded(mesh, noisy, edges, max_iterations=20)
        for t in range(8):
            rel_est = se3.inverse(out.poses[0]) @ out.poses[t]
            rel_gt = se3.inverse(gt[0]) @ gt[t]
            np.testing.assert_allclose(
                np.asarray(rel_est), np.asarray(rel_gt), atol=1e-3
            )
