"""Dense BA vs motion-only pose-graph BA on a rendered synthetic sequence.

The VERDICT-r1 acceptance criterion for dense BA: on a synthetic sequence
with exact ground truth (io/synthetic renderer), dense photometric BA must
measurably beat the pose-graph backend's ATE.  A chain-only pose graph
cannot remove odometry noise (it has no redundant measurements — it just
re-composes the noisy chain), while dense BA re-observes the photometry
and pulls every pose back to the scene.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dense_visual_odometry_tpu.io import load_bundled_sequence, synthetic
from dense_visual_odometry_tpu.models import posegraph
from dense_visual_odometry_tpu.models.dense_ba import (
    DenseBAConfig,
    build_dense_ba_data,
    optimize_dense_ba,
)
from dense_visual_odometry_tpu.ops import pyramid as pyr_ops
from dense_visual_odometry_tpu.utils.lie import se3


def _ate(poses, gt):
    return float(
        np.sqrt(np.mean(np.sum((poses[:, :3, 3] - gt[:, :3, 3]) ** 2, -1)))
    )


@pytest.fixture(scope="module")
def rendered(test_data_dir):
    """K synthetic views of the first bundled real frame, exact GT."""
    import cv2

    seq = load_bundled_sequence(test_data_dir)
    rgb, depth_raw = seq.frame(0)
    gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY).astype(np.float32)
    depth = depth_raw.astype(np.float32) * seq.camera.depth_scale
    # Half resolution for speed: median-decimate like the tracker.
    gray_h = np.asarray(pyr_ops.build_pyramid(jnp.asarray(gray), 2)[1])
    depth_h = np.asarray(pyr_ops.build_pyramid(jnp.asarray(depth), 2)[1])
    k_half = np.asarray(seq.camera.at(1), np.float32)

    k_frames = 5
    gt_poses = synthetic.orbit_trajectory(
        k_frames, radius=0.03, angle=0.03, advance=0.015
    )
    grays, depths = synthetic.render_sequence(gray_h, depth_h, k_half, gt_poses)
    return grays, depths, gt_poses.astype(np.float32), k_half


class TestDenseBAvsPoseGraph:
    def test_dense_ba_beats_pose_graph(self, rendered):
        grays, depths, gt, k_mat = rendered
        k = len(grays)
        rng = np.random.default_rng(7)

        # Noisy odometry: corrupt each GT relative motion, compose.
        noisy = [np.eye(4)]
        rel_meas = []
        for i in range(1, k):
            rel = np.linalg.inv(gt[i - 1]) @ gt[i]
            xi = np.asarray(se3.log(jnp.asarray(rel, jnp.float32)), np.float64)
            xi[:3] += rng.normal(0, 0.004, 3)
            xi[3:] += rng.normal(0, 0.002, 3)
            rel_n = np.asarray(se3.exp(jnp.asarray(xi, jnp.float32)), np.float64)
            rel_meas.append(rel_n)
            noisy.append(noisy[-1] @ rel_n)
        noisy = np.stack(noisy).astype(np.float32)
        ate_init = _ate(noisy, gt)
        assert ate_init > 2e-3  # the corruption is non-trivial

        # Motion-only pose graph over the SAME noisy chain: chain-only
        # measurements carry no redundancy, so ATE cannot improve.
        edges = posegraph.PoseGraphEdges(
            i=jnp.arange(k - 1, dtype=jnp.int32),
            j=jnp.arange(1, k, dtype=jnp.int32),
            measurement=jnp.asarray(np.stack(rel_meas), jnp.float32),
            information=jnp.broadcast_to(
                jnp.eye(6, dtype=jnp.float32), (k - 1, 6, 6)
            ),
        )
        pg = posegraph.optimize_pose_graph(
            jnp.asarray(noisy), edges, max_iterations=10
        )
        ate_pg = _ate(np.asarray(pg.poses), gt)

        # Dense BA from the same initialization.
        data = build_dense_ba_data(
            grays, depths, k_mat, grid_stride=8, window=2
        )
        # Strong depth anchors: the rendered depth is exact, so keeping
        # rho near measurement stops depth from absorbing pose error
        # (measured: ATE 3.5 mm with the default anchor, 2.2 mm with 1e3).
        out = optimize_dense_ba(
            jnp.asarray(noisy), data,
            DenseBAConfig(max_iterations=20, depth_anchor_weight=1e3),
        )
        ate_dense = _ate(np.asarray(out.poses), gt)

        # Dense BA must substantially beat both the initialization and
        # the pose-graph result.
        assert ate_dense < 0.5 * ate_init
        assert ate_dense < 0.5 * ate_pg
        hist = np.asarray(out.chi2_history)
        assert hist[-1] < hist[0]
