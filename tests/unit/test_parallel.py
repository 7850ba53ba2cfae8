"""Batched (vmap) and sharded (8-device CPU mesh) tracking tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dense_visual_odometry_tpu.camera import CameraModel
from dense_visual_odometry_tpu.config import RobustDVOConfig
from dense_visual_odometry_tpu.models.robust import FrameData, track_pair
from dense_visual_odometry_tpu.ops import pyramid as pyr_ops
from dense_visual_odometry_tpu.parallel import (
    batched_track_pair,
    make_batched_tracker,
    make_mesh,
    shard_batch,
    stack_frame_data,
)

H, W = 64, 96
K = np.array(
    [[80.0, 0.0, (W - 1) / 2], [0.0, 80.0, (H - 1) / 2], [0.0, 0.0, 1.0]],
    dtype=np.float32,
)
Z0 = 2.0


def _pair(tx):
    v, u = np.meshgrid(
        np.arange(H, dtype=np.float64), np.arange(W, dtype=np.float64), indexing="ij"
    )
    tex = lambda uu, vv: (
        120.0 + 50.0 * np.sin(2 * np.pi * uu / 23.0) + 40.0 * np.cos(2 * np.pi * vv / 17.0)
    )
    s = K[0, 0] * tx / Z0
    g1 = tex(u, v).astype(np.float32)
    g2 = tex(u - s, v).astype(np.float32)
    d = np.full((H, W), Z0, np.float32)
    return g1, g2, d


def _fd(gray, depth, levels):
    return FrameData(
        gray=pyr_ops.build_pyramid(jnp.asarray(gray), levels),
        depth_m=pyr_ops.build_pyramid(jnp.asarray(depth), levels),
    )


CFG = RobustDVOConfig(levels=2, max_iterations=30, tolerance=1e-8)


@pytest.fixture(scope="module")
def batch8():
    txs = [0.005 * (i - 3.5) for i in range(8)]
    prevs, currs = [], []
    for tx in txs:
        g1, g2, d = _pair(tx)
        prevs.append(_fd(g1, d, CFG.levels))
        currs.append(_fd(g2, d, CFG.levels))
    return txs, stack_frame_data(prevs), stack_frame_data(currs)


class TestBatchedTracking:
    def test_vmap_matches_single(self, batch8):
        txs, prev_b, curr_b = batch8
        result = batched_track_pair(prev_b, curr_b, jnp.asarray(K), CFG)
        assert result.transform.shape == (8, 4, 4)
        assert bool(jnp.all(result.success))
        for i, tx in enumerate(txs):
            assert float(result.transform[i, 0, 3]) == pytest.approx(tx, abs=2e-3)

        # Against the single-pair path.
        camera = CameraModel.create(K, 1.0)
        single = track_pair(
            jax.tree.map(lambda x: x[0], prev_b),
            jax.tree.map(lambda x: x[0], curr_b),
            camera,
            CFG,
        )
        np.testing.assert_allclose(
            np.asarray(single.transform),
            np.asarray(result.transform[0]),
            atol=1e-5,
        )

    def test_per_pair_intrinsics(self, batch8):
        txs, prev_b, curr_b = batch8
        ks = jnp.broadcast_to(jnp.asarray(K), (8, 3, 3))
        result = batched_track_pair(prev_b, curr_b, ks, CFG)
        assert bool(jnp.all(result.success))


class TestShardedTracking:
    def test_mesh_sharded_batch(self, batch8):
        if jax.device_count() < 8:
            pytest.skip("needs 8 simulated devices")
        txs, prev_b, curr_b = batch8
        mesh = make_mesh()
        tracker = make_batched_tracker(CFG, mesh=mesh)
        result = tracker(prev_b, curr_b, K)
        assert bool(jnp.all(result.success))
        for i, tx in enumerate(txs):
            assert float(result.transform[i, 0, 3]) == pytest.approx(tx, abs=2e-3)

    def test_sharding_actually_splits(self, batch8):
        if jax.device_count() < 8:
            pytest.skip("needs 8 simulated devices")
        _, prev_b, _ = batch8
        mesh = make_mesh()
        sharded = shard_batch(prev_b, mesh)
        shard_list = sharded.gray[0].addressable_shards
        assert len(shard_list) == 8
        assert shard_list[0].data.shape[0] == 1  # 8-batch split 8 ways
