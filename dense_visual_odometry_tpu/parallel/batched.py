"""Batched + sharded multi-pair tracking (data parallelism over frame pairs).

The reference is strictly sequential over frames with parallelism only
inside a frame (SURVEY §2 parallelism accounting — no multi-device or
multi-process capability of any kind).  The TPU-native scaling model
(BASELINE.json configs 3/5) batches *independent frame-pair alignments*:

- ``vmap`` turns the single-pair coarse-to-fine GN cascade into a batched
  cascade — one compiled program solving B alignments at once, with every
  per-pair ``while_loop`` running under vmap as a masked lockstep loop;
- a 1-D ``jax.sharding.Mesh`` over all devices shards the batch dimension
  (pure data parallelism: pairs are independent, so the only collectives
  XLA inserts are for the scalar diagnostics if the caller reduces them).

This is the unit the distributed backend builds on: windowed BA reduces
per-pair normal equations with ``psum`` over the same mesh.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dense_visual_odometry_tpu.camera import CameraModel
from dense_visual_odometry_tpu.config import RobustDVOConfig
from dense_visual_odometry_tpu.models.robust import (
    FrameData,
    TrackResult,
    track_pair,
)

BATCH_AXIS = "data"


def make_mesh(devices=None, axis_name: str = BATCH_AXIS) -> Mesh:
    """A 1-D device mesh over all (or the given) devices."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def stack_frame_data(frames) -> FrameData:
    """Stack per-pair ``FrameData`` pytrees into one batched ``FrameData``."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *frames)


def shard_batch(tree, mesh: Mesh, axis_name: str = BATCH_AXIS):
    """Place a batched pytree so its leading axis is split across the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


@functools.partial(jax.jit, static_argnames=("cfg",))
def batched_track_pair(
    prev: FrameData,
    curr: FrameData,
    intrinsics: jnp.ndarray,
    cfg: RobustDVOConfig,
    init_guess: Optional[jnp.ndarray] = None,
    last_transform: Optional[jnp.ndarray] = None,
) -> TrackResult:
    """Track B independent frame pairs in one compiled program.

    prev / curr : ``FrameData`` whose leaves have a leading batch axis B.
    intrinsics : (3, 3) shared or (B, 3, 3) per-pair.
    init_guess / last_transform : optional (B, 4, 4).

    The solver is natively batched (batch dims ride inside every tensor
    op, one ``while_loop`` with per-pair convergence masks) — NOT
    ``vmap``-of-control-flow, which multiplies XLA compile time with B.
    """
    camera = CameraModel(intrinsics=intrinsics, depth_scale=1.0)
    return track_pair(
        prev, curr, camera, cfg,
        init_guess=init_guess, last_transform=last_transform,
    )


def make_batched_tracker(
    cfg: RobustDVOConfig, mesh: Optional[Mesh] = None, axis_name: str = BATCH_AXIS
):
    """A jitted batched tracker, optionally sharded over a device mesh.

    With a mesh, inputs get batch-axis shardings and the jitted program is
    constrained so each device solves its shard of pairs; without one it is
    plain single-device vmap.
    """
    if mesh is None:
        def run(prev, curr, intrinsics, **kw):
            return batched_track_pair(prev, curr, intrinsics, cfg, **kw)

        return run

    sharding = NamedSharding(mesh, P(axis_name))

    def run(prev, curr, intrinsics, **kw):
        prev = jax.tree.map(lambda x: jax.device_put(x, sharding), prev)
        curr = jax.tree.map(lambda x: jax.device_put(x, sharding), curr)
        return batched_track_pair(prev, curr, jnp.asarray(intrinsics, jnp.float32), cfg, **kw)

    return run


def pad_batch_to_devices(frames, n_devices: int) -> Tuple[list, int]:
    """Pad a list of per-pair pytrees so the batch divides the device count.

    Returns (padded list, original length).  Padding repeats the last pair;
    callers slice results back to the original length.
    """
    orig = len(frames)
    if orig == 0:
        raise ValueError("empty batch")
    rem = (-orig) % n_devices
    return list(frames) + [frames[-1]] * rem, orig
