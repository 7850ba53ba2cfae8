"""Batched multi-stream odometry: track B independent cameras per chip.

Production-serving counterpart of :class:`~.session.OdometrySession`
(BASELINE.json config 3: "batched multi-pair tracking ... per chip"): B
RGB-D streams advance in lockstep through ONE jitted step — preprocessing,
the natively-batched coarse-to-fine solve, per-stream pose composition and
per-stream conditional state commits all fuse into a single program, so a
chip serves B cameras at nearly the throughput of one.

Per-stream tracking-loss semantics match the single-stream session: a
failed stream keeps its pose and reference frame while the others
advance; `reset_stream` re-seeds one stream without touching the rest.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dense_visual_odometry_tpu.camera import CameraModel
from dense_visual_odometry_tpu.config import RobustDVOConfig
from dense_visual_odometry_tpu.models.robust import (
    FrameData,
    TrackResult,
    preprocess_frame,
    track_pair,
)
from dense_visual_odometry_tpu.utils.lie import se3


class BatchedSessionState(NamedTuple):
    """Device-resident per-stream state; every leaf has leading dim B."""

    pose: jnp.ndarray  # (B, 4, 4)
    last_transform: jnp.ndarray  # (B, 4, 4)
    prev: FrameData  # leaves (B, H, W) per level
    initialized: jnp.ndarray  # (B,) bool


class BatchedStepOutput(NamedTuple):
    pose: jnp.ndarray  # (B, 4, 4)
    transform: jnp.ndarray  # (B, 4, 4)
    success: jnp.ndarray  # (B,) bool
    result: TrackResult


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def batched_session_step(
    state: BatchedSessionState,
    images: jnp.ndarray,
    depths_raw: jnp.ndarray,
    intrinsics: jnp.ndarray,
    depth_scale: jnp.ndarray,
    cfg: RobustDVOConfig,
) -> Tuple[BatchedSessionState, BatchedStepOutput]:
    """Advance all B streams by one frame.

    images : (B, H, W, 3) RGB or (B, H, W) gray.
    depths_raw : (B, H, W) raw depth DN.
    intrinsics : (3, 3) shared or (B, 3, 3) per-stream.
    """
    camera = CameraModel(intrinsics=intrinsics, depth_scale=depth_scale)
    curr = preprocess_frame(
        images, depths_raw, camera,
        levels=cfg.levels, max_distance=cfg.max_distance,
        quantize=cfg.quantize_intensity,
    )

    batch = state.pose.shape[0]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (batch, 4, 4))
    init = state.last_transform if cfg.constant_velocity_init else eye
    result = track_pair(
        state.prev, curr, camera, cfg,
        init_guess=init, last_transform=state.last_transform,
    )

    curr_usable = jnp.sum(curr.depth_m[0] > 0.0, axis=(-2, -1)) >= 16
    is_first = ~state.initialized
    sel = is_first[:, None, None]
    transform = jnp.where(sel, eye, result.transform)
    success = (is_first | result.success) & curr_usable

    new_pose = jnp.where(
        success[:, None, None], state.pose @ se3.inverse(transform), state.pose
    )
    new_prev = jax.tree.map(
        lambda new, old: jnp.where(
            success.reshape((batch,) + (1,) * (new.ndim - 1)), new, old
        ),
        curr,
        state.prev,
    )
    new_last = jnp.where(success[:, None, None], transform, state.last_transform)

    new_state = BatchedSessionState(
        pose=new_pose,
        last_transform=new_last,
        prev=new_prev,
        initialized=state.initialized | curr_usable,
    )
    return new_state, BatchedStepOutput(
        pose=new_pose, transform=transform, success=success, result=result
    )


def init_batched_state(
    batch: int, height: int, width: int, levels: int, init_poses=None
) -> BatchedSessionState:
    def zeros_pyramid():
        out, h, w = [], height, width
        for _ in range(levels):
            out.append(jnp.zeros((batch, h, w), jnp.float32))
            h, w = -(-h // 2), -(-w // 2)
        return tuple(out)

    poses = (
        jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (batch, 4, 4)) + 0.0
        if init_poses is None
        else jnp.asarray(init_poses, jnp.float32)
    )
    return BatchedSessionState(
        pose=poses,
        last_transform=jnp.broadcast_to(
            jnp.eye(4, dtype=jnp.float32), (batch, 4, 4)
        ) + 0.0,
        prev=FrameData(gray=zeros_pyramid(), depth_m=zeros_pyramid()),
        initialized=jnp.zeros((batch,), bool),
    )


class BatchedOdometrySession:
    """Host-facing multi-stream session.

    >>> sessions = BatchedOdometrySession(camera, cfg, batch=32)
    >>> poses = sessions.step(rgb_batch, depth_batch)   # (32, 4, 4)
    """

    def __init__(
        self,
        camera: CameraModel,
        config: Optional[RobustDVOConfig] = None,
        batch: Optional[int] = None,
    ):
        self.camera = camera
        self.config = config or RobustDVOConfig(levels=4, use_weighter=True)
        self._batch = batch
        self._state: Optional[BatchedSessionState] = None
        self._intrinsics = jnp.asarray(camera.intrinsics, jnp.float32)
        self._depth_scale = jnp.float32(camera.depth_scale)
        self.last_output: Optional[BatchedStepOutput] = None

    def step(self, images, depths) -> jnp.ndarray:
        """Advance all streams; returns (B, 4, 4) camera-to-world poses."""
        images = jnp.asarray(images)
        depths = jnp.asarray(depths)
        if self._state is None:
            b, h, w = depths.shape[0], depths.shape[-2], depths.shape[-1]
            if self._batch is not None and b != self._batch:
                raise ValueError(f"expected batch {self._batch}, got {b}")
            self._state = init_batched_state(b, h, w, self.config.levels)
        self._state, out = batched_session_step(
            self._state, images, depths, self._intrinsics, self._depth_scale,
            self.config,
        )
        self.last_output = out
        return out.pose

    def reset_stream(self, index: int, init_pose=None) -> None:
        """Re-seed one stream (pose to identity/init, state cleared)."""
        if self._state is None:
            return
        pose = (
            jnp.eye(4, dtype=jnp.float32)
            if init_pose is None
            else jnp.asarray(init_pose, jnp.float32)
        )
        s = self._state
        self._state = BatchedSessionState(
            pose=s.pose.at[index].set(pose),
            last_transform=s.last_transform.at[index].set(
                jnp.eye(4, dtype=jnp.float32)
            ),
            prev=s.prev,
            initialized=s.initialized.at[index].set(False),
        )

    @property
    def poses(self) -> Optional[jnp.ndarray]:
        return None if self._state is None else self._state.pose
