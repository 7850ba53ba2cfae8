"""Streaming odometry session: per-frame state machine around the tracker.

Capability parity with the reference's ``BaseDenseVisualOdometry.step``
(``/root/reference/src/dense_visual_odometry/core/base_dense_visual_odometry.py:54-87``):
gray conversion, depth clamping, first-frame identity, pose composition
``pose_t = pose_{t-1} @ transform^-1``, previous-frame retention, and
tracking-loss semantics (failed solves leave pose *and* the previous frame
untouched — "trying luck on next frame", :75-86).

TPU-native design: the entire step — preprocessing, pyramid build, the full
coarse-to-fine GN solve, pose composition, and the conditional state commit —
is ONE jitted program over a device-resident ``SessionState`` pytree.  The
host only uploads the raw frame and (optionally) reads back a 4x4 pose;
nothing pixel-sized ever crosses back.  Frame-over-frame state (previous
pyramids, pose, last transform) stays in HBM, replacing the reference's
host-side numpy attributes (and its GPU backend's per-frame UVM traffic).
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
from dense_visual_odometry_tpu.utils.lie import Pose, se3


class SessionState(NamedTuple):
    """Device-resident state carried between frames (a pytree)."""

    pose: jnp.ndarray  # (4, 4) current camera-to-world pose
    last_transform: jnp.ndarray  # (4, 4) last accepted frame-to-frame motion
    prev: FrameData  # previous frame's pyramids
    initialized: jnp.ndarray  # bool scalar: has a first frame been absorbed


class StepOutput(NamedTuple):
    pose: jnp.ndarray  # (4, 4) pose after this frame
    transform: jnp.ndarray  # (4, 4) frame-to-frame estimate (identity on frame 0)
    success: jnp.ndarray  # bool
    result: TrackResult  # full diagnostics


@functools.partial(
    jax.jit, static_argnames=("cfg", "use_cv_guess"), donate_argnums=(0,)
)
def session_step(
    state: SessionState,
    image: jnp.ndarray,
    depth_raw: jnp.ndarray,
    intrinsics: jnp.ndarray,
    depth_scale: jnp.ndarray,
    init_guess: jnp.ndarray,
    cfg: RobustDVOConfig,
    use_cv_guess: bool = False,
) -> Tuple[SessionState, StepOutput]:
    """One tracking step as a pure function (state donated / reused in place).

    image : (H, W, 3) RGB or (H, W) gray, any numeric dtype.
    depth_raw : (H, W) raw depth DN.

    ``use_cv_guess`` seeds the solve from ``state.last_transform``
    (constant-velocity warm start) and ignores ``init_guess``.  The choice
    happens INSIDE the jit because the state is donated — a caller passing
    ``state.last_transform`` as ``init_guess`` would hand the same buffer
    in twice (`f(donate(a), a)`, a runtime error).
    """
    camera = CameraModel(intrinsics=intrinsics, depth_scale=depth_scale)
    curr = preprocess_frame(
        image, depth_raw, camera,
        levels=cfg.levels, max_distance=cfg.max_distance,
        quantize=cfg.quantize_intensity,
    )

    result = track_pair(
        state.prev, curr, camera, cfg,
        init_guess=state.last_transform if use_cv_guess else init_guess,
        last_transform=state.last_transform,
    )

    eye = jnp.eye(4, dtype=jnp.float32)
    # A frame whose depth is (almost) entirely invalid can still *track*
    # (only the previous frame's depth enters the warp) but must not be
    # committed as the new reference frame — it would poison every later
    # solve.  The reference has no such guard (it would commit the bad
    # frame, base_…py:81-82); this is a deliberate robustness improvement.
    curr_usable = jnp.sum(curr.depth_m[0] > 0.0) >= 16
    is_first = ~state.initialized
    transform = jnp.where(is_first, eye, result.transform)
    success = (is_first | result.success) & curr_usable

    new_pose = jnp.where(success, state.pose @ se3.inverse(transform), state.pose)
    # Commit the new frame as "previous" only when tracking succeeded
    # (reference keeps the old frame on failure, base_…py:81-86).
    new_prev = jax.tree.map(
        lambda new, old: jnp.where(success, new, old), curr, state.prev
    )
    new_last = jnp.where(success, transform, state.last_transform)

    new_state = SessionState(
        pose=new_pose,
        last_transform=new_last,
        prev=new_prev,
        initialized=state.initialized | curr_usable,
    )
    out = StepOutput(
        pose=new_pose, transform=transform, success=success, result=result
    )
    return new_state, out


def init_state(height: int, width: int, levels: int, init_pose=None) -> SessionState:
    """Fresh session state with zeroed previous-frame pyramids."""

    def zeros_pyramid():
        out, h, w = [], height, width
        for _ in range(levels):
            out.append(jnp.zeros((h, w), jnp.float32))
            h, w = -(-h // 2), -(-w // 2)
        return tuple(out)

    # Distinct buffers: session_step donates the state, and donating the
    # same underlying buffer through two pytree leaves is an error.
    pose = (
        jnp.eye(4, dtype=jnp.float32)
        if init_pose is None
        else jnp.asarray(init_pose, jnp.float32)
    )
    return SessionState(
        pose=pose,
        last_transform=jnp.eye(4, dtype=jnp.float32),
        prev=FrameData(gray=zeros_pyramid(), depth_m=zeros_pyramid()),
        initialized=jnp.bool_(False),
    )


class OdometrySession:
    """Host-facing stateful wrapper: feed frames, read poses.

    >>> session = OdometrySession(camera, RobustDVOConfig(levels=4))
    >>> for rgb, depth in frames:
    ...     pose = session.step(rgb, depth)
    """

    def __init__(
        self,
        camera: CameraModel,
        config: Optional[RobustDVOConfig] = None,
        init_pose=None,
    ):
        self.camera = camera
        self.config = config or RobustDVOConfig()
        self._init_pose = init_pose
        self._state: Optional[SessionState] = None
        self._intrinsics = jnp.asarray(camera.intrinsics, jnp.float32)
        self._depth_scale = jnp.float32(camera.depth_scale)
        self.last_output: Optional[StepOutput] = None

    def reset(self) -> None:
        self._state = None
        self.last_output = None

    def step(self, image, depth, init_guess=None) -> Pose:
        """Track one frame; returns the current camera-to-world pose.

        The returned ``Pose`` wraps a device array — it does not block.
        Diagnostics for the step are in :attr:`last_output`.
        """
        image = jnp.asarray(image)
        depth = jnp.asarray(depth)
        if self._state is None:
            h, w = depth.shape[-2], depth.shape[-1]
            self._state = init_state(h, w, self.config.levels, self._init_pose)
        use_cv = init_guess is None and self.config.constant_velocity_init
        if init_guess is not None:
            # An explicit caller guess (e.g. IMU prediction) always wins.
            guess = jnp.asarray(init_guess, jnp.float32)
        else:
            # With use_cv the guess is read from the (donated) state inside
            # the jit; this identity is just a placeholder argument.
            guess = jnp.eye(4, dtype=jnp.float32)
        self._state, out = session_step(
            self._state, image, depth, self._intrinsics, self._depth_scale,
            guess, self.config, use_cv_guess=use_cv,
        )
        self.last_output = out
        return Pose(out.pose)

    @property
    def current_pose(self) -> Pose:
        if self._state is None:
            return Pose(
                jnp.eye(4, dtype=jnp.float32)
                if self._init_pose is None
                else jnp.asarray(self._init_pose, jnp.float32)
            )
        return Pose(self._state.pose)
