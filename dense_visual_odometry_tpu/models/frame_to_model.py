"""Frame-to-model tracking: align each frame against the TSDF itself.

Beyond-reference capability (the reference has no mapping at all —
`/root/reference/src/visualize.py:110-188` is a view-only point-cloud
viewer) and the closure of this framework's own mapping axis: keyframe
SLAM tracks against a STALE raw frame until promotion, so its per-frame
reference carries that frame's sensor noise and holes; here the tracking
reference is a VIRTUAL keyframe rendered from the fused TSDF
(:func:`~dense_visual_odometry_tpu.models.tsdf.raycast_view`) — depth
denoised by the running SDF average over every view so far, intensity
from the fused voxel color.  KinectFusion's tracking model, built
TPU-native: fusion is a donated jitted update, the raycast is a
scatter-min splat (no per-ray gather marching), and the frame-to-model
solve is the same batched LM cascade every other tracker here uses.

The virtual keyframe is re-rendered when the estimate leaves the
keyframe envelope (translation / rotation thresholds), so the tracking
reference follows the camera with NO accumulation of frame-to-frame
compositional drift against the map.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dense_visual_odometry_tpu.camera import CameraModel
from dense_visual_odometry_tpu.config import RobustDVOConfig
from dense_visual_odometry_tpu.models.robust import (
    FrameData,
    preprocess_frame,
    track_pair,
)
from dense_visual_odometry_tpu.models.brick_tsdf import (
    BrickTSDFConfig,
    _integrate_impl as _brick_integrate,
    _raycast_march_impl as _brick_march,
    make_brick_volume,
)
from dense_visual_odometry_tpu.models.slam import _preprocess
from dense_visual_odometry_tpu.models.tsdf import (
    TSDFConfig,
    TSDFVolume,
    integrate,
    make_volume,
    raycast_view,
    raycast_view_march,
)


def _vol_integrate(volume, depth_m, gray, intrinsics, pose, tsdf_cfg):
    """Config-type dispatch (static under jit): dense or brick fusion."""
    if isinstance(tsdf_cfg, BrickTSDFConfig):
        return _brick_integrate(
            volume, depth_m, gray, intrinsics, pose, tsdf_cfg
        )
    return integrate(volume, depth_m, gray, intrinsics, pose, tsdf_cfg)


def _vol_render(
    volume, intrinsics, pose, tsdf_cfg, shape, min_weight, max_depth, raycast
):
    """Config-type dispatch for the virtual-view renderer.  The brick
    volume ships the marching renderer only (the splat would have to
    project every pool voxel; marching is the shipped frame-to-model
    quality path anyway — tsdf.raycast_view_march docstring)."""
    if isinstance(tsdf_cfg, BrickTSDFConfig):
        return _brick_march(
            volume, intrinsics, pose, tsdf_cfg, shape,
            min_weight=min_weight, max_depth=max_depth,
        )
    render = raycast_view if raycast == "splat" else raycast_view_march
    return render(
        volume, intrinsics, pose, tsdf_cfg, shape,
        min_weight=min_weight, max_depth=max_depth,
    )


_integrate_any = jax.jit(
    _vol_integrate, static_argnames=("tsdf_cfg",), donate_argnums=(0,)
)
from dense_visual_odometry_tpu.ops import pyramid as pyr_ops
from dense_visual_odometry_tpu.utils.lie import Pose, se3


@dataclasses.dataclass(frozen=True)
class ModelTrackerPolicy:
    """When to re-render the virtual keyframe, and map hygiene."""

    max_translation: float = 0.10  # meters vs the virtual keyframe
    max_rotation: float = 0.10  # radians vs the virtual keyframe
    # Skip integrating frames whose solve failed (protects the map from
    # a wrong alignment poisoning every later virtual keyframe).
    integrate_on_failure: bool = False
    min_weight: float = 1.0  # raycast surface-confidence gate
    max_render_depth: float = 10.0
    # Render the model prediction EVERY frame at the previous pose and
    # track against it (the KinectFusion loop), with render + preprocess
    # + track + integrate fused into ONE donated device program — still
    # a single round trip per frame.  The warp is then always one
    # frame's motion, so the splat raycast's oblique-incidence depth
    # error (which grows with viewpoint gap — measured ~2 voxels at
    # 60 deg) stops accumulating into the template; keyframe mode
    # (False) renders only when the pose leaves the envelope and
    # measured ~1 m ATE on fr1-difficulty at 39 mm voxels exactly
    # because of that stale-view error (benchmarks/trackmodel.jsonl).
    render_every_frame: bool = False
    # Which renderer produces the virtual keyframe: "splat" (one
    # scatter pass, ~half-voxel per-pixel jitter — cheap, fine for
    # occasional keyframe renders) or "march" (per-ray SDF marching
    # with trilinear sub-voxel refinement — the KinectFusion surface
    # prediction; the required choice for render_every_frame, where
    # splat jitter random-walks into the trajectory).
    raycast: str = "splat"


@functools.partial(
    jax.jit, static_argnames=("cfg", "tsdf_cfg", "shape", "raycast")
)
def _render_keyframe(
    volume: TSDFVolume,
    intrinsics: jnp.ndarray,
    pose: jnp.ndarray,
    cfg: RobustDVOConfig,
    tsdf_cfg: TSDFConfig,
    shape,
    min_weight: float,
    max_depth: float,
    raycast: str = "splat",
) -> FrameData:
    """Raycast the volume into a virtual keyframe's pyramids (one
    program: render + pyramid build, nothing pixel-sized leaves)."""
    depth, gray = _vol_render(
        volume, intrinsics, pose, tsdf_cfg, shape, min_weight, max_depth,
        raycast,
    )
    return FrameData(
        gray=pyr_ops.build_pyramid(gray, cfg.levels),
        depth_m=pyr_ops.build_pyramid(depth, cfg.levels),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _track_step(
    keyframe: FrameData,
    fd: FrameData,
    intrinsics: jnp.ndarray,
    init_guess: jnp.ndarray,
    cfg: RobustDVOConfig,
):
    """Frame-to-model solve + the host scalars in one packed vector."""
    camera = CameraModel(intrinsics=intrinsics, depth_scale=jnp.float32(1.0))
    result = track_pair(
        keyframe, fd, camera, cfg,
        init_guess=init_guess, last_transform=init_guess,
    )
    pack = jnp.concatenate([
        result.transform.reshape(-1),
        result.success.astype(jnp.float32).reshape(1),
        se3.log(result.transform).reshape(-1),
    ])
    return pack


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "tsdf_cfg", "shape", "raycast"),
    donate_argnums=(0,),
)
def _kinfu_step(
    volume: TSDFVolume,
    pose_prev: jnp.ndarray,  # (4, 4) camera-to-world of the last frame
    image: jnp.ndarray,
    depth: jnp.ndarray,
    intrinsics: jnp.ndarray,
    depth_scale: jnp.ndarray,
    init_inc: jnp.ndarray,  # (4, 4) expected prev->curr transform
    integrate_this: jnp.ndarray,  # bool: fuse this frame (--every)
    cfg: RobustDVOConfig,
    tsdf_cfg: TSDFConfig,
    shape,
    min_weight: float,
    max_depth: float,
    raycast: str = "march",
):
    """One KinectFusion-style step, fully on device (volume donated).

    Raycast the model at ``pose_prev`` -> virtual keyframe; preprocess
    the incoming frame; track (small warp: one frame of motion);
    integrate at the refined pose on success.  Returns
    ``(volume', pack)`` with pack = [transform 16 | success 1 |
    world 16 | valid_px 1].
    """
    depth_r, gray_r = _vol_render(
        volume, intrinsics, pose_prev, tsdf_cfg, shape, min_weight,
        max_depth, raycast,
    )
    kf = FrameData(
        gray=pyr_ops.build_pyramid(gray_r, cfg.levels),
        depth_m=pyr_ops.build_pyramid(depth_r, cfg.levels),
    )
    camera = CameraModel(intrinsics=intrinsics, depth_scale=depth_scale)
    fd = preprocess_frame(
        image, depth, camera,
        levels=cfg.levels, max_distance=cfg.max_distance,
        quantize=cfg.quantize_intensity,
    )
    result = track_pair(
        kf, fd, camera, cfg,
        init_guess=init_inc, last_transform=init_inc,
    )
    rel = se3.inverse(result.transform)
    world = jnp.where(result.success, pose_prev @ rel, pose_prev)
    fused = _vol_integrate(
        volume, fd.depth_m[0], fd.gray[0], intrinsics,
        world.astype(jnp.float32), tsdf_cfg,
    )
    keep = result.success & integrate_this
    new_vol = jax.tree.map(
        lambda a, b: jnp.where(keep, a, b), fused, volume
    )
    pack = jnp.concatenate([
        result.transform.reshape(-1),
        result.success.astype(jnp.float32).reshape(1),
        world.reshape(-1),
        jnp.sum(fd.depth_m[0] > 0.0, dtype=jnp.float32).reshape(1),
    ])
    return new_vol, pack


class FrameToModelTracker:
    """Streaming frame-to-model odometry against a live TSDF.

    >>> tracker = FrameToModelTracker(camera, cfg, tsdf_cfg)
    >>> for rgb, depth in seq:
    ...     pose = tracker.step(rgb, depth)
    """

    def __init__(
        self,
        camera: CameraModel,
        config: Optional[RobustDVOConfig] = None,
        tsdf_config: Optional[TSDFConfig] = None,
        policy: Optional[ModelTrackerPolicy] = None,
        every: int = 1,
    ):
        self.camera = camera
        self.config = config or RobustDVOConfig(levels=4, use_weighter=True)
        self.tsdf_config = tsdf_config or TSDFConfig()
        self.policy = policy or ModelTrackerPolicy()
        self.every = every
        self._intrinsics = jnp.asarray(camera.intrinsics, jnp.float32)
        self.volume = (
            make_brick_volume(self.tsdf_config)
            if isinstance(self.tsdf_config, BrickTSDFConfig)
            else make_volume(self.tsdf_config)
        )
        self._keyframe: Optional[FrameData] = None
        self._kf_pose = np.eye(4)
        self._rel_to_kf = np.eye(4)
        self._last_inc = np.eye(4)
        self.frame_poses: List[np.ndarray] = []
        self.renders = 0
        self.failures = 0
        self._frame_idx = 0
        self._shape: Optional[tuple] = None

    def _integrate(self, fd: FrameData, world: np.ndarray) -> None:
        self.volume = _integrate_any(
            self.volume, fd.depth_m[0], fd.gray[0], self._intrinsics,
            jnp.asarray(world, jnp.float32), self.tsdf_config,
        )

    def _render(self, world: np.ndarray) -> None:
        self._keyframe = _render_keyframe(
            self.volume, self._intrinsics, jnp.asarray(world, jnp.float32),
            self.config, self.tsdf_config, self._shape,
            self.policy.min_weight, self.policy.max_render_depth,
            raycast=self.policy.raycast,
        )
        self._kf_pose = world.copy()
        self._rel_to_kf = np.eye(4)
        self.renders += 1

    def step(self, image, depth) -> Pose:
        """Process one frame; returns its world pose."""
        if self.policy.render_every_frame and self._shape is not None:
            return self._step_kinfu(image, depth)
        fd = _preprocess(
            np.ascontiguousarray(image), np.ascontiguousarray(depth),
            self._intrinsics, np.float32(self.camera.depth_scale),
            self.config,
        )
        if self._keyframe is None:
            self._shape = tuple(np.asarray(fd.depth_m[0]).shape)
            world = np.eye(4)
            self._integrate(fd, world)
            if not self.policy.render_every_frame:
                self._render(world)
            self._kf_pose = world.copy()
            self.frame_poses.append(world)
            self._frame_idx += 1
            return Pose.from_matrix(world)

        init = (
            self._last_inc @ np.linalg.inv(self._rel_to_kf)
        ).astype(np.float32)
        pack = np.asarray(
            _track_step(self._keyframe, fd, self._intrinsics, init,
                        self.config),
            np.float64,
        )
        success = pack[16] > 0.5
        transform = pack[:16].reshape(4, 4)
        if success:
            prev_rel = self._rel_to_kf
            rel = np.linalg.inv(transform)
            self._last_inc = np.linalg.inv(rel) @ prev_rel
            self._rel_to_kf = rel
        else:
            self.failures += 1
        world = self._kf_pose @ self._rel_to_kf
        self.frame_poses.append(world)

        if (success or self.policy.integrate_on_failure) and (
            self._frame_idx % self.every == 0
        ):
            self._integrate(fd, world)

        xi = pack[17:23]
        if success and (
            np.linalg.norm(xi[:3]) > self.policy.max_translation
            or np.linalg.norm(xi[3:]) > self.policy.max_rotation
        ):
            self._render(world)
        self._frame_idx += 1
        return Pose.from_matrix(world)

    def _step_kinfu(self, image, depth) -> Pose:
        """Per-frame-render mode: one fused donated device program."""
        pose_prev = self.frame_poses[-1]
        self.volume, pack_d = _kinfu_step(
            self.volume, jnp.asarray(pose_prev, jnp.float32),
            np.ascontiguousarray(image), np.ascontiguousarray(depth),
            self._intrinsics, np.float32(self.camera.depth_scale),
            self._last_inc.astype(np.float32),
            np.bool_(self._frame_idx % self.every == 0),
            self.config, self.tsdf_config, self._shape,
            self.policy.min_weight, self.policy.max_render_depth,
            raycast=self.policy.raycast,
        )
        pack = np.asarray(pack_d, np.float64)
        success = pack[16] > 0.5
        if success:
            # transform maps prev-cam points to curr-cam points — the
            # constant-velocity seed for the next step directly.
            self._last_inc = pack[:16].reshape(4, 4)
            self.renders += 1
        else:
            self.failures += 1
        world = pack[17:33].reshape(4, 4)
        self.frame_poses.append(world)
        self._frame_idx += 1
        return Pose.from_matrix(world)

    def trajectory(self) -> np.ndarray:
        return (
            np.stack(self.frame_poses)
            if self.frame_poses
            else np.zeros((0, 4, 4))
        )
