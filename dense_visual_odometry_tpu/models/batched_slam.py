"""Multi-stream SLAM serving: B independent SLAM sessions, one program.

The reference processes exactly one camera stream per process
(`/root/reference/src/test_dvo.py:305-308` — a single sequential frame
loop); the north star asks for B cameras per chip.  Odometry already
batches (``models/batched_session.py``); this module batches the SLAM
front-end:

- ONE jitted fused step per frame batch: preprocess B incoming frames,
  track each against ITS OWN keyframe (the keyframes live on device as
  one stacked pytree), and return the per-stream ``_PK_*`` policy packs
  — a single dispatch + readback round trip for all B streams, so the
  per-frame transport floor (~25 ms on the relay tunnel) is paid once
  per batch instead of once per stream.
- Host-side policy (keyframe promotion, pose-graph edges, windowed BA,
  loop closure, relocalization) stays PER STREAM and exactly reuses
  ``SlamSession.apply_step`` — each stream owns a full ``SlamSession``
  whose device half is hoisted into the batch.  Promotion and
  relocalization materialize that stream's ``FrameData`` with one
  device slice (rare events), and the stacked keyframe tree is patched
  in place with one donated dynamic-update per event.

Semantics note: the hard-motion fallback predicate is batch-global by
design (one ``lax.cond`` for the whole batch — models/robust.py), so a
stream under hard motion switches ALL streams' evaluations to the
always-correct gather path for that frame batch.  Results stay correct
for every stream; easy streams just temporarily ride the robust path.
Same property as batched odometry.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

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
from dense_visual_odometry_tpu.models.slam import (
    KeyframePolicy,
    SlamSession,
    _preprocess,
)
from dense_visual_odometry_tpu.utils.lie import Pose, se3


@functools.partial(jax.jit, static_argnames=("dh", "dw"))
def _descriptors_batched(gray_coarse: jnp.ndarray, dh: int = 8, dw: int = 12):
    """(B, h, w) coarse gray -> (B, dh*dw) ZNCC place descriptors
    (models/slam._frame_descriptor, batched)."""
    b = gray_coarse.shape[0]
    d = jax.image.resize(
        gray_coarse, (b, dh, dw), method="linear"
    ).reshape(b, -1)
    d = d - jnp.mean(d, axis=-1, keepdims=True)
    return d / jnp.maximum(
        jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-6
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _fused_step_batched(
    keyframes: FrameData,  # leaves (B, ...)
    images: jnp.ndarray,  # (B, H, W, 3) or (B, H, W)
    depths: jnp.ndarray,  # (B, H, W)
    intrinsics: jnp.ndarray,
    depth_scale: jnp.ndarray,
    init_guess: jnp.ndarray,  # (B, 4, 4)
    cfg: RobustDVOConfig,
):
    """B SLAM front-end steps in one device program -> (fd_b, pack_b).

    The per-stream pack layout matches ``models/slam._PK_*`` row-wise.
    """
    camera = CameraModel(intrinsics=intrinsics, depth_scale=depth_scale)
    fd = preprocess_frame(
        images, depths, camera,
        levels=cfg.levels, max_distance=cfg.max_distance,
        quantize=cfg.quantize_intensity,
    )
    result = track_pair(
        keyframes, fd, camera, cfg,
        init_guess=init_guess, last_transform=init_guess,
    )
    b = init_guess.shape[0]
    pack = jnp.concatenate([
        result.transform.reshape(b, 16),
        result.success.astype(jnp.float32).reshape(b, 1),
        result.diagnostics.error[-1].reshape(b, 1),
        se3.log(result.transform).reshape(b, 6),
        jnp.sum(fd.depth_m[0] > 0.0, axis=(-2, -1), dtype=jnp.float32)
        .reshape(b, 1),
        result.hessian.reshape(b, 36),
        _descriptors_batched(fd.gray[-1]),
    ], axis=-1)
    return fd, pack


@jax.jit
def _slice_stream(tree, b):
    """Stream ``b``'s unbatched pytree slice (one program for any b)."""
    return jax.tree.map(lambda x: jax.lax.dynamic_index_in_dim(
        x, b, axis=0, keepdims=False
    ), tree)


@functools.partial(jax.jit, donate_argnums=(0,))
def _set_stream(batched, item, b):
    """Write ``item`` into slot ``b`` of the stacked pytree (donated —
    the keyframe state is updated in place on device)."""
    return jax.tree.map(
        lambda x, y: jax.lax.dynamic_update_index_in_dim(
            x, y.astype(x.dtype), b, axis=0
        ),
        batched, item,
    )


class BatchedSlamSession:
    """B independent streaming SLAM sessions sharing one device program.

    >>> slam = BatchedSlamSession(camera, cfg, n_streams=8)
    >>> for frames in zip(*sequences):           # frames: B (rgb, depth)
    ...     poses = slam.step([f[0] for f in frames], [f[1] for f in frames])
    >>> slam.sessions[0].optimized_trajectory()

    Per-stream state (keyframe graph, BA, loop closures, relocalization)
    lives in ``self.sessions[b]`` — full :class:`SlamSession` objects
    whose per-frame device work is hoisted into the shared batched step.
    """

    def __init__(
        self,
        camera: CameraModel,
        config: Optional[RobustDVOConfig] = None,
        n_streams: int = 8,
        policy: Optional[KeyframePolicy] = None,
    ):
        self.camera = camera
        self.config = config or RobustDVOConfig(levels=4, use_weighter=True)
        if policy is not None and policy.two_step_tracking:
            raise NotImplementedError(
                "two_step_tracking is single-stream only for now (the "
                "batched step would need per-stream previous-frame state "
                "on device, like the keyframe tree)"
            )
        self.n_streams = n_streams
        self.sessions: List[SlamSession] = [
            SlamSession(camera, self.config, policy)
            for _ in range(n_streams)
        ]
        self._intrinsics = jnp.asarray(camera.intrinsics, jnp.float32)
        self._keyframes: Optional[FrameData] = None  # stacked (B, ...) tree

    def step(self, images: Sequence, depths: Sequence) -> List[Pose]:
        """Advance every stream by one frame; returns B front-end poses."""
        if len(images) != self.n_streams or len(depths) != self.n_streams:
            raise ValueError(
                f"expected {self.n_streams} frames, got {len(images)}"
            )
        img_b = np.ascontiguousarray(np.stack(images))
        dep_b = np.ascontiguousarray(np.stack(depths))

        if self._keyframes is None:
            # First batch: every stream anchors at its first frame.  One
            # batched preprocess; the stacked tree IS the keyframe state.
            fd_b = _preprocess(
                img_b, dep_b, self._intrinsics,
                np.float32(self.camera.depth_scale), self.config,
            )
            self._keyframes = fd_b
            return [
                sess._first_frame(_slice_stream(fd_b, b))
                for b, sess in enumerate(self.sessions)
            ]

        init_b = np.stack(
            [sess.init_guess() for sess in self.sessions]
        ).astype(np.float32)
        fd_b, pack_d = _fused_step_batched(
            self._keyframes, img_b, dep_b,
            self._intrinsics, np.float32(self.camera.depth_scale),
            init_b, self.config,
        )
        pack = np.asarray(pack_d, np.float64)  # ONE sync for all streams

        poses = []
        for b, sess in enumerate(self.sessions):
            kf_before = sess._active_kf
            keyframe_before = sess._keyframe
            poses.append(
                sess.apply_step(lambda b=b: _slice_stream(fd_b, b), pack[b])
            )
            if (
                sess._active_kf != kf_before
                or sess._keyframe is not keyframe_before
            ):
                # Promotion or relocalization changed this stream's
                # tracking target: patch the stacked keyframe state
                # (donated in-place update, one small program per event).
                self._keyframes = _set_stream(
                    self._keyframes, sess._keyframe, jnp.int32(b)
                )
        return poses

    @property
    def num_keyframes(self) -> List[int]:
        return [sess.num_keyframes for sess in self.sessions]
