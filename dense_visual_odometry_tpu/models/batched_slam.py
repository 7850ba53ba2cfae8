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


@functools.partial(jax.jit, static_argnames=("cfg", "cfg_refine"))
def _fused_step_two_batched(
    keyframes: FrameData,  # leaves (B, ...)
    prev_fds: FrameData,  # leaves (B, ...) — each stream's previous frame
    images: jnp.ndarray,
    depths: jnp.ndarray,
    intrinsics: jnp.ndarray,
    depth_scale: jnp.ndarray,
    init_inc: jnp.ndarray,  # (B, 4, 4) constant-velocity frame-to-frame seed
    prev_from_kf: jnp.ndarray,  # (B, 4, 4) keyframe-cam -> prev-frame-cam
    cfg: RobustDVOConfig,
    cfg_refine: RobustDVOConfig,
):
    """B two-step SLAM front-end steps in one device program.

    The batched analogue of ``models/slam._fused_step_two``: solve each
    stream frame-to-PREVIOUS-frame (small warp, level-kernel path),
    compose into the keyframe frame, then refine frame-to-KEYFRAME under
    the short ``cfg_refine`` budget.  All policy scalars come from the
    refinement solve, so per-stream graph semantics match single-stream
    two-step tracking exactly.
    """
    camera = CameraModel(intrinsics=intrinsics, depth_scale=depth_scale)
    fd = preprocess_frame(
        images, depths, camera,
        levels=cfg.levels, max_distance=cfg.max_distance,
        quantize=cfg.quantize_intensity,
    )
    r1 = track_pair(
        prev_fds, fd, camera, cfg,
        init_guess=init_inc, last_transform=init_inc,
    )
    init2 = r1.transform @ prev_from_kf
    init2 = jnp.where(
        r1.success[..., None, None], init2, init_inc @ prev_from_kf
    )
    result = track_pair(
        keyframes, fd, camera, cfg_refine,
        init_guess=init2, last_transform=init2,
    )
    b = init_inc.shape[0]
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
        self.n_streams = n_streams
        self.sessions: List[SlamSession] = [
            SlamSession(camera, self.config, policy)
            for _ in range(n_streams)
        ]
        self.policy = self.sessions[0].policy
        self._intrinsics = jnp.asarray(camera.intrinsics, jnp.float32)
        self._keyframes: Optional[FrameData] = None  # stacked (B, ...) tree
        # Two-step tracking state: the previous frame batch stays device
        # resident like the keyframe tree (round-4 VERDICT weak #4); the
        # short refinement budget is the per-session one.
        self._prev_fds: Optional[FrameData] = None  # stacked (B, ...) tree
        self._cfg_refine = self.sessions[0]._cfg_refine

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
            self._prev_fds = fd_b
            return [
                sess._first_frame(_slice_stream(fd_b, b))
                for b, sess in enumerate(self.sessions)
            ]

        if self.policy.two_step_tracking:
            init_inc = np.stack(
                [sess._last_inc for sess in self.sessions]
            ).astype(np.float32)
            prev_from_kf = np.stack(
                [np.linalg.inv(sess._rel_to_kf) for sess in self.sessions]
            ).astype(np.float32)
            fd_b, pack_d = _fused_step_two_batched(
                self._keyframes, self._prev_fds, img_b, dep_b,
                self._intrinsics, np.float32(self.camera.depth_scale),
                init_inc, prev_from_kf, self.config, self._cfg_refine,
            )
        else:
            init_b = np.stack(
                [sess.init_guess() for sess in self.sessions]
            ).astype(np.float32)
            fd_b, pack_d = _fused_step_batched(
                self._keyframes, img_b, dep_b,
                self._intrinsics, np.float32(self.camera.depth_scale),
                init_b, self.config,
            )
        pack = np.asarray(pack_d, np.float64)  # ONE sync for all streams
        self._prev_fds = fd_b
        reloc = self._group_relocalizations(fd_b, pack)

        poses = []
        for b, sess in enumerate(self.sessions):
            kf_before = sess._active_kf
            keyframe_before = sess._keyframe
            poses.append(
                sess.apply_step(
                    lambda b=b: _slice_stream(fd_b, b), pack[b],
                    reloc_thunk=reloc.get(b),
                )
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

    def _group_relocalizations(self, fd_b, pack) -> dict:
        """One dense-verification call for ALL streams that will attempt
        relocalization this step -> {stream: thunk applying its result}.

        Mirrors ``SlamSession.apply_step``'s trigger exactly (success
        after the error gate, lost-counter past ``relocalize_after``);
        candidates come from the packed descriptors (no extra device
        work).  The verification batch has the FIXED shape
        ``n_streams * loop_max_candidates`` (padded by repeating row 0),
        so the compiled program is shared across events and only runs on
        steps where at least one stream relocalizes.
        """
        policy = self.policy
        if not policy.relocalize:
            return {}
        from dense_visual_odometry_tpu.models.slam import (
            _PK_DESC,
            _PK_ERROR,
            _PK_SUCCESS,
        )

        pending = []  # (stream, candidates)
        for b, sess in enumerate(self.sessions):
            success = pack[b][_PK_SUCCESS] > 0.5
            if success and policy.track_max_error is not None:
                success = pack[b][_PK_ERROR] <= policy.track_max_error
            if success or sess._lost_count + 1 <= policy.relocalize_after:
                continue
            cand = sess._reloc_candidates(
                pack[b][_PK_DESC].astype(np.float32)
            )
            if cand:
                pending.append((b, cand))
        if not pending:
            return {}

        from dense_visual_odometry_tpu.parallel.batched import (
            batched_track_pair,
            stack_frame_data,
        )

        cap = policy.loop_max_candidates
        rows = []  # (stream, keyframe_id) per verification row
        for b, cand in pending:
            padded = cand + [cand[0]] * (cap - len(cand))
            rows.extend((b, j) for _, j in padded)
        total = self.n_streams * cap
        rows = (rows + [rows[0]] * total)[:total]
        prev_b = stack_frame_data(
            [self.sessions[b]._kf_frames[j] for b, j in rows]
        )
        curr_b = jax.tree.map(
            lambda x: x[np.asarray([b for b, _ in rows])], fd_b
        )
        eye_b = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (total, 4, 4))
        result = batched_track_pair(
            prev_b, curr_b, self._intrinsics, self.config,
            init_guess=eye_b, last_transform=eye_b,
        )
        success = np.asarray(result.success)
        errs = np.asarray(result.diagnostics.error[-1], np.float64)
        transforms = np.asarray(result.transform, np.float64)

        thunks = {}
        offset = 0
        for b, cand in pending:
            lo, n = offset, len(cand)

            def thunk(b=b, cand=cand, lo=lo, n=n):
                return self.sessions[b]._reloc_apply(
                    cand, success[lo:lo + n], errs[lo:lo + n],
                    transforms[lo:lo + n],
                )

            thunks[b] = thunk
            offset += cap
        return thunks

    @property
    def num_keyframes(self) -> List[int]:
        return [sess.num_keyframes for sess in self.sessions]
