"""Checkpoint / resume for long tracking runs.

The reference has NO resume capability — its only persisted state is the
end-of-run report JSON + trajectory txt (``test_dvo.py:327-345``), which
its visualizer can replay but the solver cannot resume from (SURVEY §5).
Here the full session state serializes to a single ``.npz`` so a long
sequence can be stopped and continued bit-for-bit: odometry sessions
(pose, last transform, previous-frame pyramids — :func:`save_session`) and
SLAM sessions (keyframe graph, edges, loop closures, retained keyframe
pyramids — :func:`save_slam_session`).

Plain numpy-npz rather than orbax: the state is a handful of MB (two
pyramid sets + poses), synchronous single-host writes are microseconds of
overhead per checkpoint, and the file stays inspectable with one
``np.load``.  The layout is versioned for forward compatibility.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dense_visual_odometry_tpu.models.robust import FrameData
from dense_visual_odometry_tpu.models.session import OdometrySession, SessionState

FORMAT_VERSION = 1


def save_session(path, session: OdometrySession) -> Path:
    """Serialize an :class:`OdometrySession`'s device state to ``path``."""
    path = Path(path)
    state = session._state
    if state is None:
        raise ValueError("session has no state yet (no frames processed)")
    arrays = {
        "version": np.asarray(FORMAT_VERSION),
        "pose": np.asarray(state.pose),
        "last_transform": np.asarray(state.last_transform),
        "initialized": np.asarray(state.initialized),
        "levels": np.asarray(len(state.prev.gray)),
        "intrinsics": np.asarray(session.camera.intrinsics),
        "depth_scale": np.asarray(session.camera.depth_scale),
    }
    for l, (g, d) in enumerate(zip(state.prev.gray, state.prev.depth_m)):
        arrays[f"gray_{l}"] = np.asarray(g)
        arrays[f"depth_{l}"] = np.asarray(d)
    with path.open("wb") as fp:
        np.savez_compressed(fp, **arrays)
    return path


def load_session(path, session: OdometrySession) -> OdometrySession:
    """Restore device state saved by :func:`save_session` into ``session``.

    The session's config must produce the same pyramid depth; image shapes
    are restored from the file.
    """
    path = Path(path)
    with np.load(path) as data:
        version = int(data["version"])
        if version != FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {version}")
        levels = int(data["levels"])
        if levels != session.config.levels:
            raise ValueError(
                f"checkpoint has {levels} pyramid levels, session config "
                f"expects {session.config.levels}"
            )
        gray = tuple(jnp.asarray(data[f"gray_{l}"]) for l in range(levels))
        depth = tuple(jnp.asarray(data[f"depth_{l}"]) for l in range(levels))
        state = SessionState(
            pose=jnp.asarray(data["pose"]),
            last_transform=jnp.asarray(data["last_transform"]),
            prev=FrameData(gray=gray, depth_m=depth),
            initialized=jnp.asarray(data["initialized"]),
        )
    session._state = state
    return session


def _frame_to_arrays(prefix: str, fd: FrameData, arrays: dict) -> None:
    for l, (g, d) in enumerate(zip(fd.gray, fd.depth_m)):
        arrays[f"{prefix}_gray_{l}"] = np.asarray(g)
        arrays[f"{prefix}_depth_{l}"] = np.asarray(d)


def _frame_from_arrays(prefix: str, levels: int, data) -> FrameData:
    return FrameData(
        gray=tuple(jnp.asarray(data[f"{prefix}_gray_{l}"]) for l in range(levels)),
        depth_m=tuple(jnp.asarray(data[f"{prefix}_depth_{l}"]) for l in range(levels)),
    )


def save_slam_session(path, slam) -> Path:
    """Serialize a :class:`~dense_visual_odometry_tpu.models.slam.SlamSession`:
    keyframe poses/indices, the full edge set (measurements + information),
    loop closures, per-frame bookkeeping, and every retained keyframe
    ``FrameData`` (evicted entries stay evicted)."""
    path = Path(path)
    if slam._keyframe is None:
        raise ValueError("slam session has no keyframes yet")
    levels = len(slam._keyframe.gray)
    n_edges = len(slam._edges_i)
    arrays = {
        "version": np.asarray(FORMAT_VERSION),
        "kind": np.asarray("slam"),
        "levels": np.asarray(levels),
        "frame_idx": np.asarray(slam._frame_idx),
        "kf_valid_count": np.asarray(slam._kf_valid_count),
        "rel_to_kf": np.asarray(slam._rel_to_kf),
        "last_inc": np.asarray(slam._last_inc),
        "keyframe_poses": np.stack(slam.keyframe_poses),
        "keyframe_indices": np.asarray(slam.keyframe_indices, np.int64),
        "edges_i": np.asarray(slam._edges_i, np.int64),
        "edges_j": np.asarray(slam._edges_j, np.int64),
        "edges_meas": (
            np.stack(slam._edges_meas) if n_edges else np.zeros((0, 4, 4))
        ),
        "edges_info": (
            np.stack(slam._edges_info) if n_edges else np.zeros((0, 6, 6))
        ),
        "loop_closures": np.asarray(slam.loop_closures, np.float64).reshape(-1, 3),
        "frame_poses": (
            np.stack(slam.frame_poses) if slam.frame_poses else np.zeros((0, 4, 4))
        ),
        "frame_kf": np.asarray(slam._frame_kf, np.int64),
        "frame_rel": (
            np.stack(slam._frame_rel) if slam._frame_rel else np.zeros((0, 4, 4))
        ),
        "kf_retained": np.asarray(
            [fd is not None for fd in slam._kf_frames], bool
        ),
        "active_kf": np.asarray(slam._active_kf),
        "lost_count": np.asarray(slam._lost_count),
        "relocalizations": np.asarray(
            slam.relocalizations, np.int64
        ).reshape(-1, 2),
    }
    for k, fd in enumerate(slam._kf_frames):
        if fd is not None:
            _frame_to_arrays(f"kf{k}", fd, arrays)
    with path.open("wb") as fp:
        np.savez_compressed(fp, **arrays)
    return path


def load_slam_session(path, slam):
    """Restore state saved by :func:`save_slam_session` into ``slam``
    (a fresh ``SlamSession`` built with the same config/policy)."""
    path = Path(path)
    with np.load(path) as data:
        version = int(data["version"])
        if version != FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {version}")
        if str(data["kind"]) != "slam":
            raise ValueError("not a SLAM checkpoint")
        levels = int(data["levels"])
        if levels != slam.config.levels:
            raise ValueError(
                f"checkpoint has {levels} pyramid levels, session config "
                f"expects {slam.config.levels}"
            )
        slam._frame_idx = int(data["frame_idx"])
        slam._kf_valid_count = float(data["kf_valid_count"])
        slam._rel_to_kf = np.asarray(data["rel_to_kf"])
        slam._last_inc = np.asarray(data["last_inc"])
        slam.keyframe_poses = list(np.asarray(data["keyframe_poses"]))
        slam.keyframe_indices = [int(i) for i in data["keyframe_indices"]]
        slam._edges_i = [int(i) for i in data["edges_i"]]
        slam._edges_j = [int(j) for j in data["edges_j"]]
        slam._edges_meas = list(np.asarray(data["edges_meas"]))
        slam._edges_info = list(np.asarray(data["edges_info"]))
        slam.loop_closures = [
            (int(a), int(b), float(e)) for a, b, e in data["loop_closures"]
        ]
        slam.frame_poses = list(np.asarray(data["frame_poses"]))
        slam._frame_kf = [int(k) for k in data["frame_kf"]]
        slam._frame_rel = list(np.asarray(data["frame_rel"]))
        retained = np.asarray(data["kf_retained"])
        slam._kf_frames = [
            _frame_from_arrays(f"kf{k}", levels, data) if keep else None
            for k, keep in enumerate(retained)
        ]
        # Recovery state (absent in pre-relocalization checkpoints).
        if "active_kf" in data.files:
            slam._active_kf = int(data["active_kf"])
            slam._lost_count = int(data["lost_count"])
            slam.relocalizations = [
                (int(f), int(j)) for f, j in data["relocalizations"]
            ]
        else:
            slam._active_kf = len(slam._kf_frames) - 1
            slam._lost_count = 0
            slam.relocalizations = []
    slam._keyframe = (
        slam._kf_frames[slam._active_kf] if slam._kf_frames else None
    )
    # Place-recognition descriptors are derived state: recompute from the
    # retained pyramids (evicted keyframes get a zero descriptor — they
    # are retention-gated out of candidate search anyway).
    from dense_visual_odometry_tpu.models.slam import _frame_descriptor

    slam._kf_desc = [
        np.zeros(96) if fd is None else np.asarray(_frame_descriptor(fd.gray[-1]))
        for fd in slam._kf_frames
    ]
    # Two-step tracking state: the previous frame's pyramids are not
    # checkpointed (they are one frame of transient data); a resumed
    # two-step session takes the direct frame-to-keyframe path for its
    # first step (the `_prev_fd is None` guard) and is back on the
    # two-step program from the second.
    slam._prev_fd = None
    return slam


def save_trajectory_state(
    path,
    poses: np.ndarray,
    timestamps: Optional[np.ndarray] = None,
    frame_index: int = 0,
) -> Path:
    """Lightweight mid-run trajectory snapshot (poses so far + cursor)."""
    path = Path(path)
    arrays = {
        "version": np.asarray(FORMAT_VERSION),
        "poses": np.asarray(poses),
        "frame_index": np.asarray(frame_index),
    }
    if timestamps is not None:
        arrays["timestamps"] = np.asarray(timestamps)
    with path.open("wb") as fp:
        np.savez_compressed(fp, **arrays)
    return path


def load_trajectory_state(path):
    """-> dict with poses / frame_index / timestamps (or None)."""
    with np.load(Path(path)) as data:
        return {
            "poses": data["poses"],
            "frame_index": int(data["frame_index"]),
            "timestamps": data["timestamps"] if "timestamps" in data else None,
        }
