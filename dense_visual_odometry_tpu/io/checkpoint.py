"""Checkpoint / resume for long tracking runs.

The reference has NO resume capability — its only persisted state is the
end-of-run report JSON + trajectory txt (``test_dvo.py:327-345``), which
its visualizer can replay but the solver cannot resume from (SURVEY §5).
Here the full session state (pose, last transform, previous-frame pyramids,
keyframe graph) serializes to a single ``.npz`` so a long sequence can be
stopped and continued bit-for-bit.

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
