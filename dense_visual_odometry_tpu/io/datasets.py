"""RGB-D sequence loaders: TUM RGB-D format + the bundled 10-frame set.

Capability parity with the reference benchmark loaders
(``/root/reference/src/test_dvo.py:59-280``): TUM ``rgb.txt`` /
``depth.txt`` / ``groundtruth.txt`` parsing with nearest-timestamp
association (rgb<->depth by absolute-difference argmin with de-duplication,
groundtruth by argmin against the averaged rgb/depth timestamp,
test_dvo.py:153-173), TUM xyzw->wxyz quaternion handling (:138-141), and
the bundled ``ground_truth.json`` test set (:209-280).

Loading is host-side numpy (PNG decode); frames are exposed lazily so long
sequences stream without holding every image in memory.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

from dense_visual_odometry_tpu.camera import CameraModel

# Default camera YAML shipped with the bundled set (also what the reference
# uses for TUM fr1 sequences, test_dvo.py:97).
BUNDLED_DATA_DIR = Path("/root/reference/tests/test_data")


def _imread_rgb(path: Path) -> np.ndarray:
    import cv2

    img = cv2.imread(str(path), cv2.IMREAD_ANYCOLOR)
    if img is None:
        raise FileNotFoundError(f"could not read RGB image: {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def _imread_depth(path: Path) -> np.ndarray:
    import cv2

    img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(f"could not read depth image: {path}")
    return img


def host_gray_u8(rgb: np.ndarray) -> np.ndarray:
    """BT.601 luma as uint8, computed on the HOST.

    Streaming deployments over a narrow host<->device link (the axon
    tunnel moves ~45 MB/s) are upload-bound: converting to gray before
    upload cuts the per-frame payload from 1.54 MB (u8 RGB + u16 depth)
    to 0.92 MB.  Fixed-point rounding matches cv2.cvtColor's, i.e. the
    uint8 grayscale the reference feeds its solver
    (``base_dense_visual_odometry.py:58``).
    """
    if rgb.ndim == 2:
        return rgb
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    return ((4899 * r + 9617 * g + 1868 * b + 8192) >> 14).astype(np.uint8)


def _tum_pose(tx, ty, tz, qx, qy, qz, qw) -> np.ndarray:
    """TUM translation + xyzw quaternion -> 4x4 camera-to-world matrix."""
    q = np.array([qw, qx, qy, qz], dtype=np.float64)
    q = q / np.linalg.norm(q)
    w, x, y, z = q
    rot = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    out = np.eye(4)
    out[:3, :3] = rot
    out[:3, 3] = [tx, ty, tz]
    return out


@dataclass
class RGBDSequence:
    """A loaded RGB-D sequence: paths + ground truth, images read on demand."""

    name: str
    camera: CameraModel
    rgb_paths: List[Path]
    depth_paths: List[Path]
    timestamps: np.ndarray  # (N,) float64
    gt_poses: Optional[np.ndarray]  # (N, 4, 4) camera-to-world, or None
    extra: dict = field(default_factory=dict)

    def __len__(self) -> int:
        return len(self.rgb_paths)

    def frame(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        """-> (rgb (H,W,3) uint8, depth (H,W) uint16) for frame ``i``."""
        return _imread_rgb(self.rgb_paths[i]), _imread_depth(self.depth_paths[i])

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        for i in range(len(self)):
            yield self.frame(i)

    def prefetched(
        self, prefetch: int = 4, workers: int = 2
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Iterate frames through the native C++ prefetching loader
        (libpng + worker pool, ~3x faster than the synchronous path and
        overlapping decode with device compute); falls back to the
        synchronous OpenCV path when the native library is unavailable."""
        try:
            from dense_visual_odometry_tpu.io.native_loader import (
                NativeLoaderUnavailable,
                NativeSequenceLoader,
            )

            loader = NativeSequenceLoader(
                self.rgb_paths, self.depth_paths, prefetch=prefetch, workers=workers
            )
        except Exception:
            yield from self
            return
        try:
            yield from loader
        finally:
            loader.close()

    def subset(self, size: int) -> "RGBDSequence":
        if size >= len(self):
            return self
        return RGBDSequence(
            name=self.name,
            camera=self.camera,
            rgb_paths=self.rgb_paths[:size],
            depth_paths=self.depth_paths[:size],
            timestamps=self.timestamps[:size],
            gt_poses=None if self.gt_poses is None else self.gt_poses[:size],
            extra=self.extra,
        )


class _PyrDownView(RGBDSequence):
    """Half-resolution view of a sequence (median blur + decimate, like
    the reference's ``pyrDownMedianSmooth``; intrinsics rescaled with the
    level-1 pixel-center convention — the reference's ``pyr_down`` path
    called ``camera_model.at(-1)`` and crashed, SURVEY quirk #6)."""

    def frame(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        import cv2

        rgb, depth = super().frame(i)
        rgb = cv2.medianBlur(rgb, 3)[::2, ::2]
        depth = cv2.medianBlur(depth, 3)[::2, ::2]
        return rgb, depth

    def prefetched(self, prefetch: int = 4, workers: int = 2):
        import cv2

        for rgb, depth in super().prefetched(prefetch, workers):
            yield cv2.medianBlur(rgb, 3)[::2, ::2], cv2.medianBlur(depth, 3)[::2, ::2]


def pyr_down_sequence(seq: RGBDSequence) -> RGBDSequence:
    """Half-resolution view of ``seq`` with correctly rescaled intrinsics."""
    import jax.numpy as jnp

    half_k = CameraModel(
        intrinsics=jnp.asarray(np.asarray(seq.camera.at(1)), jnp.float32),
        depth_scale=seq.camera.depth_scale,
    )
    return _PyrDownView(
        name=seq.name + "-half",
        camera=half_k,
        rgb_paths=seq.rgb_paths,
        depth_paths=seq.depth_paths,
        timestamps=seq.timestamps,
        gt_poses=seq.gt_poses,
        extra={**seq.extra, "pyr_down": True},
    )


def load_bundled_sequence(
    data_dir=None, size: Optional[int] = None
) -> RGBDSequence:
    """The 10-frame TUM-style test set (reference test_dvo.py:209-280)."""
    data_dir = Path(data_dir) if data_dir is not None else BUNDLED_DATA_DIR
    gt_file = data_dir / "ground_truth.json"
    if not gt_file.exists():
        raise FileNotFoundError(f"bundled dataset not found at {data_dir}")
    gt = json.loads(gt_file.read_text())
    camera = CameraModel.from_yaml(data_dir / "camera_intrinsics.yaml")

    keys = sorted(gt.keys(), key=int)
    rgb_paths = [data_dir / gt[k]["rgb"] for k in keys]
    depth_paths = [data_dir / gt[k]["depth"] for k in keys]
    poses = np.stack([np.array(gt[k]["transformation"], dtype=np.float64) for k in keys])
    seq = RGBDSequence(
        name="test",
        camera=camera,
        rgb_paths=rgb_paths,
        depth_paths=depth_paths,
        timestamps=np.arange(len(keys), dtype=np.float64),
        gt_poses=poses,
        extra={"type": "test", "data_dir": str(data_dir)},
    )
    return seq if size is None else seq.subset(size)


def _parse_tum_file(path: Path):
    """-> (timestamps (N,), fields: list of remaining-column lists)."""
    timestamps, fields = [], []
    with path.open("r") as fp:
        for line in fp:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            timestamps.append(float(parts[0]))
            fields.append(parts[1:])
    return np.asarray(timestamps, dtype=np.float64), fields


def load_tum_sequence(
    data_dir,
    camera_yaml=None,
    size: Optional[int] = None,
    require_groundtruth: bool = True,
) -> RGBDSequence:
    """A TUM RGB-D sequence directory (rgb.txt / depth.txt / groundtruth.txt).

    Association matches the reference (test_dvo.py:153-173): for each rgb
    timestamp the nearest depth timestamp (deduplicated), then the nearest
    groundtruth pose to the rgb/depth timestamp average.
    """
    data_dir = Path(data_dir).resolve()
    if not data_dir.is_dir():
        raise FileNotFoundError(f"TUM dataset dir not found: {data_dir}")

    rgb_ts, rgb_rows = _parse_tum_file(data_dir / "rgb.txt")
    depth_ts, depth_rows = _parse_tum_file(data_dir / "depth.txt")

    # rgb -> nearest depth; keep one rgb per depth frame.
    dist = np.abs(rgb_ts[:, None] - depth_ts[None, :])
    nearest_depth = dist.argmin(axis=1)
    depth_ids, rgb_ids = np.unique(nearest_depth, return_index=True)

    rgb_paths = [data_dir / rgb_rows[i][0] for i in rgb_ids]
    depth_paths = [data_dir / depth_rows[j][0] for j in depth_ids]
    frame_ts = (rgb_ts[rgb_ids] + depth_ts[depth_ids]) / 2.0

    gt_poses = None
    gt_file = data_dir / "groundtruth.txt"
    if gt_file.exists():
        gt_ts, gt_rows = _parse_tum_file(gt_file)
        nearest_gt = np.abs(frame_ts[:, None] - gt_ts[None, :]).argmin(axis=1)
        gt_poses = np.stack(
            [_tum_pose(*map(float, gt_rows[j])) for j in nearest_gt]
        )
    elif require_groundtruth:
        raise FileNotFoundError(f"groundtruth.txt not found in {data_dir}")

    camera_yaml = Path(camera_yaml) if camera_yaml else BUNDLED_DATA_DIR / "camera_intrinsics.yaml"
    camera = CameraModel.from_yaml(camera_yaml)

    seq = RGBDSequence(
        name=data_dir.name,
        camera=camera,
        rgb_paths=rgb_paths,
        depth_paths=depth_paths,
        timestamps=frame_ts,
        gt_poses=gt_poses,
        extra={"type": "TUM", "data_dir": str(data_dir), "camera_intrinsics": str(camera_yaml)},
    )
    return seq if size is None else seq.subset(size)
