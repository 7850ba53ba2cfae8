"""Render a synthetic RGB-D sequence to a TUM-format dataset directory.

The headline accuracy metric is ATE on TUM RGB-D sequences, but no TUM
download exists in this environment — the only real data is the bundled
10-frame, almost-motionless set (reference ``src/test_dvo.py:209-280``).
This tool closes the gap as far as the environment allows: it renders an
arbitrarily long trajectory with EXACT ground truth from one real bundled
frame (``io/synthetic.py``) and writes it in the TUM RGB-D on-disk layout
the reference consumes (``src/test_dvo.py:110-150``):

    <out>/rgb/<ts>.png          8-bit PNG (gray replicated to RGB)
    <out>/depth/<ts>.png        16-bit PNG, TUM 5000 DN/m convention
    <out>/rgb.txt, depth.txt    "timestamp filename" association tables
    <out>/groundtruth.txt       "ts tx ty tz qx qy qz qw" (camera-to-world)

so the REAL ``tum-fr1`` ingestion path — nearest-timestamp association,
16-bit depth decode, TUM quaternion parsing, groundtruth matching — runs
end-to-end on a long sequence:

    python -m dense_visual_odometry_tpu.apps.make_dataset -o /tmp/tum_synth \
        --frames 120 --motion medium
    python -m dense_visual_odometry_tpu.apps.benchmark tum-fr1 \
        -d /tmp/tum_synth -c configs/tpu_fast.json -o /tmp/out

Timestamps are offset between rgb and depth (+5 ms) so the association
logic is actually exercised rather than trivially aligned.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

# TUM RGB-D depth convention: 5000 DN per meter (depth_scale = 2e-4),
# matching the bundled set's camera_intrinsics.yaml.
TUM_DN_PER_M = 5000.0

_MOTIONS = {
    # (orbit radius m, wobble angle rad, forward advance m/frame)
    "bundled": (0.002, 0.002, 0.001),  # ~the bundled set's magnitude
    "medium": (0.01, 0.01, 0.004),
    "hard": (0.03, 0.04, 0.01),
}


def _quat_wxyz(rot: np.ndarray) -> np.ndarray:
    """Rotation matrix -> (w, x, y, z) quaternion (Shepperd pivoting)."""
    m = rot
    tr = np.trace(m)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        return np.array(
            [0.25 * s, (m[2, 1] - m[1, 2]) / s, (m[0, 2] - m[2, 0]) / s,
             (m[1, 0] - m[0, 1]) / s]
        )
    i = int(np.argmax(np.diag(m)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(m[i, i] - m[j, j] - m[k, k] + 1.0, 0.0)) * 2
    q = np.empty(4)
    q[0] = (m[k, j] - m[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (m[j, i] + m[i, j]) / s
    q[1 + k] = (m[k, i] + m[i, k]) / s
    return q


def write_tum_dataset(
    out_dir,
    n_frames: int = 60,
    motion: str = "medium",
    source_frame: int = 0,
    fps: float = 30.0,
    seed_t0: float = 1000.0,
    seed: int = 0,
) -> Path:
    """Render and write the dataset; returns the output directory.

    ``motion="handheld-fr1"`` renders the fr1-difficulty stand-in: a
    hand-held 6-DoF random-walk trajectory with fr1/desk per-frame motion
    statistics (incl. a rotation-dominant span and a fast span,
    ``io/synthetic.handheld_trajectory``) plus a Kinect sensor model —
    disparity-quantized depth with edge/speckle dropout and
    auto-exposure gain/bias wander with sensor noise on intensity
    (``degrade_depth``/``degrade_gray``).  Ingestion realism on top:
    +-2 ms timestamp jitter and ~1% dropped depth frames, so the TUM
    nearest-timestamp association (reference test_dvo.py:153-163) does
    real work.
    """
    import cv2

    from dense_visual_odometry_tpu.io.datasets import load_bundled_sequence
    from dense_visual_odometry_tpu.io.synthetic import (
        degrade_depth,
        degrade_gray,
        handheld_trajectory,
        orbit_trajectory,
        render_sequence,
    )

    out = Path(out_dir)
    (out / "rgb").mkdir(parents=True, exist_ok=True)
    (out / "depth").mkdir(parents=True, exist_ok=True)

    seq = load_bundled_sequence()
    rgb, depth_dn = seq.frame(source_frame)
    gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY).astype(np.float32)
    depth_m = depth_dn.astype(np.float32) * seq.camera.depth_scale
    k = np.asarray(seq.camera.intrinsics)[:3, :3]

    handheld = motion == "handheld-fr1"
    if handheld:
        poses = handheld_trajectory(n_frames, seed=seed)
    else:
        radius, angle, advance = _MOTIONS[motion]
        poses = orbit_trajectory(
            n_frames, radius=radius, angle=angle, advance=advance
        )
    grays, depths = render_sequence(gray, depth_m, k, poses)

    rng = np.random.default_rng(seed + 1)
    exposure_state: dict = {}

    rgb_lines = ["# color images", "# timestamp filename"]
    depth_lines = ["# depth maps", "# timestamp filename"]
    gt_lines = ["# ground truth trajectory", "# ts tx ty tz qx qy qz qw"]
    for i, (g, d, pose) in enumerate(zip(grays, depths, poses)):
        if handheld:
            g = degrade_gray(g, i, rng, exposure_state)
            d = degrade_depth(d, rng)
        ts_rgb = seed_t0 + i / fps
        # Depth timestamps deliberately offset so nearest-neighbour
        # association does real work (TUM sensors are unsynchronized);
        # the handheld set adds per-frame jitter on top.
        ts_depth = ts_rgb + 0.005
        if handheld:
            ts_rgb += float(rng.uniform(-0.002, 0.002))
            ts_depth += float(rng.uniform(-0.002, 0.002))
        rgb_name = f"rgb/{ts_rgb:.6f}.png"
        depth_name = f"depth/{ts_depth:.6f}.png"
        g8 = np.clip(np.round(g), 0, 255).astype(np.uint8)
        cv2.imwrite(str(out / rgb_name), np.stack([g8] * 3, axis=-1))
        rgb_lines.append(f"{ts_rgb:.6f} {rgb_name}")
        # ~1% of depth frames never arrive (Kinect frame drops); the
        # association then pairs the rgb frame with a neighbouring depth
        # frame like the reference's loader does on real fr1.
        if not (handheld and i > 0 and rng.random() < 0.01):
            d16 = np.clip(np.round(d * TUM_DN_PER_M), 0, 65535).astype(np.uint16)
            cv2.imwrite(str(out / depth_name), d16)
            depth_lines.append(f"{ts_depth:.6f} {depth_name}")
        q = _quat_wxyz(pose[:3, :3])
        t = pose[:3, 3]
        gt_lines.append(
            f"{ts_rgb:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
            f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}"
        )
    (out / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (out / "depth.txt").write_text("\n".join(depth_lines) + "\n")
    (out / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("-o", "--out", required=True, help="output directory")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument(
        "--motion", choices=sorted(_MOTIONS) + ["handheld-fr1"],
        default="medium",
        help="per-frame motion magnitude (handheld-fr1 = fr1-difficulty "
        "trajectory + Kinect sensor model)",
    )
    ap.add_argument("--source-frame", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    out = write_tum_dataset(
        args.out, n_frames=args.frames, motion=args.motion,
        source_frame=args.source_frame, seed=args.seed,
    )
    print(f"wrote {args.frames} frames to {out}")


if __name__ == "__main__":
    main()
