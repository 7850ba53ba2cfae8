"""Measure the multi-hypothesis init ladder on synthetic hard motion.

The ladder (`RobustDVOConfig.init_scale_ladder`) scores
exp(a * log(constant-velocity guess)) per batch element at the coarsest
level.  On smooth trajectories the a=1 rung wins everywhere and the
ladder is a no-op; the win case is velocity CHANGE — deceleration,
acceleration, reversal — where the plain {identity, guess} selector's
best candidate is a full velocity-step away from the truth.

This script renders orbit + velocity-step trajectories (io/synthetic,
exact ground truth) and compares ATE with the shipped fast config,
ladder off vs on.  CPU — selection logic is platform-independent.

Usage: python benchmarks/exp_ladder.py
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

    import numpy as np

    from dense_visual_odometry_tpu import metrics
    from dense_visual_odometry_tpu.camera import CameraModel
    from dense_visual_odometry_tpu.config import RobustDVOConfig
    from dense_visual_odometry_tpu.io import load_bundled_sequence, synthetic
    from dense_visual_odometry_tpu.models.session import OdometrySession

    import cv2

    seq = load_bundled_sequence()
    rgb, depth_raw = seq.frame(0)
    gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY).astype(np.float32)
    depth = depth_raw.astype(np.float32) * seq.camera.depth_scale
    k_mat = np.asarray(seq.camera.intrinsics, np.float32)
    camera = CameraModel.create(k_mat, 1.0)

    base = RobustDVOConfig.from_json(REPO / "configs" / "tpu_fast.json")
    # CPU study: the level kernel runs interpret-mode on CPU and is slow;
    # drop to the XLA fused path (identical math, RESULTS.md).
    base = dataclasses.replace(base, use_level_kernel=False)
    ladder = dataclasses.replace(base, init_scale_ladder=(0.25, 0.5, 1.5))

    def track(grays, depths, cfg):
        session = OdometrySession(camera, cfg)
        return np.stack(
            [
                np.asarray(session.step(g, d).matrix, np.float64)
                for g, d in zip(grays, depths)
            ]
        )

    def velocity_step_trajectory(n, advance_a, advance_b):
        """Straight dolly that abruptly changes speed at the midpoint."""
        poses = [np.eye(4)]
        for i in range(1, n):
            adv = advance_a if i <= n // 2 else advance_b
            p = poses[-1].copy()
            p = p @ synthetic.orbit_trajectory(
                2, radius=0.0, angle=0.0, advance=adv
            )[1]
            poses.append(p)
        return np.stack(poses)

    cases = {
        "orbit-mild": synthetic.orbit_trajectory(
            8, radius=0.01, angle=0.01, advance=0.005
        ),
        "orbit-rot-heavy": synthetic.orbit_trajectory(
            8, radius=0.01, angle=0.12, advance=0.005
        ),
        "decel-4x (30->7.5mm)": velocity_step_trajectory(8, 0.030, 0.0075),
        "accel-4x (7.5->30mm)": velocity_step_trajectory(8, 0.0075, 0.030),
        "reversal (20->-20mm)": velocity_step_trajectory(8, 0.020, -0.020),
    }

    print(f"{'case':24s} {'ATE off':>10s} {'ATE ladder':>12s}  ratio")
    for name, gt in cases.items():
        grays, depths = synthetic.render_sequence(gray, depth, k_mat, gt)
        ate_off, _ = metrics.ate_rmse(track(grays, depths, base), gt)
        ate_on, _ = metrics.ate_rmse(track(grays, depths, ladder), gt)
        r = ate_on / max(ate_off, 1e-9)
        print(
            f"{name:24s} {ate_off * 1e3:8.2f}mm {ate_on * 1e3:10.2f}mm "
            f"{r:6.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
