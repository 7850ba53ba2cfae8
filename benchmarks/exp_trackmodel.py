"""Frame-to-model tracking drift on the 500-frame fr1-difficulty set.

VERDICT r3 task 8 measurement: track the hard synthetic set with
`FrameToModelTracker` (TSDF raycast virtual keyframes) and report
ATE/RPE next to the keyframe-SLAM and odometry numbers measured through
the same CLI metrics.  One JSON line; appended to
benchmarks/trackmodel.jsonl.
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=str(REPO / "out" / "fr1_synth_500"))
    ap.add_argument("--config",
                    default=str(REPO / "configs" / "tpu_fast.json"))
    ap.add_argument("--illum", action="store_true", default=True)
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--extent", type=float, default=10.0)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--every", type=int, default=1)
    ap.add_argument("--kinfu", action="store_true",
                    help="per-frame model render (KinectFusion loop)")
    ap.add_argument("--raycast", default=None,
                    choices=["splat", "march"])
    ap.add_argument("--brick", action="store_true",
                    help="brick-grid sparse volume (round-5): "
                         "--resolution becomes the VIRTUAL resolution")
    ap.add_argument("--pool", type=int, default=24576)
    ap.add_argument("--trunc-voxels", type=float, default=4.0)
    ap.add_argument("--active", type=int, default=6144)
    ap.add_argument("--out",
                    default=str(REPO / "benchmarks" / "trackmodel.jsonl"))
    args = ap.parse_args()

    import jax

    from dense_visual_odometry_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(jax.default_backend())

    import numpy as np

    from dense_visual_odometry_tpu import metrics
    from dense_visual_odometry_tpu.config import RobustDVOConfig
    from dense_visual_odometry_tpu.io import load_tum_sequence
    from dense_visual_odometry_tpu.models.frame_to_model import (
        FrameToModelTracker,
        ModelTrackerPolicy,
    )
    from dense_visual_odometry_tpu.models.tsdf import TSDFConfig

    cfg_dict = json.loads(Path(args.config).read_text())
    if args.illum:
        cfg_dict["illumination"] = "bias"
    cfg = RobustDVOConfig.from_dict(cfg_dict)
    seq = load_tum_sequence(args.data, size=args.size)

    rgb0, depth0 = seq.frame(0)
    d0 = np.asarray(depth0, np.float64) * seq.camera.depth_scale
    z_med = float(np.median(d0[d0 > 0]))
    if args.brick:
        from dense_visual_odometry_tpu.models.brick_tsdf import (
            BrickTSDFConfig,
        )

        res = args.resolution - args.resolution % 8
        tcfg = BrickTSDFConfig.around(
            (0.0, 0.0, z_med), args.extent, resolution=res,
            truncation=args.trunc_voxels * args.extent / res,
            pool_size=args.pool, active_bricks=args.active,
        )
    else:
        tcfg = TSDFConfig.around(
            (0.0, 0.0, z_med), args.extent, resolution=args.resolution,
            truncation=4.0 * args.extent / args.resolution,
        )
    policy = ModelTrackerPolicy(
        render_every_frame=args.kinfu,
        raycast=args.raycast or ("march" if args.kinfu else "splat"),
    )
    tracker = FrameToModelTracker(
        seq.camera, cfg, tcfg, policy=policy, every=args.every
    )
    times = []
    for i, (rgb, depth) in enumerate(seq.prefetched()):
        t0 = time.perf_counter()
        tracker.step(rgb, depth)
        times.append(time.perf_counter() - t0)
        if i % 25 == 0:
            print(
                f"frame {i}: {times[-1] * 1e3:.0f} ms "
                f"(renders {tracker.renders}, failures {tracker.failures})",
                flush=True,
            )
    poses = tracker.trajectory()
    gt_rel = np.einsum(
        "ij,njk->nik", np.linalg.inv(seq.gt_poses[0]), seq.gt_poses
    )
    ate, _ = metrics.ate_rmse(poses, gt_rel)
    rpe_t, rpe_r = metrics.rpe(poses, gt_rel)
    rec = {
        "frames": len(poses),
        "ate_mm": round(ate * 1e3, 3),
        "rpe_trans_mm": round(rpe_t * 1e3, 4),
        "rpe_rot_deg": round(float(np.degrees(rpe_r)), 5),
        "median_frame_ms": round(float(np.median(times[2:])) * 1e3, 1),
        "renders": tracker.renders,
        "failures": tracker.failures,
        "voxel_m": round(tcfg.voxel_size, 4),
        "mode": "kinfu" if args.kinfu else "keyframe",
        "volume": "brick" if args.brick else "dense",
        "bricks_used": (
            int(tracker.volume.n_used) if args.brick else None
        ),
        "bricks_dropped": (
            int(tracker.volume.n_dropped) if args.brick else None
        ),
        "pool": args.pool if args.brick else None,
        "raycast": policy.raycast,
        "backend": jax.default_backend(),
    }
    line = json.dumps(rec)
    print(line, flush=True)
    with Path(args.out).open("a") as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    main()
