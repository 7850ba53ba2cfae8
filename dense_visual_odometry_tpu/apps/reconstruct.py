"""3-D reconstruction CLI: track (or load) a trajectory, fuse the frames
into a TSDF volume, export a triangle mesh.

Completes the map-export story past the reference's per-frame point-cloud
viewer (``/root/reference/src/visualize.py``) and this framework's own
PLY clouds (``apps/visualize.py``):

    # bundled 10-frame set -> mesh.ply (tracks with the fast config)
    python -m dense_visual_odometry_tpu.apps.reconstruct test \
        -c configs/tpu_fast.json -o out/mesh.ply

    # reuse an existing benchmark report's trajectory (no tracking)
    python -m dense_visual_odometry_tpu.apps.reconstruct test \
        --trajectory out/report.json -o out/mesh.ply

The volume bounds are fitted automatically to the observed geometry
(depth percentiles deprojected through the trajectory) unless given
explicitly.  Fusion runs device-side (jitted, donated volume); mesh
extraction is a one-shot host pass (marching tetrahedra).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from pathlib import Path

import numpy as np

logger = logging.getLogger("dvo.reconstruct")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TSDF reconstruction")
    p.add_argument("benchmark", choices=["test", "tum-fr1"])
    p.add_argument("-d", "--data-dir", type=str, default=None)
    p.add_argument("-c", "--config", type=str, default=None)
    p.add_argument("--camera", type=str, default=None, help="camera YAML (tum)")
    p.add_argument("-o", "--output", type=str, required=True,
                   help="mesh path (.ply, or .obj for Wavefront OBJ)")
    p.add_argument("-m", "--method",
                   choices=["robust-dvo", "slam", "track-model"],
                   default="robust-dvo",
                   help="track-model = frame-to-model tracking against "
                        "the live TSDF (raycast virtual keyframes)")
    p.add_argument("--track-volume-extent", type=float, default=8.0,
                   help="track-model: tracking-volume cube side (m), "
                        "centred on the first frame's observed surface")
    p.add_argument("--track-resolution", type=int, default=192,
                   help="track-model: tracking-volume voxels per axis")
    p.add_argument("--track-kinfu", action="store_true",
                   help="track-model: render the model prediction EVERY "
                        "frame (KinectFusion loop, marching raycast) "
                        "instead of keyframe-held renders")
    p.add_argument("--track-brick", action="store_true",
                   help="track-model: brick-grid sparse tracking volume "
                        "(surface-band bricks only) — lifts the dense "
                        "O(N^3) resolution ceiling; --track-resolution "
                        "becomes the VIRTUAL resolution")
    p.add_argument("--track-pool", type=int, default=16384,
                   help="--track-brick: brick pool capacity")
    p.add_argument("--brick", action="store_true",
                   help="fuse/export with the brick-grid sparse volume "
                        "(models/brick_tsdf.py) instead of the dense one")
    p.add_argument("--pool", type=int, default=32768,
                   help="--brick: brick pool capacity")
    p.add_argument("--trajectory", type=str, default=None,
                   help="report JSON or TUM txt with poses (skips tracking)")
    p.add_argument("--size", type=int, default=None, help="frame limit")
    p.add_argument("--every", type=int, default=1, help="fuse every Nth frame")
    p.add_argument("--resolution", type=int, default=192,
                   help="voxels along the longest volume axis")
    p.add_argument("--voxel", type=float, default=None,
                   help="voxel size in meters (overrides --resolution)")
    p.add_argument("--truncation", type=float, default=None,
                   help="TSDF truncation in meters (default 4 voxels)")
    p.add_argument("--min-weight", type=float, default=1.0)
    p.add_argument("--adaptive-truncation", type=float, default=0.0,
                   help="widen the band with depth: tau(z) = truncation "
                        "+ A*z^2 (Kinect disparity-noise model)")
    p.add_argument("--carve", type=float, default=0.0,
                   help="space-carving weight decay in [0,1] for voxels "
                        "where free-space views conflict with a stored "
                        "surface (dynamic-object removal)")
    p.add_argument("--platform", type=str, default=None,
                   choices=["cpu", "tpu", "axon"])
    p.add_argument("-v", "--verbose", action="store_true")
    return p.parse_args(argv)


def _load_trajectory_poses(path: Path, n_frames: int) -> np.ndarray:
    """Report-JSON or TUM-txt -> (N, 4, 4) camera-to-world poses."""
    from dense_visual_odometry_tpu.io import trajectory

    if path.suffix == ".json":
        report = json.loads(path.read_text())
        poses = np.asarray(report["poses"], dtype=np.float64)
    else:
        _, poses = trajectory.load_tum_trajectory(path)
        poses = np.asarray(poses, dtype=np.float64)
    if len(poses) < n_frames:
        raise ValueError(
            f"trajectory has {len(poses)} poses for {n_frames} frames"
        )
    return poses[:n_frames]


def _track_poses(seq, cfg, method: str, args=None) -> np.ndarray:
    import jax.numpy as jnp

    if method == "track-model":
        from dense_visual_odometry_tpu.models.frame_to_model import (
            FrameToModelTracker,
            ModelTrackerPolicy,
        )
        from dense_visual_odometry_tpu.models.tsdf import TSDFConfig

        # Tracking volume centred on the first frame's observed median
        # surface point (the map grows into it as the camera moves).
        rgb0, depth0 = seq.frame(0)
        d0 = np.asarray(depth0, np.float64) * seq.camera.depth_scale
        z_med = float(np.median(d0[d0 > 0])) if np.any(d0 > 0) else 2.0
        extent = args.track_volume_extent if args else 8.0
        res = args.track_resolution if args else 192
        center = (0.0, 0.0, z_med)
        if args and getattr(args, "track_brick", False):
            from dense_visual_odometry_tpu.models.brick_tsdf import (
                BrickTSDFConfig,
            )

            res -= res % 8  # virtual resolution: brick multiple
            tcfg = BrickTSDFConfig.around(
                center, extent, resolution=res,
                truncation=4.0 * extent / res,
                pool_size=int(args.track_pool),
            )
        else:
            tcfg = TSDFConfig.around(
                center, extent, resolution=res,
                truncation=4.0 * extent / res,
            )
        kinfu = bool(args and getattr(args, "track_kinfu", False))
        policy = ModelTrackerPolicy(
            render_every_frame=kinfu,
            raycast="march" if kinfu else "splat",
        )
        tracker = FrameToModelTracker(seq.camera, cfg, tcfg, policy=policy)
        for rgb, depth in seq.prefetched():
            tracker.step(rgb, depth)
        logger.info(
            "track-model: %d virtual-keyframe renders, %d failed solves",
            tracker.renders, tracker.failures,
        )
        if hasattr(tracker.volume, "n_used"):
            logger.info(
                "tracking brick volume: %d / %d bricks used, %d dropped",
                int(tracker.volume.n_used), tcfg.pool_size,
                int(tracker.volume.n_dropped),
            )
        return tracker.trajectory()

    if method == "slam":
        from dense_visual_odometry_tpu.models.slam import SlamSession

        session = SlamSession(seq.camera, cfg)
        for rgb, depth in seq.prefetched():
            session.step(jnp.asarray(rgb), jnp.asarray(depth))
        return np.asarray(session.optimized_trajectory(), dtype=np.float64)

    from dense_visual_odometry_tpu.models.session import OdometrySession

    session = OdometrySession(seq.camera, cfg)
    poses = []
    for rgb, depth in seq.prefetched():
        pose = session.step(jnp.asarray(rgb), jnp.asarray(depth))
        poses.append(np.asarray(pose.matrix, dtype=np.float64))
    return np.stack(poses)


def _fit_bounds(frames, intrinsics, poses, pad: float):
    """World-space AABB of the observed surface (depth percentiles of a
    pixel subsample deprojected through the trajectory)."""
    k_inv = np.linalg.inv(intrinsics)
    lo = np.full(3, np.inf)
    hi = np.full(3, -np.inf)
    for (depth_m, _), pose in zip(frames, poses):
        d = depth_m[::8, ::8]
        vs, us = np.nonzero(d > 0)
        if len(vs) == 0:
            continue
        z = d[vs, us]
        # Trim far outliers so one bad pixel can't blow the volume up.
        keep = z <= np.percentile(z, 98.0)
        vs, us, z = vs[keep], us[keep], z[keep]
        pix = np.stack([us * 8, vs * 8, np.ones_like(us)], axis=0)
        rays = k_inv @ pix
        pts = (rays * z).T @ pose[:3, :3].T + pose[:3, 3]
        lo = np.minimum(lo, pts.min(axis=0))
        hi = np.maximum(hi, pts.max(axis=0))
    if not np.all(np.isfinite(lo)):
        raise ValueError("no valid depth in the sequence")
    return lo - pad, hi + pad


def main(argv=None) -> int:
    args = parse_args(argv)
    logging.basicConfig(level=logging.DEBUG if args.verbose else logging.INFO)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from dense_visual_odometry_tpu.config import RobustDVOConfig
    from dense_visual_odometry_tpu.io import load_bundled_sequence, load_tum_sequence
    from dense_visual_odometry_tpu.models import tsdf
    from dense_visual_odometry_tpu.ops.pyramid import preprocess_depth, rgb_to_gray

    if args.benchmark == "test":
        seq = load_bundled_sequence(args.data_dir, size=args.size)
    else:
        seq = load_tum_sequence(args.data_dir, camera_yaml=args.camera,
                                size=args.size)
    cfg = (
        RobustDVOConfig.from_json(args.config)
        if args.config
        else RobustDVOConfig(levels=4, use_weighter=True)
    )

    if args.trajectory:
        poses = _load_trajectory_poses(Path(args.trajectory), len(seq))
        logger.info("loaded %d poses from %s", len(poses), args.trajectory)
    else:
        t0 = time.perf_counter()
        poses = _track_poses(seq, cfg, args.method, args)
        logger.info(
            "tracked %d frames with %s in %.1f s",
            len(poses), args.method, time.perf_counter() - t0,
        )

    # Host-side gray/metric-depth conversion (fusion consumes level-0
    # images; reuses the exact session preprocessing ops).
    frames = []
    for rgb, depth in seq.prefetched():
        gray = np.asarray(rgb_to_gray(jnp.asarray(rgb))) if rgb.ndim == 3 else rgb
        depth_m = np.asarray(
            preprocess_depth(jnp.asarray(depth), seq.camera.depth_scale, cfg.max_distance)
        )
        frames.append((depth_m, np.asarray(gray, dtype=np.float32)))
    frames = frames[:: args.every]
    poses_f = poses[:: args.every]

    k = np.asarray(seq.camera.intrinsics, dtype=np.float32)[:3, :3]
    lo, hi = _fit_bounds(frames, k, poses_f, pad=0.05)
    extent = hi - lo
    if args.voxel is not None:
        voxel = args.voxel
    else:
        voxel = float(extent.max()) / args.resolution
    cap = 1024 if args.brick else 512  # sparse pool lifts the axis cap
    dims = tuple(
        int(min(max(np.ceil(e / voxel), 8), cap)) for e in extent[::-1]
    )  # (D, H, W) = (z, y, x)
    trunc = args.truncation if args.truncation is not None else 4.0 * voxel
    if args.brick:
        from dense_visual_odometry_tpu.models import brick_tsdf

        vcfg = brick_tsdf.BrickTSDFConfig(
            brick_grid=tuple(-(-d // 8) for d in dims),
            brick_size=8, pool_size=int(args.pool),
            voxel_size=voxel, origin=tuple(lo), truncation=trunc,
            truncation_scale_sq=args.adaptive_truncation,
            carve_decay=args.carve,
        )
        logger.info(
            "brick volume %s (virtual) voxel %.4f m bounds %s -> %s "
            "(pool %d bricks = %.0f MVox cap)",
            vcfg.dims, voxel, np.round(lo, 3), np.round(hi, 3),
            args.pool, args.pool * 512 / 1e6,
        )
        t0 = time.perf_counter()
        vol = brick_tsdf.make_brick_volume(vcfg)
        kj = np.asarray(k, np.float32)
        import jax.numpy as jnp_

        for (depth_m, gray), pose in zip(frames, poses_f):
            vol = brick_tsdf.integrate_brick(
                vol, jnp_.asarray(depth_m, jnp_.float32),
                jnp_.asarray(gray, jnp_.float32), jnp_.asarray(kj),
                jnp_.asarray(pose, jnp_.float32), vcfg,
            )
        np.asarray(vol.weight)  # force completion (tunneled backends)
        t_fuse = time.perf_counter() - t0
        logger.info(
            "fused %d frames in %.2f s (%.1f ms/frame); %d/%d bricks, "
            "%d dropped",
            len(frames), t_fuse, t_fuse / max(len(frames), 1) * 1e3,
            int(vol.n_used), args.pool, int(vol.n_dropped),
        )
        t0 = time.perf_counter()
        verts, faces, gray_v = brick_tsdf.extract_mesh_bricks(
            vol, vcfg, min_weight=args.min_weight
        )
    else:
        vcfg = tsdf.TSDFConfig(
            dims=dims, voxel_size=voxel, origin=tuple(lo), truncation=trunc,
            truncation_scale_sq=args.adaptive_truncation,
            carve_decay=args.carve,
        )
        logger.info(
            "volume %s voxel %.4f m bounds %s -> %s (%.0f MVox)",
            dims, voxel, np.round(lo, 3), np.round(hi, 3),
            np.prod(dims) / 1e6,
        )

        t0 = time.perf_counter()
        vol = tsdf.integrate_frames(
            tsdf.make_volume(vcfg), frames, k, poses_f, vcfg
        )
        np.asarray(vol.weight)  # force completion (tunneled backends)
        t_fuse = time.perf_counter() - t0
        logger.info(
            "fused %d frames in %.2f s (%.1f ms/frame)",
            len(frames), t_fuse, t_fuse / max(len(frames), 1) * 1e3,
        )

        t0 = time.perf_counter()
        verts, faces, gray_v = tsdf.extract_mesh(
            vol, vcfg, min_weight=args.min_weight
        )
    logger.info(
        "extracted %d vertices / %d faces in %.2f s",
        len(verts), len(faces), time.perf_counter() - t0,
    )
    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    if out.suffix.lower() == ".obj":
        tsdf.save_mesh_obj(out, verts, faces, gray_v)
    else:
        tsdf.save_mesh_ply(out, verts, faces, gray_v)
    logger.info("mesh -> %s", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
