"""Benchmark CLI: track a sequence, report timing + accuracy.

Capability parity with the reference benchmark runner
(``/root/reference/src/test_dvo.py:26-56,298-345``): same dataset choices
(``test`` bundled set / ``tum-fr1`` directory), JSON method config, report
JSON + TUM trajectory export, per-frame timing and error logs — plus
in-framework ATE-RMSE / RPE (the reference delegated those to external TUM
tooling).

Usage::

    python -m dense_visual_odometry_tpu.apps.benchmark test
    python -m dense_visual_odometry_tpu.apps.benchmark tum-fr1 -d <dir> \
        -c config.json -o out/ --size 100 --platform cpu

Timing notes: the first frame includes XLA compilation; the summary
separates warm-up from steady-state.  ``--platform cpu`` forces the CPU
backend (this must happen before first JAX use, handled in ``main``).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from pathlib import Path

logger = logging.getLogger("dvo.benchmark")


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Dense visual odometry benchmark")
    parser.add_argument("benchmark", choices=["test", "tum-fr1", "tum"], help="dataset type")
    parser.add_argument("-d", "--data-dir", type=str, default=None, help="dataset directory")
    parser.add_argument("-c", "--config", type=str, default=None, help="JSON solver config")
    parser.add_argument("-o", "--output-dir", type=str, default=None, help="output directory")
    parser.add_argument("--camera", type=str, default=None, help="camera intrinsics YAML")
    parser.add_argument("-s", "--size", type=int, default=None, help="max frames")
    parser.add_argument("-m", "--method", type=str, default="robust-dvo",
                        choices=["robust-dvo", "slam", "sparse"],
                        help="tracking pipeline (default: robust-dvo, the "
                        "reference's frame-to-frame solver)")
    parser.add_argument("--platform", type=str, default=None, choices=["cpu", "tpu", "axon"],
                        help="force a JAX platform (default: environment's)")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="capture a device trace (XPlane) into this dir")
    parser.add_argument("--pipeline", action="store_true",
                        help="depth-1 pipelined stepping: dispatch frame "
                        "k+1 before reading frame k's pose, overlapping "
                        "host->device upload with the previous solve "
                        "(steady-state latency of a streaming deployment; "
                        "poses lag by one frame during the run)")
    parser.add_argument("--slam-refine-caps", type=str, default=None,
                        help="two-step SLAM: per-level refinement caps, "
                             "finest first, e.g. 6,4,3,3")
    parser.add_argument("--slam-two-step", action="store_true",
                        help="SLAM: frame-to-frame solve on the fused "
                             "kernel path + short frame-to-keyframe "
                             "refinement, one device program "
                             "(KeyframePolicy.two_step_tracking)")
    parser.add_argument("--sparse-matcher", type=str, default="zncc",
                        choices=["zncc", "learned"],
                        help="matcher for -m sparse: classical Harris+ZNCC "
                        "or the LoFTR-lite learned coarse matcher "
                        "(models/matcher.py, committed weights)")
    parser.add_argument("--host-gray", action="store_true",
                        help="convert RGB to uint8 gray on the HOST before "
                        "upload (reference uint8-gray semantics; ~40%% "
                        "smaller per-frame payload — the lever when the "
                        "host->device link, not compute, bounds latency)")
    parser.add_argument("--pyr-down", action="store_true",
                        help="track at half resolution (median-blur + "
                        "decimate, intrinsics rescaled; the reference's "
                        "pyr_down option, which crashed there — "
                        "SURVEY quirk #6)")
    parser.add_argument("--dense-refine", action="store_true",
                        help="SLAM only: after the run, refine retained "
                        "keyframes with dense photometric BA (joint pose "
                        "+ inverse depth, Schur-eliminated on device)")
    parser.add_argument("-v", "--verbose", action="store_true")
    return parser.parse_args(argv)


def _make_stepper(
    method: str, seq, cfg, sparse_matcher: str = "zncc",
    host_gray: bool = False, dense_refine: bool = False,
    slam_two_step: bool = False,
    slam_refine_caps=None,
):
    """-> (step(rgb, depth) -> (4,4) np pose, finalize() -> extra dict)."""
    import numpy as np

    if method == "slam":
        from dense_visual_odometry_tpu.models.slam import (
            KeyframePolicy,
            SlamSession,
        )

        policy = None
        if slam_two_step:
            kw = {}
            if slam_refine_caps:
                kw["refine_max_iterations"] = tuple(
                    int(x) for x in str(slam_refine_caps).split(",")
                )
            policy = KeyframePolicy(two_step_tracking=True, **kw)
        slam = SlamSession(seq.camera, cfg, policy=policy)

        def step(rgb, depth):
            return np.asarray(slam.step(rgb, depth).matrix, dtype=np.float64)

        def finalize():
            extra = {"keyframes": slam.num_keyframes}
            if dense_refine:
                # Pose graph first (loop-closure consistency), then the
                # dense photometric pass over retained keyframes, with
                # the refined inverse depths fed back into the live
                # keyframe pyramids (models/slam.py refine_dense).
                slam.optimize_full()
                result = slam.refine_dense(update_depths=True)
                extra["dense_refined"] = result is not None
            extra["optimized_poses"] = slam.optimized_trajectory()
            return extra

        return step, finalize

    if method == "sparse":
        import cv2

        from dense_visual_odometry_tpu.models.sparse import SparseVO

        vo = SparseVO(seq.camera, matcher=sparse_matcher)

        def step(rgb, depth):
            gray = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY).astype(np.float32)
            pose = vo.step(gray, depth)
            return np.asarray(pose, dtype=np.float64)

        return step, dict

    from dense_visual_odometry_tpu.models.session import OdometrySession

    session = OdometrySession(seq.camera, cfg)

    if host_gray:
        from dense_visual_odometry_tpu.io.datasets import host_gray_u8

        def step(rgb, depth):
            # Upload-bound streaming mode: gray conversion on host cuts
            # the per-frame payload ~40% (uint8 gray + uint16 depth).
            return session.step(host_gray_u8(rgb), depth).matrix

        return step, dict

    def step(rgb, depth):
        # Returns the DEVICE pose matrix (no host sync) so the caller can
        # pipeline: the non-pipelined loop converts immediately.
        return session.step(rgb, depth).matrix

    return step, dict


def run(args) -> dict:
    import jax
    import numpy as np

    from dense_visual_odometry_tpu import metrics
    from dense_visual_odometry_tpu.config import RobustDVOConfig
    from dense_visual_odometry_tpu.io import (
        load_bundled_sequence,
        load_tum_sequence,
        trajectory,
    )

    if args.benchmark == "test":
        seq = load_bundled_sequence(args.data_dir, size=args.size)
    else:
        seq = load_tum_sequence(args.data_dir, camera_yaml=args.camera, size=args.size)

    if args.pyr_down:
        from dense_visual_odometry_tpu.io.datasets import pyr_down_sequence

        seq = pyr_down_sequence(seq)

    cfg = RobustDVOConfig.from_json(args.config) if args.config else RobustDVOConfig(
        levels=4, use_weighter=True
    )
    logger.info("sequence '%s': %d frames; config: %s", seq.name, len(seq), cfg)
    logger.info("jax backend: %s (%d devices)", jax.default_backend(), jax.device_count())

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    step, finalize = _make_stepper(
        args.method, seq, cfg, getattr(args, "sparse_matcher", "zncc"),
        host_gray=bool(getattr(args, "host_gray", False)),
        dense_refine=bool(getattr(args, "dense_refine", False)),
        slam_two_step=bool(getattr(args, "slam_two_step", False)),
        slam_refine_caps=getattr(args, "slam_refine_caps", None),
    )

    pipeline = bool(getattr(args, "pipeline", False)) and args.method == "robust-dvo"
    poses, frame_times = [], []
    pending = None
    t_start = time.perf_counter()
    for i, (rgb, depth) in enumerate(seq.prefetched()):
        t0 = time.perf_counter()
        out = step(rgb, depth)
        if pipeline:
            # Depth-1 pipeline: dispatch this frame, then read the
            # PREVIOUS frame's pose — upload/solve overlap across frames.
            if pending is not None:
                poses.append(np.asarray(pending, dtype=np.float64))
            pending = out
        else:
            poses.append(np.asarray(out, dtype=np.float64))
        dt = time.perf_counter() - t0
        frame_times.append(dt)
        if poses and seq.gt_poses is not None:
            # Reference-style per-frame error logs (test_dvo.py:313-321).
            # gt poses are absolute; compare relative to the first frame.
            j = len(poses) - 1
            gt_rel = np.linalg.inv(seq.gt_poses[0]) @ seq.gt_poses[j]
            terr = np.linalg.norm(poses[-1][:3, 3] - gt_rel[:3, 3])
            logger.info("frame %d: %.1f ms, trans err %.4f m", i, dt * 1e3, terr)
        else:
            logger.info("frame %d: %.1f ms", i, dt * 1e3)
    if pending is not None:
        poses.append(np.asarray(pending, dtype=np.float64))
    total_time = time.perf_counter() - t_start
    transforms = [np.eye(4)]
    for j in range(1, len(poses)):
        transforms.append(np.linalg.inv(poses[j]) @ poses[j - 1])
    if args.profile_dir:
        jax.profiler.stop_trace()
        logger.info("device trace -> %s", args.profile_dir)

    extra = finalize()
    poses = np.stack(poses)
    if "optimized_poses" in extra:
        # SLAM backend: report the BA-refined trajectory.
        poses = np.asarray(extra.pop("optimized_poses"))
    steady = frame_times[1:] if len(frame_times) > 1 else frame_times
    summary = {
        "frames": len(seq),
        "method": args.method,
        "total_time_s": total_time,
        "first_frame_s": frame_times[0],
        "mean_frame_ms": float(np.mean(steady) * 1e3),
        "median_frame_ms": float(np.median(steady) * 1e3),
        "fps": float(1.0 / np.mean(steady)),
        "backend": jax.default_backend(),
        **extra,
    }

    if seq.gt_poses is not None:
        gt_rel = np.einsum(
            "ij,njk->nik", np.linalg.inv(seq.gt_poses[0]), seq.gt_poses
        )
        ate, _ = metrics.ate_rmse(poses, gt_rel)
        rpe_t, rpe_r = metrics.rpe(poses, gt_rel)
        trans_err, rot_err = metrics.per_frame_errors(poses, gt_rel)
        summary.update(
            ate_rmse_m=ate,
            rpe_trans_rmse_m=rpe_t,
            rpe_rot_rmse_rad=rpe_r,
            mean_trans_err_m=float(trans_err.mean()),
            mean_rot_err_rad=float(rot_err.mean()),
        )

    if args.output_dir:
        out = Path(args.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        trajectory.save_tum_trajectory(out / "trajectory.txt", seq.timestamps, poses)
        trajectory.save_report(
            out / "report.json",
            sequence_info=seq.extra,
            timestamps=seq.timestamps,
            estimated_poses=poses,
            transforms=transforms,
            gt_poses=seq.gt_poses,
            per_frame=[{"time_s": t} for t in frame_times],
            summary=summary,
        )
        logger.info("report written to %s", out)

    print(json.dumps(summary))
    return summary


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s - %(name)s - %(levelname)s: %(message)s",
        stream=sys.stdout,
    )
    if args.platform is not None:
        # Must happen before first JAX use; applies to every listed choice
        # so the reported backend always matches the request (a silently
        # ignored --platform tpu would misrepresent the measurement).
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from dense_visual_odometry_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(jax.default_backend())
    return run(args)


if __name__ == "__main__":
    main()
