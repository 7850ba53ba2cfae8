"""Multi-stream SLAM serving throughput: aggregate frames/s at B streams.

VERDICT r3 task 7 measurement: B independent SLAM sessions share one
batched fused front-end step (models/batched_slam.py), so the per-frame
transport floor is paid once per BATCH instead of once per stream.
Streams run the bundled 10-frame set with per-stream start offsets
(desynchronized keyframe promotions — the realistic serving mix).

One JSON line per B; appended to benchmarks/slamstreams.jsonl.
Run on the real TPU.
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
    ap.add_argument("--streams", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--config",
                    default=str(REPO / "configs" / "tpu_fast.json"))
    ap.add_argument("--illum", action="store_true", default=True)
    ap.add_argument("--two-step", action="store_true",
                    help="two-step tracking (batched prev-frame state, "
                         "round 5): frame-to-prev kernel solve + short "
                         "keyframe refinement in the fused batched step")
    ap.add_argument("--out",
                    default=str(REPO / "benchmarks" / "slamstreams.jsonl"))
    args = ap.parse_args()

    import jax

    from dense_visual_odometry_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(jax.default_backend())

    import numpy as np

    from dense_visual_odometry_tpu.config import RobustDVOConfig
    from dense_visual_odometry_tpu.io import load_bundled_sequence
    from dense_visual_odometry_tpu.models.batched_slam import (
        BatchedSlamSession,
    )
    from dense_visual_odometry_tpu.models.slam import KeyframePolicy

    policy = (
        KeyframePolicy(two_step_tracking=True) if args.two_step else None
    )

    cfg_dict = json.loads(Path(args.config).read_text())
    if args.illum:
        cfg_dict["illumination"] = "bias"
    cfg = RobustDVOConfig.from_dict(cfg_dict)
    seq = load_bundled_sequence()
    frames = [seq.frame(i) for i in range(len(seq))]
    n_src = len(frames)
    out_path = Path(args.out)

    for b in args.streams:
        slam = BatchedSlamSession(seq.camera, cfg, n_streams=b,
                                  policy=policy)

        def batch_at(t):
            imgs, deps = [], []
            for s in range(b):
                rgb, dep = frames[(t + s) % n_src]
                imgs.append(rgb)
                deps.append(dep)
            return imgs, deps

        # Warmup (includes compiles + first promotions).
        warm = 4
        t_start = time.perf_counter()
        for t in range(warm):
            slam.step(*batch_at(t))
        compile_s = time.perf_counter() - t_start

        times = []
        for t in range(warm, args.frames):
            it0 = time.perf_counter()
            slam.step(*batch_at(t))
            times.append(time.perf_counter() - it0)
        med = float(np.median(times))
        # Attribution: the relay tunnel serializes the host->device
        # payload (B x ~1.5 MB/frame), so aggregate fps can be
        # transport-bound rather than chip-bound.  Separate the two:
        # (a) upload-only: device_put + sync of one frame batch;
        # (b) solve-only: the fused batched step fed DEVICE-resident
        #     arrays (upload skipped), pack read back.
        from dense_visual_odometry_tpu.models.batched_slam import (
            _fused_step_batched,
        )

        imgs, deps = batch_at(args.frames)
        img_b = np.ascontiguousarray(np.stack(imgs))
        dep_b = np.ascontiguousarray(np.stack(deps))
        up_times, sv_times = [], []
        img_d = dep_d = None
        for _ in range(5):
            u0 = time.perf_counter()
            img_d = jax.device_put(img_b)
            dep_d = jax.device_put(dep_b)
            np.asarray(img_d[0, 0, 0]); np.asarray(dep_d[0, 0, 0])
            up_times.append(time.perf_counter() - u0)
        init_b = np.stack(
            [s_.init_guess() for s_ in slam.sessions]
        ).astype(np.float32)
        if args.two_step:
            from dense_visual_odometry_tpu.models.batched_slam import (
                _fused_step_two_batched,
            )

            prev_from_kf = np.stack(
                [np.linalg.inv(s_._rel_to_kf) for s_ in slam.sessions]
            ).astype(np.float32)
            inc_b = np.stack(
                [s_._last_inc for s_ in slam.sessions]
            ).astype(np.float32)
            for _ in range(6):
                s0 = time.perf_counter()
                _, pack_d = _fused_step_two_batched(
                    slam._keyframes, slam._prev_fds, img_d, dep_d,
                    slam._intrinsics, np.float32(seq.camera.depth_scale),
                    inc_b, prev_from_kf, cfg, slam._cfg_refine,
                )
                np.asarray(pack_d)
                sv_times.append(time.perf_counter() - s0)
        else:
            for _ in range(6):
                s0 = time.perf_counter()
                _, pack_d = _fused_step_batched(
                    slam._keyframes, img_d, dep_d, slam._intrinsics,
                    np.float32(seq.camera.depth_scale), init_b, cfg,
                )
                np.asarray(pack_d)
                sv_times.append(time.perf_counter() - s0)
        rec = {
            "streams": b,
            "two_step": bool(args.two_step),
            "frames_per_stream": args.frames - warm,
            "compile_plus_warm_s": round(compile_s, 1),
            "median_batch_ms": round(med * 1e3, 1),
            "aggregate_fps": round(b / med, 1),
            "per_stream_fps": round(1.0 / med, 2),
            "mean_batch_ms": round(float(np.mean(times)) * 1e3, 1),
            "keyframes": slam.num_keyframes,
            "upload_only_ms": round(float(np.median(up_times)) * 1e3, 1),
            "solve_only_ms": round(float(np.median(sv_times[1:])) * 1e3, 1),
        }
        line = json.dumps(rec)
        print(line, flush=True)
        with out_path.open("a") as fh:
            fh.write(line + "\n")
    print("slam streams done", flush=True)


if __name__ == "__main__":
    main()
