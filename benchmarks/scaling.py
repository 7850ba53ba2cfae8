"""Weak-scaling report for batched tracking over a device mesh.

Usage::

    python benchmarks/scaling.py            # all local devices
    python benchmarks/scaling.py --cpu-sim  # 8 simulated CPU devices

For device counts 1, 2, 4, ... N the batch grows proportionally
(PAIRS_PER_DEVICE pairs per device — weak scaling), the batch is sharded
over a 1-D mesh, and throughput + efficiency vs the 1-device run are
reported as one JSON line per point.  On a real multi-chip slice this is
the BASELINE.json config-5 measurement; on the CPU simulation it
validates the mechanism (simulated devices share physical cores, so
efficiency numbers are not meaningful there — the report says which).
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

PAIRS_PER_DEVICE = 8
ITERS = 3


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu-sim", action="store_true",
                        help="force 8 simulated CPU devices")
    parser.add_argument("--pairs-per-device", type=int, default=PAIRS_PER_DEVICE)
    args = parser.parse_args()

    if args.cpu_sim:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from dense_visual_odometry_tpu.config import RobustDVOConfig, TWeighterConfig
    from dense_visual_odometry_tpu.io import load_bundled_sequence
    from dense_visual_odometry_tpu.models.robust import preprocess_frame
    from dense_visual_odometry_tpu.parallel import (
        batched_track_pair,
        make_mesh,
        shard_batch,
        stack_frame_data,
    )

    seq = load_bundled_sequence()
    cfg = RobustDVOConfig(
        levels=4, max_iterations=12, use_weighter=True,
        packed_sampling=True, grid_strides=(2, 2, 1, 1),
        weighter=TWeighterConfig(scale_subsample=4),
        shift_stack_radius=4, shift_stack_levels=(0, 1, 2),
    )
    pre = jax.jit(
        lambda img, dep: preprocess_frame(img, dep, seq.camera, levels=cfg.levels)
    )
    frames = [pre(jnp.asarray(r), jnp.asarray(d)) for r, d in seq.prefetched()]
    base_pairs = [(frames[i], frames[i + 1]) for i in range(len(frames) - 1)]
    k = jnp.asarray(seq.camera.intrinsics)

    devices = jax.devices()
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    fps_at_1 = None
    for n in counts:
        mesh = make_mesh(devices[:n])
        batch = n * args.pairs_per_device
        pairs = (base_pairs * (-(-batch // len(base_pairs))))[:batch]
        prev_b = shard_batch(stack_frame_data([p for p, _ in pairs]), mesh)
        curr_b = shard_batch(stack_frame_data([c for _, c in pairs]), mesh)

        out = batched_track_pair(prev_b, curr_b, k, cfg)
        np.asarray(out.transform)
        times = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            out = batched_track_pair(prev_b, curr_b, k, cfg)
            np.asarray(out.transform)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        fps = batch / dt
        if fps_at_1 is None:
            fps_at_1 = fps
        print(json.dumps({
            "devices": n,
            "batch": batch,
            "ms_per_batch": round(dt * 1e3, 1),
            "fps": round(fps, 1),
            "weak_scaling_efficiency": round(fps / (fps_at_1 * n), 3),
            "simulated": bool(args.cpu_sim or jax.default_backend() == "cpu"),
        }), flush=True)


if __name__ == "__main__":
    main()
