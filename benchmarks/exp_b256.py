"""Does batch 256 move the throughput ceiling past B=128?

Round-2 batch scaling flattened toward B=128 (344.7 / 449.5 / 534.8 fps
pre-level-kernel at B=32/64/128; ~600 fps at B=128 with it).  One open
question: whether another doubling still pays, or VMEM pressure /
scheduling overhead ends the curve.  The level-0 kernels already need an
explicit 96 MiB Mosaic scoped-VMEM grant at B=128; the per-element grid
means per-block VMEM does not grow with B, but the surrounding program's
buffers do.

Run on the real TPU:  python benchmarks/exp_b256.py  [--batches 128 256]
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
    ap.add_argument("--batches", type=int, nargs="*", default=[128, 256])
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    from dense_visual_odometry_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(jax.default_backend())

    import jax.numpy as jnp
    import numpy as np

    from dense_visual_odometry_tpu.config import RobustDVOConfig, TWeighterConfig
    from dense_visual_odometry_tpu.io import load_bundled_sequence
    from dense_visual_odometry_tpu.models.robust import preprocess_frame
    from dense_visual_odometry_tpu.parallel import (
        batched_track_pair,
        stack_frame_data,
    )

    cfg = RobustDVOConfig(
        levels=4, max_iterations=12, use_weighter=True,
        packed_sampling=True, grid_strides=(2, 2, 1, 1),
        weighter=TWeighterConfig(scale_subsample=4),
        shift_stack_radius=3, shift_stack_levels=(0, 1, 2),
        approximate_image2_gradient=True,
        relative_tolerance=1e-2, lm_lambda0=1e-4,
        use_pallas_stack=True, use_fused_iteration=True,
        freeze_shift_window=True, use_level_kernel=True,
        shift_stack_fallback=True, robust_init_selection=True,
    )
    seq = load_bundled_sequence()
    pre = jax.jit(
        lambda img, dep: preprocess_frame(
            img, dep, seq.camera, levels=cfg.levels,
            max_distance=cfg.max_distance,
        )
    )
    frames = [pre(jnp.asarray(r), jnp.asarray(d)) for r, d in seq.prefetched()]
    pairs = [(frames[i], frames[i + 1]) for i in range(len(frames) - 1)]
    k = jnp.asarray(seq.camera.intrinsics)

    out = {"device": str(jax.devices()[0])}
    for b in args.batches:
        tiled = (pairs * (-(-b // len(pairs))))[:b]
        prev_b = stack_frame_data([p for p, _ in tiled])
        curr_b = stack_frame_data([c for _, c in tiled])

        def run_once():
            r = batched_track_pair(prev_b, curr_b, k, cfg)
            np.asarray(r.transform)

        try:
            run_once()  # compile + warm
            run_once()
            t0 = time.perf_counter()
            for _ in range(args.iters):
                run_once()
            dt = time.perf_counter() - t0
            out[f"fps_b{b}"] = round(b * args.iters / dt, 1)
            out[f"ms_b{b}"] = round(dt / args.iters * 1e3, 1)
        except Exception as e:  # VMEM blowup is a finding, not a crash
            out[f"fps_b{b}"] = None
            out[f"error_b{b}"] = f"{type(e).__name__}: {str(e)[:200]}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
