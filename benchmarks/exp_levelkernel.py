"""Measure the level-fused solver kernel end-to-end on the real device.

Times `batched_track_pair` on the bundled real frames (B pairs, shipped
config) with `use_level_kernel` off vs on (fori protocol, CLAUDE.md),
and cross-checks the returned transforms between the two paths.

Usage: python benchmarks/exp_levelkernel.py [--batch 32] [--reps 10]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np

    from dense_visual_odometry_tpu.config import RobustDVOConfig
    from dense_visual_odometry_tpu.io import load_bundled_sequence
    from dense_visual_odometry_tpu.models.robust import preprocess_frame
    from dense_visual_odometry_tpu.parallel import (
        batched_track_pair,
        stack_frame_data,
    )

    cfg = RobustDVOConfig.from_json(REPO / "configs" / "tpu_fast.json")

    seq = load_bundled_sequence()
    pre = jax.jit(
        lambda img, dep: preprocess_frame(
            img, dep, seq.camera, levels=cfg.levels,
            max_distance=cfg.max_distance,
        )
    )
    frames = [pre(jnp.asarray(r), jnp.asarray(d)) for r, d in seq.prefetched()]
    pairs = [(frames[i], frames[i + 1]) for i in range(len(frames) - 1)]
    reps_needed = -(-args.batch // len(pairs))
    pairs = (pairs * reps_needed)[: args.batch]
    prev_b = stack_frame_data([p for p, _ in pairs])
    curr_b = stack_frame_data([c for _, c in pairs])
    k = jnp.asarray(seq.camera.intrinsics)
    n = args.reps
    eye = jnp.eye(4, dtype=jnp.float32)

    def timed(name, fn):
        def looped(seed):
            def body(_, s):
                out = fn(s)
                return jnp.asarray(out, jnp.float32).ravel()[0] * 1e-30
            return jax.lax.fori_loop(0, n, body, seed)

        g = jax.jit(looped)
        t0 = time.perf_counter()
        np.asarray(g(jnp.float32(0.0)))
        print(f"  [{name}: compile+warm {time.perf_counter() - t0:.0f}s]",
              flush=True)
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(g(jnp.float32(0.0)))
            best.append((time.perf_counter() - t0) * 1e3 / n)
        ms = sorted(best)[1]
        print(f"{name:38s} {ms:8.2f} ms/batch{args.batch}", flush=True)
        return ms

    def track(s, c):
        init = eye + s * jnp.zeros((4, 4), jnp.float32)
        out = batched_track_pair(prev_b, curr_b, k, c, init_guess=init)
        return out.transform[..., 0, 0].sum()

    cfg_off = dataclasses.replace(cfg, use_level_kernel=False)
    cfg_on = dataclasses.replace(cfg, use_level_kernel=True)

    # transform agreement first (one call each)
    t_off = np.asarray(
        jax.jit(lambda: batched_track_pair(
            prev_b, curr_b, k, cfg_off, init_guess=eye
        ).transform)()
    )
    t_on = np.asarray(
        jax.jit(lambda: batched_track_pair(
            prev_b, curr_b, k, cfg_on, init_guess=eye
        ).transform)()
    )
    dt = np.abs(t_on - t_off)
    print(f"max |T_on - T_off|: rotation {dt[..., :3, :3].max():.2e}  "
          f"translation {dt[..., :3, 3].max():.2e} m", flush=True)

    ms_off = timed("track shipped (XLA LM loop)", lambda s: track(s, cfg_off))
    ms_on = timed("track shipped (level kernel)", lambda s: track(s, cfg_on))
    print(f"speedup {ms_off / ms_on:.2f}x", flush=True)


if __name__ == "__main__":
    main()
