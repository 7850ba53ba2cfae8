"""Measure per-row-block recentering on the real device.

Times `batched_track_pair` on the bundled real frames (B pairs, shipped
config) for: shipped (single center, r=3), blocks at r=3, and blocks at
r=2 (fori protocol, CLAUDE.md), cross-checking transforms against the
shipped path.  The candidate win is r=2: 25 taps/roll-sweep vs 49.

Usage: python benchmarks/exp_blocks.py [--batch 32] [--reps 10]
       [--blocks 6]
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
    ap.add_argument("--blocks", type=int, default=6)
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
        # Frame data passes as ARGUMENTS, not closure constants: captured
        # device arrays embed in the HLO as literals, and at B=128 the
        # resulting program exceeds the tunnel's remote-compile request
        # limit (HTTP 413).
        def looped(seed, pb, cb):
            def body(_, s):
                out = fn(s, pb, cb)
                return jnp.asarray(out, jnp.float32).ravel()[0] * 1e-30
            return jax.lax.fori_loop(0, n, body, seed)

        g = jax.jit(looped)
        t0 = time.perf_counter()
        np.asarray(g(jnp.float32(0.0), prev_b, curr_b))
        print(f"  [{name}: compile+warm {time.perf_counter() - t0:.0f}s]",
              flush=True)
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(g(jnp.float32(0.0), prev_b, curr_b))
            best.append((time.perf_counter() - t0) * 1e3 / n)
        ms = sorted(best)[1]
        print(f"{name:38s} {ms:8.2f} ms/batch{args.batch}", flush=True)
        return ms

    def track(s, pb, cb, c):
        init = eye + s * jnp.zeros((4, 4), jnp.float32)
        out = batched_track_pair(pb, cb, k, c, init_guess=init)
        return out.transform[..., 0, 0].sum()

    variants = {
        "shipped (r=3, 1 center)": cfg,
        f"blocks={args.blocks} r=3": dataclasses.replace(
            cfg, recenter_blocks=args.blocks
        ),
        f"blocks={args.blocks} r=2": dataclasses.replace(
            cfg, recenter_blocks=args.blocks, shift_stack_radius=2
        ),
        f"blocks={args.blocks} rx=3 ry=2": dataclasses.replace(
            cfg, recenter_blocks=args.blocks, shift_stack_radius_y=2
        ),
    }

    transforms = {}
    for name, c in variants.items():
        transforms[name] = np.asarray(
            jax.jit(lambda pb, cb, c=c: batched_track_pair(
                pb, cb, k, c, init_guess=eye
            ).transform)(prev_b, curr_b)
        )
    base = transforms["shipped (r=3, 1 center)"]
    for name, t in transforms.items():
        dt = np.abs(t - base)
        print(f"{name}: max |dT| rot {dt[..., :3, :3].max():.2e}  "
              f"trans {dt[..., :3, 3].max():.2e} m", flush=True)

    ms = {name: timed(name, lambda s, pb, cb, c=c: track(s, pb, cb, c))
          for name, c in variants.items()}
    base_ms = ms["shipped (r=3, 1 center)"]
    for name, m in ms.items():
        print(f"{name}: {base_ms / m:.3f}x vs shipped", flush=True)


if __name__ == "__main__":
    main()
