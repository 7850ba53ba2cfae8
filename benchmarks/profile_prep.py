"""Attribute the tracker's fixed per-batch cost to its prep stages.

Round-2 finding (benchmarks/RESULTS.md): at batch 32 the shipped config
spends ~61 ms/batch even at ``max_iterations=1`` — the estimate-independent
per-level prep plus first iterations — while each extra GN iteration costs
only ~2.2 ms.  This script times the individual prep stages on the real
device so optimization effort goes where the milliseconds are.

Timing recipe for the tunneled TPU (see CLAUDE.md): N reps inside ONE jit
via ``lax.fori_loop`` with a scalar data dependency, synchronized by an
``np.asarray`` read — single-call timings measure the ~25 ms RPC, not the
kernel.

Usage: python benchmarks/profile_prep.py [--batch 32] [--reps 10]
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
    from dense_visual_odometry_tpu.models.robust import (
        _SOBEL_GAIN,
        _initial_photometric_error,
        preprocess_frame,
    )
    from dense_visual_odometry_tpu.ops import gradients as grad_ops
    from dense_visual_odometry_tpu.ops import interp as interp_ops
    from dense_visual_odometry_tpu.ops.pallas.fused_iter import (
        fused_iteration_pallas,
    )
    from dense_visual_odometry_tpu.ops.pallas.stackwarp import prepare_shift_stack
    from dense_visual_odometry_tpu.ops.residuals import (
        _warp_geometry,
        approximate_jacobian,
        approximate_jacobian_planes,
    )
    from dense_visual_odometry_tpu.parallel import (
        batched_track_pair,
        stack_frame_data,
    )

    # The SHIPPED configuration (stays in sync with the bench + CLI).
    cfg = RobustDVOConfig.from_json(REPO / "configs" / "tpu_fast.json")

    seq = load_bundled_sequence()
    pre = jax.jit(
        lambda img, dep: preprocess_frame(
            img, dep, seq.camera, levels=cfg.levels, max_distance=cfg.max_distance
        )
    )
    frames = [pre(jnp.asarray(r), jnp.asarray(d)) for r, d in seq.prefetched()]
    pairs = [(frames[i], frames[i + 1]) for i in range(len(frames) - 1)]
    reps_needed = -(-args.batch // len(pairs))
    pairs = (pairs * reps_needed)[:args.batch]
    prev_b = stack_frame_data([p for p, _ in pairs])
    curr_b = stack_frame_data([c for _, c in pairs])
    k = jnp.asarray(seq.camera.intrinsics)
    n = args.reps

    def timed(name, fn, *xs):
        """Median of 3 runs of `fn` repeated n times inside one jit."""

        def looped(*inner):
            def body(_, s):
                out = fn(s, *inner)
                return jnp.asarray(out, jnp.float32).ravel()[0] * 1e-30
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        g = jax.jit(looped)
        np.asarray(g(*xs))  # compile + warm
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(g(*xs))
            best.append((time.perf_counter() - t0) * 1e3 / n)
        ms = sorted(best)[1]
        print(f"{name:34s} {ms:8.2f} ms/batch{args.batch}", flush=True)
        return ms

    eye = jnp.eye(4, dtype=jnp.float32)

    # --- end-to-end references -------------------------------------------
    def track(s, cfg=cfg):
        init = eye + s * jnp.zeros((4, 4), jnp.float32)
        out = batched_track_pair(prev_b, curr_b, k, cfg, init_guess=init)
        return out.transform[..., 0, 0].sum()

    timed("track (shipped, mi=12 LM)", track)
    timed(
        "track (mi=1)",
        lambda s: track(s, dataclasses.replace(cfg, max_iterations=1)),
    )
    timed(
        "track (mi=1, no fallback/init-sel)",
        lambda s: track(
            s,
            dataclasses.replace(
                cfg,
                max_iterations=1,
                shift_stack_fallback=False,
                robust_init_selection=False,
            ),
        ),
    )

    # --- per-level prep pieces -------------------------------------------
    from dense_visual_odometry_tpu.camera import CameraModel

    cam = CameraModel(intrinsics=k, depth_scale=1.0)

    def lvl_data(level):
        return (
            prev_b.gray[level], prev_b.depth_m[level], curr_b.gray[level],
            cam.at(level),
        )

    def sobel_jac_all(s):
        acc = s
        for level in range(cfg.levels):
            gp, dp, _, kl = lvl_data(level)
            gx, gy = grad_ops.sobel(gp + acc * 0)
            pj = approximate_jacobian(gp, dp, kl, gx / _SOBEL_GAIN, gy / _SOBEL_GAIN)
            acc = acc + pj.ravel()[0] * 1e-30
        return acc

    def fallback_prep_all(s):
        acc = s
        for level in range(cfg.levels):
            _, _, gc, _ = lvl_data(level)
            packed = interp_ops.pack_neighbors(gc + acc * 0)
            gx, gy = grad_ops.sobel(gc)
            gp16 = interp_ops.pack_pair_f16(gx / _SOBEL_GAIN, gy / _SOBEL_GAIN)
            acc = (
                acc
                + jnp.asarray(packed, jnp.float32).ravel()[0] * 1e-30
                + jnp.asarray(gp16, jnp.float32).ravel()[0] * 1e-30
            )
        return acc

    def stack_prep_shift_levels(s):
        acc = s
        for level in (0, 1, 2):
            gp, dp, gc, kl = lvl_data(level)
            stride = cfg.stride_for_level(level)
            dps = dp[..., ::stride, ::stride]
            _, u, v, valid = _warp_geometry(dps + acc * 0, kl, eye, stride)
            planes, du, dv, ok = prepare_shift_stack(
                gc, u, v, radius=cfg.shift_stack_radius, grid_stride=stride,
                coord_mask=valid,
            )
            acc = acc + planes.ravel()[0] * 1e-30 + du.ravel()[0] * 1e-30
        return acc

    def fused_iter_shift_levels(s):
        # Mirrors the product path: Jacobian built as 6 leading planes on
        # the strided grid (no trailing-6 relayout).
        acc = s
        for level in (0, 1, 2):
            gp, dp, gc, kl = lvl_data(level)
            stride = cfg.stride_for_level(level)
            gps = gp[..., ::stride, ::stride]
            dps = dp[..., ::stride, ::stride]
            gx, gy = grad_ops.sobel(gp)
            pj = approximate_jacobian_planes(
                dps, kl,
                (gx / _SOBEL_GAIN)[..., ::stride, ::stride],
                (gy / _SOBEL_GAIN)[..., ::stride, ::stride],
                grid_stride=stride,
            )
            _, u, v, valid = _warp_geometry(dps + acc * 0, kl, eye, stride)
            planes, du, dv, ok = prepare_shift_stack(
                gc, u, v, radius=cfg.shift_stack_radius, grid_stride=stride,
                coord_mask=valid,
            )
            out = fused_iteration_pallas(
                planes, du, dv, gps.astype(jnp.float32),
                (ok & valid).astype(jnp.float32),
                pj.astype(jnp.float32),
                jnp.zeros((gp.shape[0], 1), jnp.float32),
                radius=cfg.shift_stack_radius, grid_stride=stride,
            )
            acc = acc + out.ravel()[0] * 1e-30
        return acc

    def init_selection(s):
        # Mirrors the product path: box-filtered half-res scoring.
        from dense_visual_odometry_tpu.models.robust import _box2

        lvl = cfg.levels - 1
        gp, dp, gc, kl = lvl_data(lvl)
        gps = _box2(gp)
        hs, ws = gps.shape[-2], gps.shape[-1]
        dps = dp[..., ::2, ::2][..., :hs, :ws]
        packed = interp_ops.pack_neighbors(_box2(gc))
        half = jnp.asarray(
            [[0.5, 0.0, -0.25], [0.0, 0.5, -0.25], [0.0, 0.0, 1.0]],
            jnp.float32,
        )
        k_half = half @ kl
        e1 = _initial_photometric_error(gps, dps + s * 0, packed, k_half, eye)
        e2 = _initial_photometric_error(gps, dps, packed, k_half, eye)
        return e1.sum() * 1e-30 + e2.sum() * 1e-30

    timed("prep: sobel+jacobian (4 lvls)", sobel_jac_all)
    timed("prep: fallback pack (4 lvls)", fallback_prep_all)
    timed("prep: warpgeom+stack (lvl 0-2)", stack_prep_shift_levels)
    timed("prep+1 fused iter (lvl 0-2)", fused_iter_shift_levels)
    timed("init selection (coarsest x2)", init_selection)


if __name__ == "__main__":
    main()
