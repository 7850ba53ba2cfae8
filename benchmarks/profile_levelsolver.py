"""Roofline + utilization attribution for the SHIPPED level-fused kernel.

Round-4 VERDICT weak #3: the roofline section in RESULTS.md analyzes the
round-2 per-iteration ``fused_iter`` kernel, but the path that actually
ships is ``ops/pallas/level_solver.py`` on ALL levels.  This experiment
measures that kernel two ways on the real TPU:

1. ``--mode kernel``: drive ``solve_level_fused`` STANDALONE on
   level-shaped inputs built from a real bundled pair, with stopping
   disabled (tolerance = -1, huge lm_lambda_max) so every element runs
   exactly ``max_iterations`` in-kernel.  Timing it at several iteration
   budgets separates the fixed cost (HBM streaming + launch) from the
   marginal in-kernel iteration cost; a closed-form op model then gives
   the sustained VPU rate and the HBM bandwidth of the streaming phase.
   Variants isolate the knobs (radius 3 vs 2, t-weights, illum bias,
   depth term).

2. ``--mode levels``: per-level attribution of the REAL parity program
   (``parallel.batched_track_pair`` at B, bench.py protocol) by
   cap-differencing: time the base per-level caps, then each level
   capped to 1 iteration; the difference is that level's marginal
   iteration cost inside the shipped program.

One JSON line per measurement on stdout and appended to
``benchmarks/levelsolver_roofline.jsonl``.  Run on the real TPU,
strictly sequentially (CLAUDE.md).
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

OUT = REPO / "benchmarks" / "levelsolver_roofline.jsonl"


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with OUT.open("a") as fh:
        fh.write(line + "\n")


def model_flops_per_iter(hp, wp, radius, radius_y, unroll, use_tweights,
                         illum_bias, use_depth):
    """Approximate per-element per-iteration FLOP count (f32 VPU ops on
    (hp, wp) planes; rolls counted as free — they are register moves,
    which is exactly why the ACHIEVED rate can exceed naive expectations
    or fall short when roll issue slots serialize)."""
    n = hp * wp
    taps = (2 * radius + 1) * (2 * radius_y + 1)
    fl = 0
    # warp: 3x(3 fma) + div + project 2x(2 fma + div) + du/dv + masks
    fl += n * (9 * 2 + 8 + 10)
    # tent taps: per tap wx (3 ops amortized) + fma (2) on acc
    fl += n * taps * 5
    if use_depth:
        fl += n * taps * 2
    # residual + square
    fl += n * 4
    if use_tweights:
        fl += n * (unroll * 5 + 4)
    if illum_bias:
        fl += n * 6
    # 6 weighted jacobian planes + 21 upper H sums + 6 rhs sums + err
    fl += n * (6 + 21 * 2 + 6 * 2 + 3)
    if use_depth:
        fl += n * (6 * 4 + 21 * 2 + 6 * 2 + 6)
    return fl


def hbm_bytes_per_element(hp, wp, ph, pw, stride, use_depth):
    planes = stride * stride * ph * pw * 4
    pts = 3 * hp * wp * 4
    jac = 6 * hp * wp * 4
    gray = hp * wp * 4
    z = planes + 2 * hp * wp * 4 if use_depth else 0
    return planes + pts + jac + gray + z


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["kernel", "levels"], default="kernel")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--base-config",
                    default=str(REPO / "configs" / "tpu_parity.json"))
    ap.add_argument("--platform", default=None,
                    help="cpu for smoke tests; default = real device")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dense_visual_odometry_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(jax.default_backend())

    import jax.numpy as jnp
    import numpy as np

    from dense_visual_odometry_tpu.io import load_bundled_sequence

    seq = load_bundled_sequence()

    if args.mode == "levels":
        run_levels(args, jax, jnp, np, seq)
        return

    from dense_visual_odometry_tpu.ops import gradients as grad_ops
    from dense_visual_odometry_tpu.ops.pallas.level_solver import (
        solve_level_fused,
    )
    from dense_visual_odometry_tpu.ops.pallas.stackwarp import (
        compute_recenter,
        extract_parity_planes,
    )
    from dense_visual_odometry_tpu.ops.pyramid import (
        preprocess_depth,
        rgb_to_gray,
    )
    from dense_visual_odometry_tpu.ops.residuals import (
        _warp_geometry,
        approximate_jacobian_planes,
    )

    rgb0, d0 = seq.frame(0)
    rgb1, d1 = seq.frame(1)
    gray_prev_full = rgb_to_gray(jnp.asarray(rgb0))
    gray_curr_full = rgb_to_gray(jnp.asarray(rgb1))
    depth_prev_full = preprocess_depth(
        jnp.asarray(d0), seq.camera.depth_scale, 10.0
    )
    k = jnp.asarray(seq.camera.intrinsics, jnp.float32)
    h, w = gray_prev_full.shape
    stride = 2
    b = args.batch
    est0 = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))

    # Level-0 strided grid inputs (the dominant level of the parity
    # program), replicated to the batch.
    _, u0, v0, vg0 = _warp_geometry(
        depth_prev_full[None], k[None], est0[:1], stride
    )
    gray_prev = gray_prev_full[::stride, ::stride]
    depth_prev = depth_prev_full[::stride, ::stride]
    hp, wp = gray_prev.shape
    # Approximate-mode Jacobian from PREV-frame Sobel gradients on the
    # strided grid (robust.py's hoisted prep, sobel gain 8 normalized).
    gx1, gy1 = grad_ops.sobel(gray_prev_full)
    jac = approximate_jacobian_planes(
        depth_prev_full[::stride, ::stride], k,
        (gx1 / 8.0)[::stride, ::stride], (gy1 / 8.0)[::stride, ::stride],
        grid_stride=stride,
    )

    def tile(x):
        return jnp.broadcast_to(x, (b,) + x.shape)

    variants = [
        dict(name="parity_bias_r3", radius=3, tweights=True, bias=True,
             depth=False),
        dict(name="radius2", radius=2, tweights=True, bias=True,
             depth=False),
        dict(name="no_bias", radius=3, tweights=True, bias=False,
             depth=False),
        dict(name="no_tweights", radius=3, tweights=False, bias=False,
             depth=False),
    ]
    for var in variants:
        radius = var["radius"]
        cu, cv = compute_recenter(u0[0], v0[0], radius, stride, vg0[0])
        planes1 = extract_parity_planes(
            gray_curr_full[None], cu[None], cv[None], hp, wp, radius, stride
        )[0]
        ph, pw = planes1.shape[-2:]
        planes_b = tile(planes1)
        cu_b = tile(cu)
        cv_b = tile(cv)
        depth_b = tile(depth_prev)
        gray_b = tile(gray_prev)
        jac_b = tile(jac)

        for iters in (1, 6, 20):
            def run():
                out = solve_level_fused(
                    planes_b, cu_b, cv_b, depth_b, gray_b, jac_b, k,
                    est0, est0,
                    jnp.full((b,), 1.0, jnp.float32), None,
                    image_h=h, image_w=w, radius=radius, grid_stride=stride,
                    dof=5.0, unroll=3, use_tweights=var["tweights"],
                    normalize_scale=True, tolerance=-1.0, lm_lambda0=1e-4,
                    lm_up=5.0, lm_down=2.0, lm_lambda_max=1e30,
                    max_iterations=iters,
                )
                np.asarray(out[0])  # force completion (tunnel)
                return out

            out = run()  # compile + warm
            its_ran = int(np.asarray(out[5]))
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                run()
                ts.append(time.perf_counter() - t0)
            t_med = float(np.median(ts))
            emit({
                "mode": "kernel", "variant": var["name"], "batch": b,
                "grid": [int(hp), int(wp)], "planes": [int(ph), int(pw)],
                "radius": radius, "max_iterations": iters,
                "iterations_ran": its_ran,
                "t_ms": round(t_med * 1e3, 2),
                "us_per_elem": round(t_med / b * 1e6, 2),
            })

        # Derived roofline numbers from the 1 -> 20 spread.
        rows = [
            json.loads(line)
            for line in OUT.read_text().splitlines()
            if json.loads(line).get("variant") == var["name"]
        ]
        t1 = next(r["t_ms"] for r in rows if r["max_iterations"] == 1)
        t20 = next(r["t_ms"] for r in rows if r["max_iterations"] == 20)
        per_iter_ms = (t20 - t1) / 19.0
        fl = model_flops_per_iter(
            hp, wp, radius, radius, 3, var["tweights"], var["bias"],
            var["depth"],
        )
        hbm = hbm_bytes_per_element(hp, wp, ph, pw, stride, var["depth"])
        emit({
            "mode": "kernel-derived", "variant": var["name"], "batch": b,
            "per_iter_ms_batch": round(per_iter_ms, 3),
            "per_iter_us_elem": round(per_iter_ms / b * 1e3, 3),
            "model_mflop_per_iter_elem": round(fl / 1e6, 2),
            "sustained_gflops": round(fl * b / (per_iter_ms * 1e-3) / 1e9, 1),
            "hbm_mb_per_elem_once": round(hbm / 1e6, 3),
            "fixed_ms_batch_at1": t1,
            "fixed_minus_iter_ms": round(t1 - per_iter_ms, 2),
            "implied_stream_gbps": round(
                hbm * b / ((t1 - per_iter_ms) * 1e-3) / 1e9, 1
            ),
        })


def run_levels(args, jax, jnp, np, seq):
    import dataclasses as dc

    from dense_visual_odometry_tpu.config import RobustDVOConfig
    from dense_visual_odometry_tpu.models.robust import preprocess_frame
    from dense_visual_odometry_tpu.parallel import (
        batched_track_pair,
        stack_frame_data,
    )

    base = RobustDVOConfig.from_json(args.base_config)
    caps0 = list(
        base.max_iterations_per_level
        or (base.max_iterations,) * base.levels
    )
    pre = jax.jit(
        lambda img, dep: preprocess_frame(
            img, dep, seq.camera, levels=base.levels,
            max_distance=base.max_distance,
        )
    )
    frames = [pre(jnp.asarray(r), jnp.asarray(d)) for r, d in seq.prefetched()]
    pairs = [(frames[i], frames[i + 1]) for i in range(len(frames) - 1)]
    n = args.batch
    ps = (pairs * (-(-n // len(pairs))))[:n]
    prev_b = stack_frame_data([p for p, _ in ps])
    curr_b = stack_frame_data([c for _, c in ps])
    k = jnp.asarray(seq.camera.intrinsics)

    def timed(cfg):
        def run():
            out = batched_track_pair(prev_b, curr_b, k, cfg)
            np.asarray(out.transform)
            return out

        run()
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_base = timed(base)
    emit({"mode": "levels", "caps": caps0, "batch": n,
          "t_ms": round(t_base * 1e3, 1),
          "fps": round(n / t_base, 1)})
    for lvl in range(base.levels):
        caps = list(caps0)
        caps[lvl] = 1
        cfg = dc.replace(base, max_iterations_per_level=tuple(caps))
        t = timed(cfg)
        emit({
            "mode": "levels", "caps": caps, "batch": n,
            "t_ms": round(t * 1e3, 1),
            "level_zeroed": lvl,
            "marginal_ms": round((t_base - t) * 1e3, 1),
            "marginal_pct": round((t_base - t) / t_base * 100.0, 1),
            "per_iter_ms": round(
                (t_base - t) * 1e3 / max(caps0[lvl] - 1, 1), 2
            ),
        })


if __name__ == "__main__":
    main()
