"""SLAM keyframe-tracking cost: iteration budget + ESM trigger variants.

Round-4 (VERDICT r3 task 5): accurate-tier SLAM costs 161 ms/frame vs
odometry's 71 on the 500-frame fr1-difficulty set, attributed to
frame-to-KEYFRAME solves firing the rotation fallback trigger (total
baseline up to 0.15 rad) and paying the per-iteration XLA gather loop.
Variants measured here, each through the full benchmark CLI
(`apps.benchmark tum-fr1 -m slam`):

- iteration budget cut (48 -> 24, justified by the odometry Pareto:
  8.62 vs 8.55 mm, benchmarks/pareto.jsonl);
- ESM gradients at the shift-stack levels with the relaxed
  ``esm_fallback_max_rotation`` (the warp-evaluated Jacobian makes the
  total-rotation trigger obsolete for warm-started keyframe solves) —
  keeps the solves on the level-fused kernel.

One JSON line per variant; appended to benchmarks/slampareto.jsonl.
Run on the real TPU.
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

BASE = json.loads((REPO / "configs" / "tpu_accurate_illum.json").read_text())

VARIANTS = {
    "accurate_illum_48": dict(BASE),
    "accurate_illum_24": dict(BASE, max_iterations=24),
    "esm_24": dict(
        BASE, max_iterations=24,
        use_esm_gradients=True, esm_levels=[0, 1, 2],
        esm_fallback_max_rotation=0.25,
    ),
    "esm_48": dict(
        BASE,
        use_esm_gradients=True, esm_levels=[0, 1, 2],
        esm_fallback_max_rotation=0.25,
    ),
    # Is the rotation-trigger fallback (keyframe baselines > 0.03 rad)
    # the SLAM latency driver?  Raise the trigger WITHOUT ESM: the IC
    # Jacobian bias under rotation is real, but frame-to-keyframe ATE
    # tells whether BA absorbs it.
    "rot_trigger_24": dict(
        BASE, max_iterations=24, fallback_max_rotation=0.25,
    ),
    # Cap the COARSEST level (the one level off the fused kernel, whose
    # XLA while_loop pays ~2.7 ms device scheduling per iteration): its
    # output only seeds level 2.
    "coarse_cap_24": dict(
        BASE, max_iterations=24, max_iterations_per_level=[24, 24, 24, 6],
    ),
    "coarse_cap_full": dict(
        BASE, max_iterations_per_level=[48, 48, 48, 6],
    ),
    # Fast stopping + free in-kernel illum: the round-3 fast-SLAM point
    # (104.6 ms @ 0.69 mm) with exposure compensation.
    "fast_illum": None,
}
import json as _json
from pathlib import Path as _P
_fast = _json.loads((REPO / "configs" / "tpu_fast.json").read_text())
VARIANTS["fast_illum"] = dict(_fast, illumination="bias")
VARIANTS["fast_illum_cap"] = dict(
    _fast, illumination="bias", max_iterations_per_level=[12, 12, 12, 6]
)
# Keyframe-baseline warps exceed the shift ball, so SLAM solves run the
# gather fallback — whose rel-tol is TIGHTENED 10x by
# fallback_tolerance_scale (an accuracy guard tuned for odometry's rare
# hard frames, not for a regime where EVERY frame is "hard").  Keep the
# odometry rel-tol on the fallback path instead.
VARIANTS["fast_illum_cap_ftol"] = dict(
    _fast, illumination="bias", max_iterations_per_level=[12, 12, 12, 6],
    fallback_tolerance_scale=1.0,
)
# Two-step tracking (KeyframePolicy.two_step_tracking, see models/slam.py):
# frame-to-frame on the kernel path + short frame-to-keyframe refinement.
# Variant names starting with "two_step" pass --slam-two-step to the CLI.
VARIANTS["two_step_fast_illum"] = dict(_fast, illumination="bias")
VARIANTS["two_step_accurate"] = dict(BASE, max_iterations=24)
VARIANTS["two_step_tight"] = dict(_fast, illumination="bias")
_slam = _json.loads((REPO / "configs" / "tpu_slam.json").read_text())
VARIANTS["slam_allkernel"] = dict(_slam, shift_stack_levels=[0, 1, 2, 3])
VARIANTS["two_step_tight_caps8-6-4-3"] = dict(_fast, illumination="bias")
# Round-5: 2-D TILE recentering (recenter_col_blocks) — each tile absorbs
# its local mean displacement, so keyframe-baseline warps stay inside the
# radius-3 ball and frame-to-keyframe solves ride the level-fused kernel.
# The rotation trigger is relaxed alongside (tiles fix coverage; the
# remaining IC-Jacobian rotation bias at <=0.15 rad baselines is what
# these rows measure).  "disp10" additionally relaxes the coarsest-level
# RMS-displacement trigger (it keys on the TOTAL warp, which overstates
# the remaining motion of a warm-started keyframe solve).
VARIANTS["slam_tiles"] = dict(
    _slam, recenter_blocks=8, recenter_col_blocks=10,
    fallback_max_rotation=0.25,
)
VARIANTS["slam_tiles_fine"] = dict(
    _slam, recenter_blocks=15, recenter_col_blocks=20,
    fallback_max_rotation=0.25,
)
VARIANTS["slam_tiles_disp10"] = dict(
    _slam, recenter_blocks=8, recenter_col_blocks=10,
    fallback_max_rotation=0.25, fallback_max_displacement=10.0,
)
# Middle-ground rotation trigger: keyframe solves under ~4.6 deg of
# baseline rotation ride the kernel (gradient-direction bias < 0.4%),
# larger baselines keep the exact gather fallback for accuracy.
VARIANTS["slam_tiles_rot008"] = dict(
    _slam, recenter_blocks=8, recenter_col_blocks=10,
    fallback_max_rotation=0.08,
)
VARIANTS["slam_tiles_rot008_disp10"] = dict(
    _slam, recenter_blocks=8, recenter_col_blocks=10,
    fallback_max_rotation=0.08, fallback_max_displacement=10.0,
)
# Round-5 probe finding (out/logs/probeB.log): the constant per-frame
# degradation of the tile rows is robust_init_selection x tiles — when
# the selector (noise-margin) picks the IDENTITY start for a
# keyframe-baseline solve, tiles keep it on the kernel path where the
# frozen-window approximation degrades a from-scratch large-warp solve
# (pre-tiles the same start failed coverage and took the exact gather).
# With the selector off, keyframe warm starts are always used:
VARIANTS["slam_tiles_noinit"] = dict(
    _slam, recenter_blocks=8, recenter_col_blocks=10,
    fallback_max_rotation=0.25, robust_init_selection=False,
)
# + the round-5 clip-bound fix: keyframe baselines on the hard tail
# exceed the default +-12 px recenter clip; bound 48 covers them.
VARIANTS["slam_tiles_noinit_cb48"] = dict(
    _slam, recenter_blocks=8, recenter_col_blocks=10,
    fallback_max_rotation=0.25, robust_init_selection=False,
    recenter_center_bound=48,
)
VARIANTS["slam_tiles_cb48"] = dict(
    _slam, recenter_blocks=8, recenter_col_blocks=10,
    fallback_max_rotation=0.25, recenter_center_bound=48,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="+", default=list(VARIANTS))
    ap.add_argument("--data", default=str(REPO / "out" / "fr1_synth_500"))
    ap.add_argument("--out",
                    default=str(REPO / "benchmarks" / "slampareto.jsonl"))
    args = ap.parse_args()

    import jax

    from dense_visual_odometry_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(jax.default_backend())

    import numpy as np

    from dense_visual_odometry_tpu.apps import benchmark as bench_cli

    out_path = Path(args.out)
    for name in args.variants:
        cfg_dict = VARIANTS[name]
        with tempfile.NamedTemporaryFile(
            "w", suffix=".json", delete=False
        ) as fh:
            json.dump(cfg_dict, fh)
            cfg_file = fh.name
        t0 = time.perf_counter()
        argv = ["tum-fr1", "-d", args.data, "-c", cfg_file, "-m", "slam"]
        if name.startswith("two_step"):
            argv.append("--slam-two-step")
            if "caps" in name:
                argv += ["--slam-refine-caps",
                         name.split("caps")[1].lstrip("_").replace("-", ",")]
        summary = bench_cli.run(bench_cli.parse_args(argv))
        rec = {
            "variant": name,
            "run_s": round(time.perf_counter() - t0, 1),
            "ate_mm": round(summary["ate_rmse_m"] * 1e3, 3),
            "rpe_trans_mm": round(summary["rpe_trans_rmse_m"] * 1e3, 4),
            "rpe_rot_deg": round(
                float(np.degrees(summary["rpe_rot_rmse_rad"])), 5
            ),
            "median_frame_ms": round(summary["median_frame_ms"], 1),
            "mean_frame_ms": round(summary["mean_frame_ms"], 1),
            "keyframes": summary.get("keyframes"),
        }
        line = json.dumps(rec)
        print(line, flush=True)
        with out_path.open("a") as fh:
            fh.write(line + "\n")
    print("slam pareto done", flush=True)


if __name__ == "__main__":
    main()
