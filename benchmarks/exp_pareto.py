"""fps-vs-ATE Pareto over stopping knobs at the parity-grade config.

Round-4 headline experiment (VERDICT r3 task 1): the 651-fps headline is
the FAST config (48.3 mm on the 500-frame fr1-difficulty set); the config
that meets the 8.8 mm reference-semantics parity bound
(`configs/tpu_accurate_illum.json`, 8.55 mm) had only a sequential
70 ms/frame number.  Batched iterations are NOT free (no transport floor
to hide under), so this script measures, for each ``max_iterations``
variant of the accurate+illum config:

- batched throughput at B (bench.py protocol: bundled 640x480 pairs tiled
  to the batch, steady-state over ITERS timed runs, completion forced by
  a host read), and
- fr1-difficulty ATE/RPE through the full benchmark CLI
  (`apps.benchmark tum-fr1 -d out/fr1_synth_500`) — the same code path
  as the round-3 headline accuracy table.

One patient session; one JSON line per variant on stdout and appended to
``benchmarks/pareto.jsonl``.  Run on the real TPU (no platform switch).
"""

import argparse
import dataclasses
import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, nargs="+", default=[48, 32, 24, 16])
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--data", default=str(REPO / "out" / "fr1_synth_500"))
    ap.add_argument("--base-config",
                    default=str(REPO / "configs" / "tpu_accurate_illum.json"))
    ap.add_argument("--skip-ate", action="store_true")
    ap.add_argument("--skip-fps", action="store_true")
    ap.add_argument("--timed", type=int, default=3, help="timed fps reps")
    ap.add_argument("--out", default=str(REPO / "benchmarks" / "pareto.jsonl"))
    args = ap.parse_args()

    import jax

    from dense_visual_odometry_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(jax.default_backend())

    import jax.numpy as jnp
    import numpy as np

    from dense_visual_odometry_tpu.apps import benchmark as bench_cli
    from dense_visual_odometry_tpu.config import RobustDVOConfig
    from dense_visual_odometry_tpu.io import load_bundled_sequence
    from dense_visual_odometry_tpu.models.robust import preprocess_frame
    from dense_visual_odometry_tpu.parallel import (
        batched_track_pair,
        stack_frame_data,
    )

    base = json.loads(Path(args.base_config).read_text())
    out_path = Path(args.out)

    seq = load_bundled_sequence()
    cfg0 = RobustDVOConfig.from_dict(base)
    pre = jax.jit(
        lambda img, dep: preprocess_frame(
            img, dep, seq.camera, levels=cfg0.levels, max_distance=cfg0.max_distance
        )
    )
    frames = [pre(jnp.asarray(rgb), jnp.asarray(d)) for rgb, d in seq.prefetched()]
    pairs = [(frames[i], frames[i + 1]) for i in range(len(frames) - 1)]
    k = jnp.asarray(seq.camera.intrinsics)

    def batch_of(n):
        ps = (pairs * (-(-n // len(pairs))))[:n]
        return (
            stack_frame_data([p for p, _ in ps]),
            stack_frame_data([c for _, c in ps]),
        )

    prev_b, curr_b = batch_of(args.batch)

    for n_iter in args.iters:
        rec = {"max_iterations": n_iter, "batch": args.batch,
               "base": Path(args.base_config).name}
        cfg_dict = dict(base, max_iterations=n_iter)
        cfg = RobustDVOConfig.from_dict(cfg_dict)

        if not args.skip_fps:
            def run_once():
                out = batched_track_pair(prev_b, curr_b, k, cfg)
                np.asarray(out.transform)  # force completion (tunnel)
                return out

            t0 = time.perf_counter()
            out = run_once()  # compile + warmup
            rec["compile_plus_first_s"] = round(time.perf_counter() - t0, 1)
            fps_reps = []
            for _ in range(args.timed):
                it0 = time.perf_counter()
                out = run_once()
                fps_reps.append(args.batch / (time.perf_counter() - it0))
            rec["fps"] = round(float(np.median(fps_reps)), 2)
            rec["fps_reps"] = [round(f, 1) for f in fps_reps]
            rec["all_success"] = bool(np.asarray(out.success).all())

        if not args.skip_ate:
            with tempfile.NamedTemporaryFile(
                "w", suffix=".json", delete=False
            ) as fh:
                json.dump(cfg_dict, fh)
                cfg_file = fh.name
            t0 = time.perf_counter()
            summary = bench_cli.run(bench_cli.parse_args(
                ["tum-fr1", "-d", args.data, "-c", cfg_file]
            ))
            rec["ate_run_s"] = round(time.perf_counter() - t0, 1)
            rec["ate_mm"] = round(summary["ate_rmse_m"] * 1e3, 3)
            rec["rpe_trans_mm"] = round(summary["rpe_trans_rmse_m"] * 1e3, 4)
            rec["rpe_rot_deg"] = round(
                np.degrees(summary["rpe_rot_rmse_rad"]), 5
            )
            rec["median_frame_ms"] = round(summary["median_frame_ms"], 1)

        line = json.dumps(rec)
        print(line, flush=True)
        with out_path.open("a") as fh:
            fh.write(line + "\n")

    print("pareto done", flush=True)


if __name__ == "__main__":
    main()
