"""Measure the baseline fps recorded in benchmarks/baseline.json.

The reference implementation cannot run in this image (its CPU compute
tier is Numba JIT; numba is not installed — see BASELINE.md).  As the
closest measurable stand-in, this records THIS framework's single-pair
sequential tracking throughput on the host CPU (JAX-CPU backend), same
algorithm and config as bench.py — i.e. "one frame at a time on CPU", the
reference's operating mode.  Usage::

    python benchmarks/measure_baseline.py
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import numpy as np

    from dense_visual_odometry_tpu.config import RobustDVOConfig
    from dense_visual_odometry_tpu.io import load_bundled_sequence
    from dense_visual_odometry_tpu.models.session import OdometrySession

    cfg = RobustDVOConfig(levels=4, max_iterations=100, use_weighter=True)
    seq = load_bundled_sequence()
    session = OdometrySession(seq.camera, cfg)

    times = []
    for i, (rgb, depth) in enumerate(seq):
        t0 = time.perf_counter()
        pose = session.step(rgb, depth)
        pose.matrix.block_until_ready()
        times.append(time.perf_counter() - t0)

    steady = times[1:]
    fps = 1.0 / float(np.mean(steady))
    out = {
        "baseline_fps": round(fps, 3),
        "what": "this framework, single-pair sequential, JAX-CPU backend, "
        "levels=4 IRLS max_iterations=100, bundled 640x480 set",
        "why_not_reference": "reference CPU tier is Numba JIT; numba not "
        "installed in this image (see BASELINE.md)",
        "mean_frame_ms": round(float(np.mean(steady)) * 1e3, 1),
    }
    (REPO / "benchmarks" / "baseline.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
