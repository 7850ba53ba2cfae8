"""Experiment: is the fused kernel's fixed cost per grid step, per input
buffer, or per byte?

exp_fixedcost.py: stream-only (7 inputs, 139 MB, grid 32) = 1.46 ms —
82% of the full kernel; insensitive to bytes (nojac).  Hypothesis: a
~5-7 us fixed cost per DMA issue (7 buffers x 32 steps x ~6.5 us ~=
1.46 ms).  This script streams synthetic inputs through no-op kernels,
varying (a) the number of input buffers at constant total bytes,
(b) the grid step count at constant bytes and buffers, (c) total bytes.

Usage: python benchmarks/exp_stream2.py [--reps 30]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = args.reps
    B = 32
    hp, wp = 240, 320  # level-0 strided grid shape

    rng = np.random.default_rng(0)

    def timed(name, fn, arg):
        def looped(seed):
            def body(_, s):
                out = fn(arg, s)
                return out.ravel()[0] * 1e-30
            return jax.lax.fori_loop(0, n, body, seed)

        g = jax.jit(looped)
        np.asarray(g(jnp.float32(0.0)))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(g(jnp.float32(0.0)))
            times.append((time.perf_counter() - t0) * 1e3 / n)
        ms = sorted(times)[1]
        print(f"{name:36s} {ms:7.3f} ms/call", flush=True)
        return ms

    def stream(n_inputs, planes_per_input, grid_steps, elems_per_step):
        """grid_steps steps, each pulling (elems_per_step, planes, hp, wp)
        blocks from each of n_inputs arrays."""
        arrs = [
            jnp.asarray(
                rng.random(
                    (grid_steps * elems_per_step, planes_per_input, hp, wp),
                    dtype=np.float32,
                )
            )
            for _ in range(n_inputs)
        ]
        total_mb = sum(a.size for a in arrs) * 4 / 1e6

        def kernel(*refs):
            in_refs, out_ref = refs[:-1], refs[-1]
            bi = pl.program_id(0)
            s = jnp.float32(0.0)
            for r in in_refs:
                s = s + r[0, 0, 0, 0]
            out_ref[bi, 0] = s
            for k in range(1, 8):
                out_ref[bi, k] = 0.0

        def run(arrs_in, seed):
            return pl.pallas_call(
                kernel,
                grid=(grid_steps,),
                in_specs=[
                    pl.BlockSpec(
                        (elems_per_step, planes_per_input, hp, wp),
                        lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                    for _ in range(len(arrs_in))
                ],
                out_specs=pl.BlockSpec(
                    (grid_steps, 8), lambda i: (0, 0),
                    memory_space=pltpu.SMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((grid_steps, 8), jnp.float32),
            )(*[a + seed * 0 for a in arrs_in])

        return run, arrs, total_mb

    # (a) buffer count at constant bytes (14 planes/elem total, grid 32)
    for n_in, ppi in [(1, 14), (2, 7), (7, 2), (14, 1)]:
        run, arrs, mb = stream(n_in, ppi, B, 1)
        timed(f"{n_in:2d} buf x {ppi:2d} planes, grid {B} ({mb:.0f}MB)",
              run, arrs)

    # (b) grid step count at constant bytes and buffer count
    for steps, eps in [(32, 1), (16, 2), (8, 4)]:
        run, arrs, mb = stream(2, 7, steps, eps)
        timed(f" 2 buf x  7 planes, grid {steps:2d} ({mb:.0f}MB)",
              run, arrs)

    # (c) bytes at constant buffers/steps
    for ppi in (1, 4, 14):
        run, arrs, mb = stream(2, ppi, B, 1)
        timed(f" 2 buf x {ppi:2d} planes, grid {B} ({mb:.0f}MB)",
              run, arrs)


if __name__ == "__main__":
    main()
