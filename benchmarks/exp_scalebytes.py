"""Experiment: does pallas input streaming scale with bytes or steps?

exp_align.py: ~90-104 GB/s for every block shape at grid=(32,).  Two
models remain: (a) a genuine ~100 GB/s DMA bandwidth ceiling for
pallas_call input pipelines on this part, (b) per-grid-step issue
latency (~46 us/step) that happens to match 4.3 MB/step.  Probes:

  quarter bytes, same steps   -> (a): ~0.4 ms   (b): ~1.4 ms
  same bytes, 4x steps        -> (a): ~1.5 ms   (b): ~6 ms

Usage: python benchmarks/exp_scalebytes.py [--reps 30]
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
    hp, wp = 240, 320

    rng = np.random.default_rng(0)

    def timed(name, fn, arg, mb):
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
        print(f"{name:40s} {ms:7.3f} ms/call  ({mb:.0f}MB, "
              f"{mb / ms:.0f} GB/s)", flush=True)
        return ms

    def stream(total_planes, planes_per_step, n_inputs=2):
        steps = total_planes // planes_per_step
        arrs = [
            jnp.asarray(
                rng.random((steps, planes_per_step, hp, wp),
                           dtype=np.float32)
            )
            for _ in range(n_inputs)
        ]
        mb = sum(a.size for a in arrs) * 4 / 1e6

        def kernel(*refs):
            in_refs, out_ref = refs[:-1], refs[-1]
            bi = pl.program_id(0)
            s = jnp.float32(0.0)
            for r in in_refs:
                s = s + r[0, 0, 0, 0]
            out_ref[bi % 8, 0] = s

        def run(arrs_in, seed):
            return pl.pallas_call(
                kernel,
                grid=(steps,),
                in_specs=[
                    pl.BlockSpec(
                        (1, planes_per_step, hp, wp),
                        lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                    for _ in range(len(arrs_in))
                ],
                out_specs=pl.BlockSpec(
                    (8, 8), lambda i: (0, 0), memory_space=pltpu.SMEM
                ),
                out_shape=jax.ShapeDtypeStruct((8, 8), jnp.float32),
            )(*[a + seed * 0 for a in arrs_in])

        return run, arrs, mb

    # reference: 32 steps x 7 planes x 2 inputs = 138 MB
    for name, total, per in [
        ("32 steps x 7 planes (reference)", 224, 7),
        ("32 steps x 2 planes (quarter bytes)", 64, 2),
        ("128 steps x 7 planes (4x bytes+steps)", 896, 7),
        ("112 steps x 2 planes (same bytes 3.5x steps)", 224, 2),
        ("8 steps x 7 planes (quarter steps+bytes)", 56, 7),
    ]:
        try:
            run, arrs, mb = stream(total, per)
            timed(name, run, arrs, mb)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
