"""Experiment: pallas_call fixed overhead — per call? per operand?
And what bandwidth does plain XLA get on the same bytes?

Model so far (healthy-tunnel points): stream time ~= 0.7 ms/call fixed
+ ~7 us/MB, independent of grid step count (8/16/32 steps alike) and
buffer count at full volume.  Probes:

  empty g1        no-op kernel, one (8,128) input, grid (1,)
  empty g32       same, grid (32,)  -> isolates residual step cost
  empty 7buf      seven (8,128) inputs, grid (32,) -> per-operand cost
  xla 138MB       jnp elementwise reduce over the same 138 MB -> the
                  device's XLA streaming bandwidth for comparison
  pallas 138MB g8 (re-run of the best fatstep case, same session)

Usage: python benchmarks/exp_percall.py [--reps 30]
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
    rng = np.random.default_rng(0)

    def timed(name, fn, args_):
        def looped(seed):
            def body(_, s):
                out = fn(args_, s)
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
        print(f"{name:34s} {ms:7.3f} ms/call", flush=True)
        return ms

    tiny = [jnp.asarray(rng.random((8, 128), dtype=np.float32))
            for _ in range(7)]

    def empty(n_in, grid):
        def kernel(*refs):
            in_refs, out_ref = refs[:-1], refs[-1]
            s = jnp.float32(0.0)
            for r in in_refs:
                s = s + r[0, 0]
            out_ref[pl.program_id(0) % 8, 0] = s

        def run(arrs, seed):
            return pl.pallas_call(
                kernel,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((8, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
                    for _ in range(len(arrs))
                ],
                out_specs=pl.BlockSpec(
                    (8, 8), lambda i: (0, 0), memory_space=pltpu.SMEM
                ),
                out_shape=jax.ShapeDtypeStruct((8, 8), jnp.float32),
            )(*[a + seed * 0 for a in arrs])

        return run

    timed("empty, 1 buf, grid 1", empty(1, 1), tiny[:1])
    timed("empty, 1 buf, grid 32", empty(1, 32), tiny[:1])
    timed("empty, 7 buf, grid 1", empty(7, 1), tiny)
    timed("empty, 7 buf, grid 32", empty(7, 32), tiny)

    # XLA streaming bandwidth on the fused kernel's byte volume
    big = [jnp.asarray(rng.random((32, 7, 240, 320), dtype=np.float32))
           for _ in range(2)]
    mb = sum(a.size for a in big) * 4 / 1e6

    def xla_reduce(arrs, seed):
        return (
            jnp.sum(arrs[0] * 1.5 + seed, axis=(1, 2, 3))
            + jnp.sum(arrs[1] * 0.5, axis=(1, 2, 3))
        )

    t = timed("xla elementwise+reduce 138MB", xla_reduce, big)
    print(f"  -> XLA effective {mb / t:.0f} GB/s", flush=True)

    # pallas same bytes, 8 fat steps (same-session comparison)
    def pallas_fat(arrs, seed):
        def kernel(a_ref, b_ref, out_ref):
            out_ref[pl.program_id(0) % 8, 0] = (
                a_ref[0, 0, 0, 0] + b_ref[0, 0, 0, 0]
            )

        return pl.pallas_call(
            kernel,
            grid=(8,),
            in_specs=[
                pl.BlockSpec((4, 7, 240, 320), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(2)
            ],
            out_specs=pl.BlockSpec(
                (8, 8), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            out_shape=jax.ShapeDtypeStruct((8, 8), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 << 20
            ),
        )(arrs[0] + seed * 0, arrs[1] + seed * 0)

    t = timed("pallas stream 138MB, 8 steps", pallas_fat, big)
    print(f"  -> pallas effective {mb / t:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
