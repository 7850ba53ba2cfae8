"""Experiment: amortize the ~20 us/grid-step pallas overhead with fatter
steps (vmem_limit_bytes) and check dimension_semantics / input fusion.

exp_scalebytes.py model: t ~= 20.6 us/step + 7.0 us/MB (142 GB/s
marginal).  At the fused kernel's shape (32 steps x 4.3 MB) the step
term is 0.66 ms of the 1.6 ms stream time.  If the 16 MB scoped-VMEM
default is below the physical VMEM, multi-element blocks cut the step
count directly.

Usage: python benchmarks/exp_fatstep.py [--reps 30]
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
    B = 32
    PPE = 7  # planes per element per input; 2 inputs = 4.3 MB/element

    rng = np.random.default_rng(0)
    arrs = [
        jnp.asarray(rng.random((B, PPE, hp, wp), dtype=np.float32))
        for _ in range(2)
    ]
    mb = sum(a.size for a in arrs) * 4 / 1e6

    def timed(name, fn):
        def looped(seed):
            def body(_, s):
                out = fn(s)
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
        print(f"{name:44s} {ms:7.3f} ms/call  ({mb / ms:.0f} GB/s)",
              flush=True)
        return ms

    def stream(elems_per_step, params=None):
        steps = B // elems_per_step

        def kernel(a_ref, b_ref, out_ref):
            bi = pl.program_id(0)
            out_ref[bi % 8, 0] = a_ref[0, 0, 0, 0] + b_ref[0, 0, 0, 0]

        def run(seed):
            kw = {}
            if params is not None:
                kw["compiler_params"] = params
            return pl.pallas_call(
                kernel,
                grid=(steps,),
                in_specs=[
                    pl.BlockSpec(
                        (elems_per_step, PPE, hp, wp),
                        lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                    for _ in range(2)
                ],
                out_specs=pl.BlockSpec(
                    (8, 8), lambda i: (0, 0), memory_space=pltpu.SMEM
                ),
                out_shape=jax.ShapeDtypeStruct((8, 8), jnp.float32),
                **kw,
            )(arrs[0] + seed * 0, arrs[1] + seed * 0)

        return run

    cases = [
        ("1 elem/step (reference, 32 steps)", 1, None),
        ("1 elem/step, parallel semantics", 1,
         pltpu.CompilerParams(dimension_semantics=("parallel",))),
        ("1 elem/step, arbitrary semantics", 1,
         pltpu.CompilerParams(dimension_semantics=("arbitrary",))),
        ("2 elem/step, vmem 64M (16 steps)", 2,
         pltpu.CompilerParams(vmem_limit_bytes=64 << 20)),
        ("4 elem/step, vmem 100M (8 steps)", 4,
         pltpu.CompilerParams(vmem_limit_bytes=100 << 20)),
        ("8 elem/step, vmem 128M (4 steps)", 8,
         pltpu.CompilerParams(vmem_limit_bytes=128 << 20)),
    ]
    for name, eps, params in cases:
        try:
            timed(name, stream(eps, params))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
