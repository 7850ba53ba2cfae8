"""Feasibility probe for the level-fused solver kernel (Mosaic).

Checks that one Mosaic kernel can express everything the per-level LM
loop needs before we build the real thing:

  - lax.while_loop with a large scalar-tuple carry and data-dependent
    trip count
  - scalar sqrt / sin / cos / arccos (se3.exp & log)
  - vector ops that broadcast loop-carried scalars over a VMEM plane
  - jnp.sum plane->scalar reductions inside the loop body
  - broadcasted_iota pixel coordinates
  - SMEM input rows selected by program_id, SMEM output rows

Also times the trip-count scaling to confirm iterations are cheap
on-chip (the whole point).

Usage: python benchmarks/exp_megafeas.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = 8
    hp, wp = 64, 128

    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.random((B, hp, wp), dtype=np.float32))
    theta0 = jnp.asarray(
        rng.random((B, 8), dtype=np.float32) * 0.5 + 0.1
    )

    def kernel(plane_ref, th_ref, out_ref):
        bi = pl.program_id(0)
        img = plane_ref[0]
        # tpu.iota only produces integers; convert after.
        rowi = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0).astype(
            jnp.float32
        )
        coli = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1).astype(
            jnp.float32
        )

        def cond(c):
            it, done, th, acc = c
            return jnp.logical_and(~done, it < 50)

        def body(c):
            it, done, th, acc = c
            s, co = jnp.sin(th), jnp.cos(th)
            r = jnp.sqrt(jnp.maximum(th, 1e-20))
            # Neither acos nor atan2 lowers in Mosaic (measured); se3.log
            # must invert cos by Newton: chord init + refinement.
            cc = jnp.clip(co, -1.0, 1.0)
            a = jnp.sqrt(jnp.maximum(2.0 * (1.0 - cc), 0.0))
            for _ in range(3):
                sa = jnp.sin(a)
                a = a + (jnp.cos(a) - cc) / jnp.maximum(sa, 1e-6)
            # broadcast loop scalars over the plane, reduce back
            w = img * s + rowi * (co * 1e-6) + coli * (r * 1e-6)
            m = jnp.sum(w) / (hp * wp)
            th2 = th * 0.9 + m * 1e-3 + a * 0.0
            done2 = jnp.abs(th2 - th) < 1e-4
            return (it + 1, done2, th2, acc + m)

        it, done, th, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.bool_(False), th_ref[bi, 0],
                         jnp.float32(0.0))
        )
        out_ref[bi, 0] = th
        out_ref[bi, 1] = acc
        out_ref[bi, 2] = it.astype(jnp.float32)
        for k in range(3, 8):
            out_ref[bi, k] = 0.0

    def run(th):
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 8), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (B, 8), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, 8), jnp.float32),
        )(plane, th)

    # interpret-mode reference
    ref = np.asarray(
        pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 8), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (B, 8), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, 8), jnp.float32),
            interpret=True,
        )(plane, theta0)
    )
    t0 = time.perf_counter()
    got = np.asarray(jax.jit(run)(theta0))
    compile_s = time.perf_counter() - t0
    diff = np.max(np.abs(got - ref))
    print(f"compiled ok in {compile_s:.1f}s; max |tpu - interpret| = "
          f"{diff:.2e}", flush=True)
    print("iterations per element:", got[:, 2].astype(int), flush=True)

    # trip-count cost: time with all elements forced to ~50 iterations
    n = 20

    def timed(name, th):
        def looped(seed):
            def body(_, s):
                out = run(th + s * 0)
                return out[0, 1] * 1e-30
            return jax.lax.fori_loop(0, n, body, seed)

        g = jax.jit(looped)
        np.asarray(g(jnp.float32(0.0)))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(g(jnp.float32(0.0)))
            times.append((time.perf_counter() - t0) * 1e3 / n)
        print(f"{name:28s} {sorted(times)[1]:7.3f} ms/call", flush=True)

    timed("while-kernel (converging)", theta0)
    timed("while-kernel (max trips)", jnp.full_like(theta0, 0.9))


if __name__ == "__main__":
    main()
