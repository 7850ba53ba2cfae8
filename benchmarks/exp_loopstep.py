"""Experiment: what does ONE sequential device-loop step cost on this
transport, independent of the work inside it?

exp_percall.py: an EMPTY pallas call inside the fori timing loop reads
~0.9 ms.  Either pallas dispatch costs 0.9 ms on-device, or the fori
step itself does (and every prior kernel measurement carries the same
additive bias — and, far more importantly, the tracker's LM while_loop
pays it per iteration).

  fori scalar           body = scalar fma only
  fori vec              body = one (8,128) fma
  fori pallas           body = no-op pallas call (repeat of exp_percall)
  unrolled 30x pallas   30 back-to-back no-op pallas calls in ONE jit,
                        no loop -> separates loop-step from call cost
  fori 2x pallas        two no-op pallas calls per fori step

Usage: python benchmarks/exp_loopstep.py [--reps 30]
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
    tiny = jnp.asarray(rng.random((8, 128), dtype=np.float32))

    def noop_call(x):
        def kernel(a_ref, out_ref):
            out_ref[0, 0] = a_ref[0, 0]

        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 8), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((8, 8), jnp.float32),
        )(x)

    def timed(name, looped):
        g = jax.jit(looped)
        np.asarray(g(jnp.float32(0.0)))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(g(jnp.float32(0.0)))
            times.append((time.perf_counter() - t0) * 1e3 / n)
        ms = sorted(times)[1]
        print(f"{name:30s} {ms:7.3f} ms/step-equivalent", flush=True)
        return ms

    def fori_scalar(seed):
        def body(_, s):
            return s * jnp.float32(1.0000001) + jnp.float32(1e-30)
        return jax.lax.fori_loop(0, n, body, seed)

    timed("fori scalar", fori_scalar)

    def fori_vec(seed):
        def body(_, carry):
            return carry * jnp.float32(1.0000001) + tiny[0, 0] * 1e-30
        return jax.lax.fori_loop(0, n, body, seed)

    timed("fori vec-read", fori_vec)

    def fori_pallas(seed):
        def body(_, s):
            out = noop_call(tiny + s * 0)
            return out[0, 0] * 1e-30
        return jax.lax.fori_loop(0, n, body, seed)

    timed("fori 1x pallas", fori_pallas)

    def fori_pallas2(seed):
        def body(_, s):
            a = noop_call(tiny + s * 0)
            b = noop_call(tiny + a[0, 0])
            return b[0, 0] * 1e-30
        return jax.lax.fori_loop(0, n, body, seed)

    t2 = timed("fori 2x pallas (dependent)", fori_pallas2)
    del t2

    def unrolled(seed):
        s = seed
        for _ in range(n):
            out = noop_call(tiny + s * 0)
            s = out[0, 0] * 1e-30
        return s

    timed("unrolled Nx pallas (dependent)", unrolled)


if __name__ == "__main__":
    main()
