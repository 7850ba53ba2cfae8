"""Experiment: is the slow (92 GB/s) pallas input streaming a lane-
alignment artifact?

exp_stream2.py measured ~1.5 ms to stream 138 MB through the fused
kernel's BlockSpecs regardless of buffer count — ~92 GB/s, 11% of the
v5e's HBM bandwidth.  The arrays are (.., 240, 320): the 320-float rows
are NOT a multiple of the 128-lane tile, so each row maps to a partial
tile and the HBM->VMEM DMA must move row-sized (1280 B) segments.  At
the observed rate that is ~14 ns/row — a per-segment descriptor cost,
not bandwidth.

Probe: stream identical byte volumes with last dim 320 (unaligned),
384 (3 lane tiles), and 256/128-multiples, same grid.  If aligned rows
recover several x, the fix for the real kernel is to PAD every kernel
input's minor dim to 128 multiples on the XLA side (VMEM compute cost
is unchanged — the lanes are already physically padded on-chip).

Usage: python benchmarks/exp_align.py [--reps 30]
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
        mb = arg[0].size * len(arg) * 4 / 1e6
        ms = sorted(times)[1]
        print(f"{name:34s} {ms:7.3f} ms/call  ({mb:.0f}MB, "
              f"{mb / ms:.0f} GB/s)", flush=True)
        return ms

    def stream(hp, wp, planes_per_input, n_inputs=2):
        arrs = [
            jnp.asarray(
                rng.random((B, planes_per_input, hp, wp), dtype=np.float32)
            )
            for _ in range(n_inputs)
        ]

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
                grid=(B,),
                in_specs=[
                    pl.BlockSpec(
                        (1, planes_per_input, hp, wp),
                        lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                    for _ in range(len(arrs_in))
                ],
                out_specs=pl.BlockSpec(
                    (B, 8), lambda i: (0, 0), memory_space=pltpu.SMEM
                ),
                out_shape=jax.ShapeDtypeStruct((B, 8), jnp.float32),
            )(*[a + seed * 0 for a in arrs_in])

        return run, arrs

    cases = [
        # (name, hp, wp, planes/input) — 2 inputs each
        ("240x320 (unaligned rows)", 240, 320, 7),
        ("240x384 (3 lane tiles)", 240, 384, 6),   # ~same bytes/plane set
        ("240x256 (2 lane tiles)", 240, 256, 9),
        ("720x128 (1 lane tile)", 720, 128, 7),    # same bytes as 240x384x6? 720*128=92160 vs 240*384=92160 yes
        ("240x323 (planes-shaped)", 240, 323, 7),
        ("248x384 (aligned both)", 248, 384, 6),
        ("240x320 x2 bytes", 240, 320, 14),
        ("240x384 x2 bytes", 240, 384, 12),
    ]
    for name, hp, wp, ppi in cases:
        try:
            run, arrs = stream(hp, wp, ppi)
            timed(name, run, arrs)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
