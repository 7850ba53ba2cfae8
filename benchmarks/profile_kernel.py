"""Attribute time inside the fused GN-iteration Pallas kernel.

Probe kernels share the real kernel's memory layout (same BlockSpecs and
inputs as ``fused_iteration_pallas``) but compute only a subset of the
work, so differences between probes isolate the cost of each stage:

  taps        tent-weighted 81-tap accumulation only
  taps_const  same taps with constant weights (isolates the pltpu.roll
              data movement from the tent-weight arithmetic)
  +irls       taps + t-distribution scale fixed point
  full        the shipped kernel (taps + IRLS + H/b reduction)
  full_nw     shipped kernel with use_tweights=False (no IRLS divides)

Timing recipe per CLAUDE.md: N reps inside one jit via fori_loop with a
scalar dependency, synchronized by np.asarray.

Usage: python benchmarks/profile_kernel.py [--batch 32] [--reps 20]
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
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--radius", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from dense_visual_odometry_tpu.ops.pallas.fused_iter import (
        fused_iteration_pallas,
    )
    from dense_visual_odometry_tpu.ops.pallas.stackwarp import prepare_shift_stack

    b = args.batch
    radius = args.radius
    stride = 2
    h, w = 480, 640  # level-0 shapes of the shipped config
    hp, wp = h // stride, w // stride

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((b, h, w), dtype=np.float32) * 255.0)
    uu, vv = np.meshgrid(np.arange(wp) * stride, np.arange(hp) * stride)
    u = jnp.asarray(
        uu[None] + rng.random((b, hp, wp), dtype=np.float32) * 2.0 - 1.0,
        jnp.float32,
    )
    v = jnp.asarray(
        vv[None] + rng.random((b, hp, wp), dtype=np.float32) * 2.0 - 1.0,
        jnp.float32,
    )
    gray_prev = jnp.asarray(rng.random((b, hp, wp), dtype=np.float32) * 255.0)
    jac = jnp.asarray(rng.random((b, 6, hp, wp), dtype=np.float32) - 0.5)
    lam0 = jnp.full((b, 1), 1e-4, jnp.float32)

    planes, du, dv, ok = jax.jit(
        lambda im, a, c: prepare_shift_stack(
            im, a, c, radius=radius, grid_stride=stride
        )
    )(img, u, v)
    planes = jax.block_until_ready(planes)
    valid = ok.astype(jnp.float32)
    ph, pw = planes.shape[-2], planes.shape[-1]
    print(f"planes {planes.shape}  grid {hp}x{wp}", flush=True)

    def probe_kernel(stage: str):
        def kernel(planes_ref, du_ref, dv_ref, gray_ref, valid_ref, jac_ref,
                   lam_ref, out_ref, acc_ref):
            bi = pl.program_id(0)
            du_p = du_ref[0]
            dv_p = dv_ref[0]
            acc_ref[...] = jnp.zeros((hp, wp), jnp.float32)
            for ky in range(-radius, radius + 1):
                a = radius + ky
                pa = a % stride
                qa = a // stride
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(dv_p - ky))
                for pb in range(stride):
                    plane_idx = pa * stride + pb
                    row = pltpu.roll(
                        planes_ref[0, plane_idx], (ph - qa) % ph, axis=0
                    )
                    for kx in range(-radius, radius + 1):
                        bb = radius + kx
                        if bb % stride != pb:
                            continue
                        qb = bb // stride
                        shifted = pltpu.roll(
                            row, (pw - qb) % pw, axis=1
                        )[:hp, :wp]
                        if stage == "taps_const":
                            acc_ref[...] = acc_ref[...] + 0.01 * shifted
                        else:
                            wx = jnp.maximum(0.0, 1.0 - jnp.abs(du_p - kx))
                            acc_ref[...] = acc_ref[...] + (wy * wx) * shifted

            valid_p = valid_ref[0]
            res = jnp.where(valid_p > 0.0, acc_ref[...] - gray_ref[0], 0.0)
            rsq = res * res
            count = jnp.sum(valid_p)
            lam = lam_ref[bi, 0]
            if stage == "irls":
                dofc = jnp.float32(5.0)
                for _ in range(3):
                    w_est = (dofc + 1.0) / (dofc + rsq * lam)
                    sigma_sq = jnp.sum(valid_p * rsq * w_est)
                    sigma_sq = sigma_sq / jnp.maximum(count, 1.0)
                    lam = 1.0 / jnp.maximum(sigma_sq, 1e-20)
            out_ref[bi, 0] = jnp.sum(rsq) + lam
            for k in range(1, 8):
                out_ref[bi, k] = 0.0

        return kernel

    def run_probe(stage, du_in):
        kernel = probe_kernel(stage)
        grid_plane = lambda i: (i, 0, 0)  # noqa: E731
        img_spec = lambda: pl.BlockSpec(  # noqa: E731
            (1, hp, wp), grid_plane, memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec(
                    (1, stride * stride, ph, pw), lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                img_spec(), img_spec(), img_spec(), img_spec(),
                pl.BlockSpec(
                    (1, 6, hp, wp), lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (b, 8), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            out_shape=jax.ShapeDtypeStruct((b, 8), jnp.float32),
            scratch_shapes=[pltpu.VMEM((hp, wp), jnp.float32)],
        )(planes, du_in, dv, gray_prev, valid, jac, lam0)

    n = args.reps

    def timed(name, fn):
        def looped(seed):
            def body(_, s):
                out = fn(s)
                return jnp.asarray(out, jnp.float32).ravel()[0] * 1e-30
            return jax.lax.fori_loop(0, n, body, seed)

        g = jax.jit(looped)
        np.asarray(g(jnp.float32(0.0)))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(g(jnp.float32(0.0)))
            times.append((time.perf_counter() - t0) * 1e3 / n)
        ms = sorted(times)[1]
        print(f"{name:18s} {ms:7.2f} ms/call (B={b})", flush=True)
        return ms

    def full(s, **kw):
        out = fused_iteration_pallas(
            planes, du + s * 0, dv, gray_prev, valid, jac, lam0,
            radius=radius, grid_stride=stride, **kw,
        )
        return out[:, 0].sum()

    timed(
        "taps_const",
        lambda s: run_probe("taps_const", du + s * 0)[:, 0].sum(),
    )
    timed("taps", lambda s: run_probe("taps", du + s * 0)[:, 0].sum())
    timed("taps+irls", lambda s: run_probe("irls", du + s * 0)[:, 0].sum())
    timed("full", full)
    timed("full_no_tweights", lambda s: full(s, use_tweights=False))
    timed("full_unroll1", lambda s: full(s, unroll=1))


if __name__ == "__main__":
    main()
