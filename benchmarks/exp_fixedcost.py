"""Experiment: what is the fused kernel's per-call FIXED cost?

exp_packed/exp_group showed the kernel time is insensitive to roll count
(63->35: -3%), accumulator RMW count (49->7: 0%), and historically to
tap count (81->49 taps: -10%).  Something large and invariant binds.
Candidates:

  stream      pure input streaming: same BlockSpecs, kernel touches one
              element of every input and does nothing else -> isolates
              the HBM->VMEM pipeline cost (139 MB/call at B=32).
  nojac       the full tap loop + IRLS but NO jacobian input at all
              (jac is 59 MB of the 139 MB streamed; H/b replaced with
              du-weighted sums so the compiler can't elide the work).
  radius sweep r in {1, 2, 3}: slope = per-tap cost, intercept = fixed.

Usage: python benchmarks/exp_fixedcost.py [--batch 32] [--reps 20]
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
    from dense_visual_odometry_tpu.ops.pallas.stackwarp import (
        prepare_shift_stack,
    )

    b = args.batch
    stride = 2
    h, w = 480, 640
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

    n = args.reps

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
        print(f"{name:22s} {ms:7.2f} ms/call (B={b})", flush=True)
        return ms

    # radius sweep of the shipped kernel
    for radius in (1, 2, 3):
        planes, du, dv, ok = jax.jit(
            lambda im, a, c, r=radius: prepare_shift_stack(
                im, a, c, radius=r, grid_stride=stride
            )
        )(img, u, v)
        planes = jax.block_until_ready(planes)
        valid = ok.astype(jnp.float32)
        taps = (2 * radius + 1) ** 2
        timed(
            f"shipped r={radius} ({taps:2d} taps)",
            lambda s, pp=planes, dd=du, vv_=dv, va=valid, r=radius:
            fused_iteration_pallas(
                pp, dd + s * 0, vv_, gray_prev, va, jac, lam0,
                radius=r, grid_stride=stride,
            )[:, 0],
        )

    # r=3 shapes for the probes
    radius = 3
    planes, du, dv, ok = jax.jit(
        lambda im, a, c: prepare_shift_stack(
            im, a, c, radius=radius, grid_stride=stride
        )
    )(img, u, v)
    planes = jax.block_until_ready(planes)
    valid = ok.astype(jnp.float32)
    ph, pw = planes.shape[-2], planes.shape[-1]

    # ---- stream probe: touch every input, no compute ----
    def stream_kernel(planes_ref, du_ref, dv_ref, gray_ref, valid_ref,
                      jac_ref, lam_ref, out_ref):
        bi = pl.program_id(0)
        out_ref[bi, 0] = (
            planes_ref[0, 0, 0, 0] + du_ref[0, 0, 0] + dv_ref[0, 0, 0]
            + gray_ref[0, 0, 0] + valid_ref[0, 0, 0] + jac_ref[0, 0, 0, 0]
            + lam_ref[bi, 0]
        )
        for k in range(1, 8):
            out_ref[bi, k] = 0.0

    def specs(nplanes, njac):
        grid_plane = lambda i: (i, 0, 0)  # noqa: E731
        img_spec = lambda: pl.BlockSpec(  # noqa: E731
            (1, hp, wp), grid_plane, memory_space=pltpu.VMEM
        )
        sp = [
            pl.BlockSpec(
                (1, nplanes, ph, pw), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            img_spec(), img_spec(), img_spec(), img_spec(),
        ]
        if njac:
            sp.append(
                pl.BlockSpec(
                    (1, njac, hp, wp), lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
        sp.append(
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        )
        return sp

    def run_stream(du_in):
        return pl.pallas_call(
            stream_kernel,
            grid=(b,),
            in_specs=specs(4, 6),
            out_specs=pl.BlockSpec(
                (b, 8), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            out_shape=jax.ShapeDtypeStruct((b, 8), jnp.float32),
        )(planes, du_in, dv, gray_prev, valid, jac, lam0)

    timed("stream (no compute)", lambda s: run_stream(du + s * 0)[:, 0])

    # ---- nojac probe: full taps+IRLS, jacobian never streamed ----
    def nojac_kernel(planes_ref, du_ref, dv_ref, gray_ref, valid_ref,
                     lam_ref, out_ref, acc_ref):
        bi = pl.program_id(0)
        du_p = du_ref[0]
        dv_p = dv_ref[0]
        acc_ref[...] = jnp.zeros((hp, wp), jnp.float32)
        for ky in range(-radius, radius + 1):
            a = radius + ky
            pa, qa = a % stride, a // stride
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(dv_p - ky))
            for pb in range(stride):
                row = pltpu.roll(
                    planes_ref[0, pa * stride + pb], (ph - qa) % ph, axis=0
                )
                for kx in range(-radius, radius + 1):
                    bb = radius + kx
                    if bb % stride != pb:
                        continue
                    qb = bb // stride
                    shifted = pltpu.roll(row, (pw - qb) % pw, axis=1)[:hp, :wp]
                    wx = jnp.maximum(0.0, 1.0 - jnp.abs(du_p - kx))
                    acc_ref[...] = acc_ref[...] + (wy * wx) * shifted
        valid_p = valid_ref[0]
        res = jnp.where(valid_p > 0.0, acc_ref[...] - gray_ref[0], 0.0)
        rsq = res * res
        count = jnp.sum(valid_p)
        lam = lam_ref[bi, 0]
        dofc = jnp.float32(5.0)
        for _ in range(3):
            w_est = (dofc + 1.0) / (dofc + rsq * lam)
            sigma_sq = jnp.sum(valid_p * rsq * w_est) / jnp.maximum(count, 1.0)
            lam = 1.0 / jnp.maximum(sigma_sq, 1e-20)
        weights = valid_p * (dofc + 1.0) / (dofc + rsq * lam)
        # du-weighted pseudo-reduction so nothing is dead code
        out_ref[bi, 0] = jnp.sum(weights * res * du_p) + lam + count
        for k in range(1, 8):
            out_ref[bi, k] = 0.0

    def run_nojac(du_in):
        return pl.pallas_call(
            nojac_kernel,
            grid=(b,),
            in_specs=specs(4, 0),
            out_specs=pl.BlockSpec(
                (b, 8), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            out_shape=jax.ShapeDtypeStruct((b, 8), jnp.float32),
            scratch_shapes=[pltpu.VMEM((hp, wp), jnp.float32)],
        )(planes, du_in, dv, gray_prev, valid, lam0)

    timed("nojac taps+irls", lambda s: run_nojac(du + s * 0)[:, 0])


if __name__ == "__main__":
    main()
