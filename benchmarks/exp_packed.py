"""Experiment: packed-parity fixed-point tap loop for the fused kernel.

Hypothesis (RESULTS.md roofline section): the fused GN-iteration kernel
is bound by `pltpu.roll` data movement — 63 full-plane rolls per call at
r=3/stride=2 ((2r+1)*stride axis-0 + (2r+1)^2 axis-1).  Packing the two
x-parity planes as 16-bit fixed point (round(v*256)) into one int32 lane
serves TWO x-taps per axis-1 roll and halves the axis-0 roll count:
63 -> 35 rolls.  Unpacking is three 32-bit VPU ops per tap
(mask/shift + int->float convert + scale), which the in-kernel
attribution says is free behind the roll traffic.  Quantization is
+-1/512 intensity — two orders below the sensor noise the IRLS already
absorbs.

This script measures the shipped kernel vs the packed probe at the
B=32 level-0 shipped shape (r=3, stride 2) on the real TPU and checks
H/b/err agreement.  Timing per CLAUDE.md: N chained calls in one jit
with a scalar output; np.asarray to synchronize.

Usage: python benchmarks/exp_packed.py [--batch 32] [--reps 20]
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
    ap.add_argument("--radius", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from dense_visual_odometry_tpu.ops.pallas.fused_iter import (
        _OUT_COLS,
        fused_iteration_pallas,
    )
    from dense_visual_odometry_tpu.ops.pallas.stackwarp import (
        prepare_shift_stack,
    )

    b = args.batch
    radius = args.radius
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

    planes, du, dv, ok = jax.jit(
        lambda im, a, c: prepare_shift_stack(
            im, a, c, radius=radius, grid_stride=stride
        )
    )(img, u, v)
    planes = jax.block_until_ready(planes)
    valid = ok.astype(jnp.float32)
    ph, pw = planes.shape[-2], planes.shape[-1]
    print(f"planes {planes.shape}  grid {hp}x{wp}", flush=True)

    # ---- packing: planes (B, 4, ph, pw) f32 -> (B, 2, ph, pw) int32 ----
    def pack_planes(pl32):
        q = jnp.clip(
            jnp.round(pl32 * 256.0), 0.0, 65535.0
        ).astype(jnp.int32)
        lo = q[:, 0::2]  # pb = 0
        hi = q[:, 1::2]  # pb = 1
        return jnp.bitwise_or(lo, hi << 16)

    packed = jax.jit(pack_planes)(planes)
    packed = jax.block_until_ready(packed)

    # ---- packed probe kernel: full fused semantics ----
    def packed_kernel(
        planes_ref, du_ref, dv_ref, gray_ref, valid_ref, jac_ref, lam_ref,
        out_ref, acc_ref,
    ):
        bi = pl.program_id(0)
        du_p = du_ref[0]
        dv_p = dv_ref[0]
        acc_ref[...] = jnp.zeros((hp, wp), jnp.float32)
        inv = jnp.float32(1.0 / 256.0)
        for ky in range(-radius, radius + 1):
            a = radius + ky
            pa = a % stride
            qa = a // stride
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(dv_p - ky))
            prow = pltpu.roll(planes_ref[0, pa], (ph - qa) % ph, axis=0)
            for qb in range((2 * radius) // 2 + 1):
                srow = pltpu.roll(prow, (pw - qb) % pw, axis=1)[:hp, :wp]
                # lo half: b = 2*qb (pb=0)
                kx0 = 2 * qb - radius
                lo = (srow & 0xFFFF).astype(jnp.float32) * inv
                wx0 = jnp.maximum(0.0, 1.0 - jnp.abs(du_p - kx0))
                acc_ref[...] = acc_ref[...] + (wy * wx0) * lo
                # hi half: b = 2*qb + 1 (pb=1), if within the window
                if 2 * qb + 1 <= 2 * radius:
                    kx1 = kx0 + 1
                    hi_bits = (srow >> 16) & 0xFFFF
                    hi = hi_bits.astype(jnp.float32) * inv
                    wx1 = jnp.maximum(0.0, 1.0 - jnp.abs(du_p - kx1))
                    acc_ref[...] = acc_ref[...] + (wy * wx1) * hi

        valid_p = valid_ref[0]
        res = jnp.where(valid_p > 0.0, acc_ref[...] - gray_ref[0], 0.0)
        rsq = res * res
        count = jnp.sum(valid_p)
        count_safe = jnp.maximum(count, 1.0)
        lam = lam_ref[bi, 0]
        dofc = jnp.float32(5.0)
        for _ in range(3):
            w_est = (dofc + 1.0) / (dofc + rsq * lam)
            sigma_sq = jnp.sum(valid_p * rsq * w_est) / count_safe
            lam = 1.0 / jnp.maximum(sigma_sq, 1e-20)
        weights = valid_p * (dofc + 1.0) / (dofc + rsq * lam)
        jw = [jac_ref[0, i] * weights for i in range(6)]
        for i in range(6):
            for j in range(i, 6):
                hij = jnp.sum(jw[i] * jac_ref[0, j])
                out_ref[bi, i * 6 + j] = hij
                if i != j:
                    out_ref[bi, j * 6 + i] = hij
        for i in range(6):
            out_ref[bi, 36 + i] = -jnp.sum(jw[i] * res)
        out_ref[bi, 42] = jnp.sum(weights * rsq)
        out_ref[bi, 43] = count
        out_ref[bi, 44] = lam
        for k in range(45, _OUT_COLS):
            out_ref[bi, k] = 0.0

    def run_packed(packed_in, du_in):
        grid_plane = lambda i: (i, 0, 0)  # noqa: E731
        img_spec = lambda: pl.BlockSpec(  # noqa: E731
            (1, hp, wp), grid_plane, memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            packed_kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec(
                    (1, 2, ph, pw), lambda i: (i, 0, 0, 0),
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
                (b, _OUT_COLS), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            out_shape=jax.ShapeDtypeStruct((b, _OUT_COLS), jnp.float32),
            scratch_shapes=[pltpu.VMEM((hp, wp), jnp.float32)],
        )(packed_in, du_in, dv, gray_prev, valid, jac, lam0)

    # ---- numerics: packed vs shipped on the same inputs ----
    ref_out = np.asarray(
        jax.jit(
            lambda d: fused_iteration_pallas(
                planes, d, dv, gray_prev, valid, jac, lam0,
                radius=radius, grid_stride=stride,
            )
        )(du)
    )
    pk_out = np.asarray(jax.jit(run_packed)(packed, du))
    h_rel = np.max(
        np.abs(pk_out[:, :36] - ref_out[:, :36])
        / np.maximum(np.abs(ref_out[:, :36]), 1.0)
    )
    b_rel = np.max(
        np.abs(pk_out[:, 36:42] - ref_out[:, 36:42])
        / np.maximum(np.abs(ref_out[:, 36:42]), 1.0)
    )
    e_rel = np.max(
        np.abs(pk_out[:, 42] - ref_out[:, 42])
        / np.maximum(np.abs(ref_out[:, 42]), 1.0)
    )
    print(f"rel diff  H {h_rel:.3e}  b {b_rel:.3e}  err {e_rel:.3e}",
          flush=True)

    # ---- timing ----
    n = args.reps

    def timed(name, fn):
        def looped(seed):
            def body(_, s):
                out = fn(s)
                return out[:, 0].sum() * 1e-30
            return jax.lax.fori_loop(0, n, body, seed)

        g = jax.jit(looped)
        np.asarray(g(jnp.float32(0.0)))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(g(jnp.float32(0.0)))
            times.append((time.perf_counter() - t0) * 1e3 / n)
        ms = sorted(times)[1]
        print(f"{name:18s} {ms:7.2f} ms/call (B={b}, r={radius})", flush=True)
        return ms

    t_ref = timed(
        "shipped fused",
        lambda s: fused_iteration_pallas(
            planes, du + s * 0, dv, gray_prev, valid, jac, lam0,
            radius=radius, grid_stride=stride,
        ),
    )
    t_pk = timed("packed fused", lambda s: run_packed(packed, du + s * 0))
    print(f"speedup {t_ref / t_pk:.2f}x", flush=True)


if __name__ == "__main__":
    main()
