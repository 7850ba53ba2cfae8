"""Experiment: grouped tap accumulation in the fused kernel.

exp_packed.py showed halving the `pltpu.roll` count buys only 3% — the
rolls are NOT the binding resource.  Remaining suspect: the accumulator
VMEM round-trip.  The shipped kernel does one `acc_ref[...] = acc_ref[...]
+ term` per tap = 49 dependent full-plane (240x320 f32) VMEM
read-modify-writes ≈ 30 MB of serialized VMEM traffic per batch element.

Probes (full fused-iteration semantics, same layout as the shipped
kernel):

  group_ky      one VMEM RMW per ky row: acc += wy * (sum_kx wx*shifted)
                — the inner sum is an expression tree the compiler can
                keep in registers (7 live plane temporaries, ~2 MB).
  group_all     zero intermediate RMWs: one expression over all 49 taps
                (may overflow VMEM; compile failure is an answer too).
  group_ky_pk   group_ky + the 16-bit packed planes from exp_packed
                (35 rolls instead of 63).

Usage: python benchmarks/exp_group.py [--batch 32] [--reps 20]
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

    def pack_planes(pl32):
        q = jnp.clip(jnp.round(pl32 * 256.0), 0.0, 65535.0).astype(jnp.int32)
        return jnp.bitwise_or(q[:, 0::2], q[:, 1::2] << 16)

    packed = jax.block_until_ready(jax.jit(pack_planes)(planes))

    def tail(out_ref, acc_ref, gray_ref, valid_ref, jac_ref, lam_ref, bi):
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

    def make_kernel(variant: str):
        def kernel(planes_ref, du_ref, dv_ref, gray_ref, valid_ref, jac_ref,
                   lam_ref, out_ref, acc_ref):
            bi = pl.program_id(0)
            du_p = du_ref[0]
            dv_p = dv_ref[0]
            inv = jnp.float32(1.0 / 256.0)
            if variant == "group_all":
                total = None
            else:
                acc_ref[...] = jnp.zeros((hp, wp), jnp.float32)
            for ky in range(-radius, radius + 1):
                a = radius + ky
                pa = a % stride
                qa = a // stride
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(dv_p - ky))
                inner = None
                if variant == "group_ky_pk":
                    prow = pltpu.roll(
                        planes_ref[0, pa], (ph - qa) % ph, axis=0
                    )
                    for qb in range(radius + 1):
                        srow = pltpu.roll(
                            prow, (pw - qb) % pw, axis=1
                        )[:hp, :wp]
                        kx0 = 2 * qb - radius
                        lo = (srow & 0xFFFF).astype(jnp.float32) * inv
                        wx0 = jnp.maximum(0.0, 1.0 - jnp.abs(du_p - kx0))
                        t = wx0 * lo
                        inner = t if inner is None else inner + t
                        if 2 * qb + 1 <= 2 * radius:
                            hi = ((srow >> 16) & 0xFFFF).astype(
                                jnp.float32
                            ) * inv
                            wx1 = jnp.maximum(
                                0.0, 1.0 - jnp.abs(du_p - (kx0 + 1))
                            )
                            inner = inner + wx1 * hi
                else:
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
                            wx = jnp.maximum(
                                0.0, 1.0 - jnp.abs(du_p - kx)
                            )
                            t = wx * shifted
                            inner = t if inner is None else inner + t
                if variant == "group_all":
                    term = wy * inner
                    total = term if total is None else total + term
                else:
                    acc_ref[...] = acc_ref[...] + wy * inner
            if variant == "group_all":
                acc_ref[...] = total
            tail(out_ref, acc_ref, gray_ref, valid_ref, jac_ref, lam_ref, bi)

        return kernel

    def run(variant, planes_in, du_in):
        nplanes = planes_in.shape[1]
        grid_plane = lambda i: (i, 0, 0)  # noqa: E731
        img_spec = lambda: pl.BlockSpec(  # noqa: E731
            (1, hp, wp), grid_plane, memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            make_kernel(variant),
            grid=(b,),
            in_specs=[
                pl.BlockSpec(
                    (1, nplanes, ph, pw), lambda i: (i, 0, 0, 0),
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
        )(planes_in, du_in, dv, gray_prev, valid, jac, lam0)

    ref_out = np.asarray(
        jax.jit(
            lambda d: fused_iteration_pallas(
                planes, d, dv, gray_prev, valid, jac, lam0,
                radius=radius, grid_stride=stride,
            )
        )(du)
    )

    def check(name, out):
        out = np.asarray(out)
        rel = np.max(
            np.abs(out - ref_out) / np.maximum(np.abs(ref_out), 1.0)
        )
        print(f"{name:14s} max rel diff vs shipped: {rel:.3e}", flush=True)

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
    for variant, pin in [
        ("group_ky", planes),
        ("group_ky_pk", packed),
        ("group_all", planes),
    ]:
        try:
            check(variant, jax.jit(lambda d, vv=variant, pp=pin: run(vv, pp, d))(du))
            t = timed(variant, lambda s, vv=variant, pp=pin: run(vv, pp, du + s * 0))
            print(f"  -> {t_ref / t:.2f}x vs shipped", flush=True)
        except Exception as e:  # compile failures are findings, not crashes
            print(f"{variant}: FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
