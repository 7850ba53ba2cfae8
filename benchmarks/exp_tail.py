"""Experiment: per-iteration cost of the LM loop's TAIL math (everything
after the fused kernel) and how much a fusion-friendly 6x6 solve saves.

exp_loopstep.py: one sequential thunk ~0.9 ms on this transport; a bare
loop step ~1.0 ms.  The LM body tail is: accept/where bookkeeping,
damped 6x6 solve (jnp.linalg.solve -> LAPACK-style custom call(s)),
se3.exp, two 4x4 composes, predictive-stop scalars.  If the solve alone
adds thunks, an unrolled Cholesky (pure elementwise -> one fusion)
recovers ~1 ms x iterations x levels per frame.

Variants (fori body, batch 32):
  tail/linalg.solve    the shipped tail verbatim
  tail/unrolled chol   same tail with a hand-unrolled Cholesky solve
  solve only (linalg)  just the damped solve
  solve only (chol)
  exp+compose only

Usage: python benchmarks/exp_tail.py [--reps 30]
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
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np

    from dense_visual_odometry_tpu.utils.lie import se3

    B = args.batch
    n = args.reps
    rng = np.random.default_rng(0)
    A = rng.random((B, 6, 6)).astype(np.float32)
    H = jnp.asarray(A @ A.transpose(0, 2, 1) + 6 * np.eye(6, dtype=np.float32))
    rhs = jnp.asarray(rng.random((B, 6), dtype=np.float32))
    est0 = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
    eye6 = jnp.eye(6, dtype=jnp.float32)

    def chol_solve6(Hd, b):
        """Unrolled 6x6 Cholesky solve, pure elementwise -> one fusion."""
        L = [[None] * 6 for _ in range(6)]
        for j in range(6):
            s = Hd[..., j, j]
            for k in range(j):
                s = s - L[j][k] * L[j][k]
            djj = jnp.sqrt(jnp.maximum(s, 1e-30))
            L[j][j] = djj
            inv = 1.0 / djj
            for i in range(j + 1, 6):
                s = Hd[..., i, j]
                for k in range(j):
                    s = s - L[i][k] * L[j][k]
                L[i][j] = s * inv
        # forward solve L y = b
        y = [None] * 6
        for i in range(6):
            s = b[..., i]
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s / L[i][i]
        # back solve L^T x = y
        x = [None] * 6
        for i in reversed(range(6)):
            s = y[i]
            for k in range(i + 1, 6):
                s = s - L[k][i] * x[k]
            x[i] = s / L[i][i]
        return jnp.stack(x, axis=-1)

    # numerics check
    ref = np.asarray(jnp.linalg.solve(H, rhs[..., None])[..., 0])
    got = np.asarray(chol_solve6(H, rhs))
    print("chol vs linalg rel diff:",
          float(np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1e-6))),
          flush=True)

    def timed(name, body):
        def looped(seed):
            def b_(_, s):
                return body(s)
            return jax.lax.fori_loop(0, n, b_, seed)

        g = jax.jit(looped)
        np.asarray(g(jnp.float32(0.0)))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(g(jnp.float32(0.0)))
            times.append((time.perf_counter() - t0) * 1e3 / n)
        ms = sorted(times)[1]
        print(f"{name:28s} {ms:7.3f} ms/step", flush=True)
        return ms

    lam = jnp.full((B,), 1e-4, jnp.float32)

    def tail(s, solver):
        Hs = H + s * 0
        floor = 1e-8 * (1.0 + jnp.trace(Hs, axis1=-2, axis2=-1))
        damped = (
            Hs + lam[..., None, None] * (Hs * eye6)
            + floor[..., None, None] * eye6
        )
        if solver == "linalg":
            delta = jnp.linalg.solve(damped, rhs[..., None])[..., 0]
        else:
            delta = chol_solve6(damped, rhs)
        ok = jnp.all(jnp.isfinite(delta), axis=-1)
        delta = jnp.where(ok[..., None], delta, 0.0)
        pred = jnp.sum(delta * rhs, axis=-1)
        inc = se3.exp(delta)
        est = jnp.where((pred > 0)[..., None, None], inc @ est0, est0)
        anchor = jnp.where(
            (pred > 0)[..., None, None], se3.inverse(inc) @ est0, est0
        )
        return est[:, 0, 0].sum() * 1e-30 + anchor[:, 0, 0].sum() * 1e-30

    timed("tail w/ linalg.solve", lambda s: tail(s, "linalg"))
    timed("tail w/ unrolled chol", lambda s: tail(s, "chol"))

    def solve_only(s, solver):
        Hs = H + s * 0
        if solver == "linalg":
            d = jnp.linalg.solve(Hs, rhs[..., None])[..., 0]
        else:
            d = chol_solve6(Hs, rhs)
        return d[:, 0].sum() * 1e-30

    timed("solve only (linalg)", lambda s: solve_only(s, "linalg"))
    timed("solve only (chol)", lambda s: solve_only(s, "chol"))

    def exp_compose(s):
        d = rhs * (1e-3 + s * 0)
        inc = se3.exp(d)
        est = inc @ est0
        return est[:, 0, 0].sum() * 1e-30

    timed("se3.exp + compose only", exp_compose)


if __name__ == "__main__":
    main()
