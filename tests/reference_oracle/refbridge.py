"""Run the ACTUAL reference solver as a golden parity oracle.

The reference's CPU backend is NumPy + Numba ``@njit``.  Numba is absent
in this environment, but ``njit``/``prange`` are semantically plain
Python/``range`` — so installing a stub ``numba`` module lets the real
reference code (``/root/reference/src``, read-only) execute pure-Python
on small inputs and produce golden transforms that our TPU solver's
reference-semantics config must reproduce.

Documented deviations from a verbatim run (each quantified by the
parity tests):

1. ``RobustDVOCPU.interpolate_bilinear`` is replaced by a vectorized
   version with CORRECT out-of-bounds handling.  The reference CPU loop
   writes NaN then keeps indexing (cpu_robust_dense_visual_odometry.py:
   240-252): under compiled Numba negative indices wrap and positive
   overflow reads out-of-bounds memory (garbage, nondeterministic);
   under pure Python positive overflow raises IndexError.  A verbatim
   pure-Python run is therefore impossible AND would not reproduce the
   compiled behaviour either.  The replacement implements the intended
   semantics — the ones the reference's own CUDA device function has
   (cuda/residuals_kernel.py:29-31): OOB -> NaN, nothing else.  On
   in-bounds pixels it is arithmetic-identical to the reference loop
   (same f32 weight expressions, same accumulation order); a unit test
   in test_reference_parity.py checks bitwise equality against a direct
   transliteration of the loop body on in-bounds samples.
2. ``np.bool8 = np.bool_`` shim: the reference's type annotations are
   evaluated at definition time and numpy 2.0 removed the alias.
3. Numba ``fastmath=True`` reassociation is obviously not reproduced —
   pure Python evaluates the written expression order.  The compiled
   reference would differ from this oracle by f32 reassociation noise,
   which is far below the parity bounds asserted.
"""

from __future__ import annotations

import sys
import types
from typing import Dict, List, Optional, Tuple

import numpy as np

REFERENCE_SRC = "/root/reference/src"


def reference_available() -> bool:
    import os

    return os.path.isdir(REFERENCE_SRC)


def install_numba_stub() -> None:
    """Register a stub ``numba`` module: jit decorators -> identity,
    ``prange`` -> ``range``.  Covers every numba symbol the reference
    touches at import time (njit/jit signatures + kwargs, numba.cuda.jit
    incl. ``device=True``)."""
    existing = sys.modules.get("numba")
    if existing is not None:
        if getattr(existing, "__dvo_oracle_stub__", False):
            return
        raise RuntimeError("a real numba module is already imported")

    def _identity_jit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]

        def deco(fn):
            return fn

        return deco

    def _no_cuda(*_a, **_k):
        raise RuntimeError("numba stub: no CUDA runtime (CPU oracle only)")

    numba = types.ModuleType("numba")
    numba.__dvo_oracle_stub__ = True
    numba.njit = _identity_jit
    numba.jit = _identity_jit
    numba.prange = range

    cuda = types.ModuleType("numba.cuda")
    cuda.jit = _identity_jit
    cuda.grid = _no_cuda
    cuda.managed_array = _no_cuda
    cuda.synchronize = _no_cuda
    cuda.is_available = lambda: False
    numba.cuda = cuda

    sys.modules["numba"] = numba
    sys.modules["numba.cuda"] = cuda


def fixed_interpolate_bilinear(
    image: np.ndarray, pixels_coordinates: np.ndarray
) -> np.ndarray:
    """Reference bilinear sampling with the intended OOB semantics.

    In-bounds arithmetic matches cpu_robust_dense_visual_odometry.py:
    226-252 expression-for-expression in f32 (weights (x1-x)(y1-y) etc.,
    accumulation order w00*I00 + w01*I10 + w10*I01 + w11*I11; the /1
    denominator is exact and omitted); OOB returns NaN like the CUDA
    device function (cuda/residuals_kernel.py:29-31) instead of indexing
    past the array."""
    h, w = image.shape
    xy = np.asarray(pixels_coordinates, np.float32)
    x = xy[:, 0]
    y = xy[:, 1]
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    valid = (x0 >= 0) & (y0 >= 0) & (x0 + 1 <= w - 1) & (y0 + 1 <= h - 1)
    x0c = np.clip(x0, 0, w - 2)
    y0c = np.clip(y0, 0, h - 2)
    x0f = x0c.astype(np.float32)
    y0f = y0c.astype(np.float32)
    x1f = x0f + np.float32(1.0)
    y1f = y0f + np.float32(1.0)
    w00 = (x1f - x) * (y1f - y)
    w01 = (x1f - x) * (y - y0f)
    w10 = (x - x0f) * (y1f - y)
    w11 = (x - x0f) * (y - y0f)
    img = image.astype(np.float32, copy=False)
    vals = (
        w00 * img[y0c, x0c]
        + w01 * img[y0c + 1, x0c]
        + w10 * img[y0c, x0c + 1]
        + w11 * img[y0c + 1, x0c + 1]
    )
    vals = np.where(valid, vals, np.float32(np.nan))
    return vals.reshape(-1, 1).astype(np.float32)


_REF_CACHE: Optional[types.SimpleNamespace] = None


def load_reference() -> types.SimpleNamespace:
    """Import the reference package (with stub + shims) and patch the
    interpolation fix in.  Idempotent."""
    global _REF_CACHE
    if _REF_CACHE is not None:
        return _REF_CACHE
    install_numba_stub()
    if not hasattr(np, "bool8"):  # numpy 2.0 removed the alias
        np.bool8 = np.bool_
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)

    from dense_visual_odometry.camera_model import RGBDCameraModel
    from dense_visual_odometry.core.robust_dense_visual_odometry import (
        cpu_robust_dense_visual_odometry as cpu_mod,
    )
    from dense_visual_odometry.utils.lie_algebra import Se3

    cpu_mod.RobustDVOCPU.interpolate_bilinear = staticmethod(
        fixed_interpolate_bilinear
    )
    _REF_CACHE = types.SimpleNamespace(
        RGBDCameraModel=RGBDCameraModel,
        RobustDVOCPU=cpu_mod.RobustDVOCPU,
        Se3=Se3,
        cpu_mod=cpu_mod,
    )
    return _REF_CACHE


def make_reference_dvo(K: np.ndarray, depth_scale: float, cfg: Dict):
    """Construct the reference CPU solver for a 3x3 intrinsics matrix."""
    mods = load_reference()
    cam = mods.RGBDCameraModel(np.asarray(K, np.float32), float(depth_scale))
    return mods.RobustDVOCPU(
        camera_model=cam, initial_pose=mods.Se3.identity(), **cfg
    )


def run_reference_sequence(
    frames: List[Tuple[np.ndarray, np.ndarray]],
    K: np.ndarray,
    depth_scale: float,
    cfg: Dict,
) -> Dict:
    """Feed gray/depth frames through the reference's ``step`` and record
    per-pair golden values.

    frames : list of (gray uint8 (H,W), depth uint16 (H,W)).
    Returns {"transforms": (N-1,4,4) f64 pair estimates, "levels": per
    pair {level: iteration count}, "trace": per pair list of
    (level, xi6) evaluation-time estimates}.
    """
    import cv2

    dvo = make_reference_dvo(K, depth_scale, cfg)

    trace: List[List[Tuple[int, np.ndarray]]] = []
    orig = dvo.compute_residuals_and_jacobian

    def wrapped(estimate, level=0):
        trace[-1].append(
            (int(level), np.asarray(estimate.log(), np.float64).ravel().copy())
        )
        return orig(estimate=estimate, level=level)

    dvo.compute_residuals_and_jacobian = wrapped

    transforms = []
    iter_counts = []
    for idx, (gray, depth) in enumerate(frames):
        bgr = np.repeat(np.asarray(gray, np.uint8)[..., None], 3, axis=2)
        # Replicated-channel BGR->gray must reproduce the gray plane
        # exactly, otherwise the oracle inputs drift from ours.
        assert (cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY) == gray).all()
        trace.append([])
        t = dvo.step(bgr, np.asarray(depth, np.uint16).copy())
        if idx > 0:
            transforms.append(np.asarray(t.exp(), np.float64))
            counts: Dict[int, int] = {}
            for lvl, _ in trace[-1]:
                counts[lvl] = counts.get(lvl, 0) + 1
            iter_counts.append(counts)
    return {
        "transforms": np.stack(transforms),
        "levels": iter_counts,
        "trace": trace[1:],
        "final_pose": np.asarray(dvo.current_pose.exp(), np.float64),
    }
