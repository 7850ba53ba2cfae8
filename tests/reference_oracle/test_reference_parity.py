"""Golden parity vs the ACTUAL reference solver.

The reference (``/root/reference/src``) runs pure-Python through the
numba stub (refbridge.py) on small pyr-downsampled bundled pairs; our
solver runs its reference-semantics config (``raw_sobel_gain``,
``reference_prior_energy``, cold-start unnormalized weighter, all fast
paths off) on the same inputs.  Measured at golden generation
(make_goldens.py, values in goldens.json):

- approx-gradient configs (plain GN, t-weighter IRLS, binding motion
  prior sigma=1e-9): transforms agree to < 3 um / 1.5 urad and the
  per-level iteration counts are IDENTICAL — the stopping semantics
  (tolerance break before applying the increment, divergence counter,
  per-iteration prior re-anchor) are reproduced decision-for-decision.
- exact-gradient config: iteration counts identical, transforms within
  200 um on ~18 mm motions (~1.1%).  The residual gap is the documented
  quirk fix: the reference evaluates the warp Jacobian J_w at the
  UN-transformed points (cpu_robust_dense_visual_odometry.py:168-173
  computes J_w before applying the estimate) while we evaluate it at the
  transformed points the chain rule calls for.

Tests skip when the reference mount is absent; the goldens.json
comparison also runs without it.
"""

from __future__ import annotations

import json
import math

import numpy as np
import pytest

from tests.reference_oracle import make_goldens as mg
from tests.reference_oracle.refbridge import (
    fixed_interpolate_bilinear,
    reference_available,
)

CASES = {
    name: (down, n, cfg, source) for name, down, n, cfg, source in mg.CASES
}
# Trajectory-scale cases get their own accuracy-parity tests below (the
# per-pair decision-equality harness does not apply at 100-frame scale:
# plateau stopping at the tiny 60x80 levels is f32-quantization-limited,
# so a handful of pairs legitimately stop in different basins — the
# trajectory-level claim is ACCURACY parity, asserted explicitly).
TRAJ_CASES = sorted(n for n in CASES if n.startswith("trajectory_scale"))
PAIR_CASES = sorted(set(CASES) - set(TRAJ_CASES))

# (translation m, rotation rad, allowed per-level iteration-count slack)
BOUNDS = {
    "approx_noweight": (3e-5, 1.5e-5, 0),
    "approx_tweight": (3e-5, 1.5e-5, 0),
    "approx_prior": (3e-5, 1.5e-5, 0),
    "approx_divergence_allowed": (3e-5, 1.5e-5, 0),
    # Documented quirk gap (J_w evaluation point); see module docstring.
    "exact_noweight": (1e-3, 5e-4, 0),
    # Rotation-heavy / large-translation regime (round 4): ~2.5 deg +
    # ~25 mm per pair, several px at the coarsest level.  Decisions
    # still match EXACTLY; the transform bound is wider because the
    # solves run 2-3x more iterations, compounding f32-vs-f64 rounding.
    "hard_rotation": (3e-4, 1.5e-4, 0),
    # Exposure-violated brightness constancy (round 4): residuals
    # plateau at err ~ 100 intensity^2, where the reference's ABSOLUTE
    # 1e-6 tolerance is a 1e-8 RELATIVE test — below f32 resolution
    # (the f32 error quantum at err=96 is ~7.6e-6).  Stopping in this
    # regime is therefore quantization-limited by design: one level of
    # one pair stops one iteration apart (measured 19 vs 20), every
    # other decision identical, transforms within 36 um on 9-36 mm
    # motions.  The +-1 slack encodes exactly that.
    "exposure_wobble": (3e-4, 1.5e-4, 1),
}

_OURS_CACHE = {}


def _run_ours(name):
    if name not in _OURS_CACHE:
        down, n_frames, cfg, source = CASES[name]
        _OURS_CACHE[name] = mg.run_ours_case(cfg, down, n_frames, source)
    return _OURS_CACHE[name]


def _assert_close(rows, name):
    d_t, d_r, iter_slack = BOUNDS[name]
    for r in rows:
        assert r["d_trans_m"] < d_t, (name, r)
        assert r["d_rot_rad"] < d_r, (name, r)
        ref_counts = {int(k): v for k, v in r["ref_iters"].items()}
        # Our diagnostics stack coarse-to-fine: index 0 = coarsest.
        levels = sorted(ref_counts, reverse=True)
        got = r["our_iters"]
        want = [ref_counts[lv] for lv in levels]
        assert len(got) == len(want) and all(
            abs(g - w) <= iter_slack for g, w in zip(got, want)
        ), (name, r, want, got)


@pytest.mark.parametrize("name", PAIR_CASES)
def test_matches_committed_goldens(name):
    """Our reference-semantics config reproduces the committed golden
    transforms (generated from the live reference run)."""
    goldens = json.loads(mg.GOLDENS_PATH.read_text())[name]
    ref = {
        "transforms": np.asarray(goldens["transforms"], np.float64),
        "levels": goldens["level_iterations"],
    }
    rows = mg.compare(ref, _run_ours(name))
    _assert_close(rows, name)


@pytest.mark.parametrize("name", PAIR_CASES)
def test_composed_final_pose_matches_goldens(name):
    """Multi-frame check: COMPOSING the per-pair estimates (the
    session's final_pose semantics, base_dense_visual_odometry.py
    pose accumulation) stays within the per-pair bound times the chain
    length — catches any error mode that per-pair comparison hides
    through sign/inverse conventions."""
    import jax.numpy as jnp

    from dense_visual_odometry_tpu.utils.lie import se3

    goldens = json.loads(mg.GOLDENS_PATH.read_text())[name]
    ref_t = np.asarray(goldens["transforms"], np.float64)
    ours_t = _run_ours(name)["transforms"]
    pose_ref = np.eye(4)
    pose_ours = np.eye(4)
    for k in range(ref_t.shape[0]):
        # step() composes pose <- pose @ inv(transform) (transform maps
        # prev-cam points to curr-cam).
        pose_ref = pose_ref @ np.linalg.inv(ref_t[k])
        pose_ours = pose_ours @ np.linalg.inv(ours_t[k])
    xi = np.asarray(
        se3.log(jnp.asarray(np.linalg.inv(pose_ref) @ pose_ours, jnp.float32)),
        np.float64,
    )
    d_t, d_r, _ = BOUNDS[name]
    n = ref_t.shape[0]
    assert float(np.linalg.norm(xi[:3])) < d_t * n, xi
    assert float(np.linalg.norm(xi[3:])) < d_r * n, xi


@pytest.mark.skipif(
    not reference_available(), reason="reference mount not present"
)
@pytest.mark.parametrize("name", PAIR_CASES)
def test_matches_live_reference(name):
    """Run the ACTUAL reference solver and compare transform-for-
    transform, iteration-count-for-iteration-count."""
    down, n_frames, cfg, source = CASES[name]
    ref = mg.run_reference_case(cfg, down, n_frames, source)
    rows = mg.compare(ref, _run_ours(name))
    _assert_close(rows, name)


@pytest.mark.skipif(
    not reference_available(), reason="reference mount not present"
)
def test_live_reference_matches_goldens():
    """Guard the committed goldens against environment drift: the live
    reference reproduces them bitwise (pure Python is deterministic)."""
    goldens = json.loads(mg.GOLDENS_PATH.read_text())
    name = "approx_noweight"
    down, n_frames, cfg, source = CASES[name]
    ref = mg.run_reference_case(cfg, down, n_frames, source)
    stored = np.asarray(goldens[name]["transforms"], np.float64)
    np.testing.assert_array_equal(ref["transforms"], stored)
    assert [
        {int(k): v for k, v in c.items()} for c in ref["levels"]
    ] == [
        {int(k): v for k, v in c.items()}
        for c in goldens[name]["level_iterations"]
    ]


def _compose(ts):
    p = np.eye(4)
    out = [p.copy()]
    for t in ts:
        p = p @ np.linalg.inv(t)
        out.append(p.copy())
    return np.stack(out)


@pytest.mark.parametrize("name", TRAJ_CASES)
def test_trajectory_scale_accuracy_parity(name):
    """TRAJECTORY-scale hardening of the reference-semantics bound
    (round-4 VERDICT task 7): over the committed 100-frame golden run,

    - our composed trajectory tracks the REFERENCE's trajectory several
      times more closely than either tracks ground truth, and
    - our GT-relative ATE equals the reference's within 25%

    — i.e. at the scale the 8.8 mm headline extrapolates to, running our
    solver in reference-semantics mode is accuracy-equivalent to running
    the actual reference.  Measured at generation: per-pair median gap
    0.15/0.16 mm; composed ref-vs-ours RMSE 9.6/7.9 mm vs GT drift
    70.3/55.5 mm (reference) and 65.0/59.6 mm (ours); ATE ratio within
    8%.  Per-pair DECISION equality does not hold at this scale (62/99
    pairs at levels=3; fewer at the committed levels=4 cases): the tiny
    60x80 pyramid levels put IRLS plateau stopping at the f32 quantum,
    where a handful of pairs legitimately stop in different basins —
    which is exactly why the trajectory-level claim is asserted as
    ACCURACY parity, not decision parity.
    """
    goldens = json.loads(mg.GOLDENS_PATH.read_text())[name]
    ref_t = np.asarray(goldens["transforms"], np.float64)
    ours_t = _run_ours(name)["transforms"]
    n = ref_t.shape[0]

    # Per-pair gap distribution (median bound; the max is plateau-flip
    # dominated and asserted only loosely).
    d_ts = []
    for k in range(n):
        rel = np.linalg.inv(ref_t[k]) @ ours_t[k]
        d_ts.append(float(np.linalg.norm(rel[:3, 3])))
    d_ts = np.asarray(d_ts)
    assert np.median(d_ts) < 5e-4, np.median(d_ts)
    assert d_ts.max() < 2e-2, d_ts.max()

    p_ref = _compose(ref_t)
    p_ours = _compose(ours_t)
    gt = mg.traj_world_poses(n + 1)

    def ate(p, q):
        gap = np.linalg.norm(p[:, :3, 3] - q[:, :3, 3], axis=1)
        return float(np.sqrt((gap**2).mean()))

    ate_ref = ate(p_ref, gt)
    ate_ours = ate(p_ours, gt)
    gap_rmse = ate(p_ref, p_ours)
    # Accuracy parity: same GT-drift class as the actual reference.
    assert abs(ate_ours / ate_ref - 1.0) < 0.25, (ate_ours, ate_ref)
    # Our trajectory follows the REFERENCE far more closely than either
    # follows the truth (the solver-equivalence signal).
    assert gap_rmse < 0.35 * ate_ref, (gap_rmse, ate_ref)
    assert gap_rmse < 0.020, gap_rmse


def test_fixed_interp_matches_reference_loop_in_bounds():
    """The vectorized OOB-fixed interpolation is arithmetic-identical to
    a direct transliteration of the reference loop body
    (cpu_robust_dense_visual_odometry.py:226-252) on in-bounds samples,
    and NaN exactly on the OOB ones."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (13, 17), np.uint8)
    h, w = img.shape
    pts = np.stack(
        [
            rng.uniform(-2.0, w + 1.0, 400).astype(np.float32),
            rng.uniform(-2.0, h + 1.0, 400).astype(np.float32),
        ],
        axis=1,
    )
    got = fixed_interpolate_bilinear(img, pts)

    for i in range(pts.shape[0]):
        x, y = pts[i]
        x0 = int(math.floor(x))
        y0 = int(math.floor(y))
        x1 = x0 + 1
        y1 = y0 + 1
        if (x0 < 0) or (y0 < 0) or (x1 >= w) or (y1 >= h):
            assert np.isnan(got[i, 0])
            continue
        w00 = (x1 - x) * (y1 - y)
        w01 = (x1 - x) * (y - y0)
        w10 = (x - x0) * (y1 - y)
        w11 = (x - x0) * (y - y0)
        expected = np.float32(
            (
                w00 * img[y0, x0]
                + w01 * img[y1, x0]
                + w10 * img[y0, x1]
                + w11 * img[y1, x1]
            )
            / ((x1 - x0) * (y1 - y0))
        )
        assert got[i, 0] == expected, (i, got[i, 0], expected)
