"""Typed configuration for the tracking solvers.

The reference passes free-form JSON kwargs through its factory
(``/root/reference/src/test_dvo.py:50-54`` -> ``core/__init__.py:14-40``,
knobs documented at ``base_robust_dvo.py:34-76``).  Here the same knob set
is a frozen dataclass (hashable, so it can be a jit static argument), with
validation and a loader that accepts the reference's JSON schema.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class TWeighterConfig:
    """t-distribution IRLS scale estimation (reference t_weighter.py:11-19)."""

    dof: float = 5.0
    initial_sigma: float = 5.0
    tolerance: float = 1e-3
    max_iterations: int = 50
    # Kerl's sigma^2 fixed point divides by N; the reference omits the 1/N
    # (t_weighter.py:38-47, SURVEY quirk #3).  True = the correct update.
    normalize_scale: bool = True
    # Estimate the scale from every Nth pixel in each direction (the
    # fixed-point loop re-reads the full residual image up to
    # ``max_iterations`` times; the scale is a robust statistic over
    # ~300k pixels, so stride-4 subsampling [16x less traffic] changes it
    # negligibly).  1 = exact (reference behaviour); weights themselves
    # are always computed at full resolution.
    scale_subsample: int = 1
    # Warm-start the fixed point from the previous GN iteration's
    # converged lambda (residuals barely move between iterations, so the
    # loop then needs 1-3 steps).  False = cold-start every evaluation
    # from 1/initial_sigma^2 like the reference (t_weighter.py:21-26) —
    # the converged lambda then lands within ``tolerance`` of the same
    # fixed point along the reference's exact trajectory (oracle tests).
    warm_start: bool = True
    # When set, run exactly N unrolled fixed-point steps instead of the
    # convergence-checked while_loop.  Each on-device loop step costs
    # ~0.5 ms of scheduling overhead regardless of its tiny body; with a
    # warm-started lambda 2-3 unrolled steps reach the same fixed point
    # (validated in benchmarks/RESULTS.md).  None = reference behaviour.
    unroll_iterations: Optional[int] = None

    def __post_init__(self):
        if self.scale_subsample < 1:
            raise ValueError("scale_subsample must be >= 1")
        if self.unroll_iterations is not None and self.unroll_iterations < 1:
            raise ValueError("unroll_iterations must be >= 1 or None")


@dataclasses.dataclass(frozen=True)
class RobustDVOConfig:
    """Coarse-to-fine photometric Gauss-Newton tracking configuration.

    Field names follow the reference's knobs (base_robust_dvo.py:34-76) so
    its JSON config files load unchanged.
    """

    levels: int = 4
    use_weighter: bool = False
    max_increased_steps_allowed: int = 0
    sigma: Optional[float] = None  # motion-prior strength (None = no prior)
    tolerance: float = 1e-6
    max_iterations: int = 100
    # Per-level iteration caps, indexed by pyramid level (0 = finest);
    # None = ``max_iterations`` everywhere.  Motivation is the COARSEST
    # level under warm-started large-baseline solves (SLAM
    # frame-to-keyframe): levels on the level-fused Pallas kernel run
    # iterations in microseconds, but a non-shift-stack level runs the
    # XLA while_loop whose per-iteration device-side scheduling costs
    # ~0.9 ms x ~3 thunks on the serving target — and the coarsest
    # level's output only seeds the next level, so millimeter-grade
    # convergence there is wasted work (measured, benchmarks/RESULTS.md
    # SLAM latency ladder).
    max_iterations_per_level: Optional[Tuple[int, ...]] = None
    # Additional relative stopping rule: |err - err_prev| < rel * err.
    # The reference's absolute tolerance (1e-6 on errors of O(100))
    # effectively runs GN until float noise; a relative rule stops when
    # progress per iteration drops below ``relative_tolerance`` of the
    # current error.  None disables (reference behaviour).
    relative_tolerance: Optional[float] = None
    approximate_image2_gradient: bool = False
    max_distance: float = 5.0
    weighter: TWeighterConfig = dataclasses.field(default_factory=TWeighterConfig)
    # Intensities quantized to integers like the reference's uint8 gray
    # (base_dense_visual_odometry.py:58); False keeps full float precision.
    quantize_intensity: bool = False
    # Seed each solve with the last accepted frame-to-frame transform
    # (constant-velocity model) instead of identity.  The reference always
    # starts from identity unless a caller passes init_guess
    # (base_dense_visual_odometry.py:54); a warm start typically halves GN
    # iterations on smooth trajectories.
    constant_velocity_init: bool = False
    # TPU gather optimization: pack image/gradient taps as f16 pairs so
    # each bilinear sample costs 2 gathers instead of 4 and gradient
    # sampling costs 1 instead of 8 (nearest-neighbour — gradients are
    # smooth).  Gathers dominate TPU runtime (cost per index); f16 taps
    # are exact for 8-bit intensities.  Bit-identical OFF by default.
    packed_sampling: bool = False
    # Evaluate residuals on every Nth pixel of the finest level's grid
    # (classic dense-VO decimation: 6 DoF need nowhere near 300k
    # residuals; gather cost drops quadratically).  1 = full resolution.
    finest_stride: int = 1
    # Per-level grid strides, indexed by pyramid level (0 = finest);
    # overrides finest_stride when set.  Must have length == levels.
    grid_strides: Optional[Tuple[int, ...]] = None
    # Gather-free warping at the finest level(s): bilinear sampling via a
    # shift stack of radius r (cost (2r+1)^2 vector passes instead of
    # 2*H*W gather indices).  Valid only while the warp displacement at
    # that level stays within r full-res pixels — pixels outside are
    # masked invalid, so large motions gracefully fall back to the coarse
    # levels' solution.  None disables.  Applied at levels listed in
    # ``shift_stack_levels``.
    shift_stack_radius: Optional[int] = None
    shift_stack_levels: Tuple[int, ...] = (0,)
    # Run the shift-stack accumulation as the fused Pallas kernel
    # (ops/pallas/stackwarp.py) instead of XLA slice passes: ~10% faster
    # steady-state and ~50x faster to compile (the 81-slice XLA fusion
    # takes minutes; the kernel seconds).  Requires grid_stride in {1, 2}
    # at the shift-stack levels.
    use_pallas_stack: bool = False
    # Graceful fast-path fallback (hard-motion safety): at every
    # shift-stack evaluation, measure the fraction of valid pixels the
    # recentered shift ball would keep; if any batch element falls below
    # ``shift_fallback_min_coverage`` (rotation-heavy or beyond-bound
    # motion), the evaluation switches to the gather-based packed warp
    # for the WHOLE batch (lax.cond — one scalar predicate).  Small-warp
    # batches keep full shift-stack speed; large motion degrades to the
    # always-correct path instead of silently masking pixels away.
    shift_stack_fallback: bool = False
    shift_fallback_min_coverage: float = 0.8
    # Second fallback trigger (approximate-Jacobian validity): the
    # precomputed Jacobian samples grad I1 at UNWARPED coordinates, so its
    # error grows with the total warp magnitude — which recentered
    # coverage cannot see (a pure translation recenters to full
    # coverage).  When the RMS warp displacement at a level exceeds this
    # many of that level's pixels, evaluations switch to exact
    # current-image gradients.
    fallback_max_displacement: float = 3.0
    # Third fallback trigger (rotation): a precomputed Jacobian's gradient
    # DIRECTIONS are those of the template — a rotation of the content
    # rotates the true gradients with it, so the IC Jacobian stays biased
    # even at the converged solution.  Neither the coverage nor the
    # displacement trigger can see it (a warm-started rotation has
    # near-zero residual displacement).  When the level-start estimate's
    # rotation angle exceeds this (radians), evaluations switch to exact
    # current-image gradients.  Applies at every level using the
    # approximate Jacobian.  NOTE: like every estimate-based trigger, this
    # only fires once the estimate CARRIES the rotation (warm starts);
    # the cold-start case is covered by ``retrack_max_scale``.
    fallback_max_rotation: float = 0.03
    # Scale-gated retrack (hard-motion bootstrap): every estimate-based
    # fallback trigger reads zero at an uninformed (identity) init — the
    # biased fast path then "converges" instantly and the mistrack
    # silently poisons every later warm start.  The converged IRLS
    # residual scale is the estimate-independent tell (measured, shipped
    # config: every well-tracked frame ends with finest-level sigma <= 5
    # intensity units across real + synthetic sets; every mistracked one
    # >= 21 — benchmarks/RESULTS.md).  After the coarse-to-fine cascade,
    # any batch element whose finest-level sigma exceeds this threshold is
    # re-solved from its initial estimate with the robust fallback path
    # forced at every level (exact gradients, gather warp, tightened
    # tolerance); one scalar lax.cond keeps clean batches at full speed.
    # None disables.  Requires use_weighter and shift_stack_fallback.
    retrack_max_scale: Optional[float] = None
    # When the hard-motion trigger fires at a level's starting estimate,
    # the relative stopping tolerance is multiplied by this factor for
    # that (batch element, level): easy frames keep the aggressive early
    # stop, hard frames iterate further (measured on the rotation-heavy
    # stress case: ATE 31.6 -> ~9 mm at unchanged easy-set iteration
    # counts).
    fallback_tolerance_scale: float = 0.1
    # Robust warm-start selection: before the coarse-to-fine cascade,
    # evaluate the photometric error of the provided init guess vs
    # identity at the coarsest level and start from whichever is better
    # (per batch element).  Protects constant-velocity warm starts against
    # direction reversals, where extrapolating the last motion lands
    # OUTSIDE the convergence basin that identity is still inside.
    robust_init_selection: bool = False
    # Multi-hypothesis warm start (generalizes ``robust_init_selection``
    # from the {identity, guess} pair to a LADDER of hypotheses along the
    # constant-velocity direction): score exp(a * log(init_guess)) for
    # each scale ``a`` at the coarsest level and start the cascade from
    # the per-batch-element argmin.  A ladder like (0, 0.5, 1, 1.5)
    # covers stop / deceleration / constant velocity / acceleration; each
    # extra hypothesis costs one quarter-resolution coarse warp (~2k
    # packed gathers), negligible next to a single LM iteration.  0.0
    # (identity) and 1.0 (the guess) are always scored even if absent
    # from the tuple.  Requires ``robust_init_selection``; None keeps the
    # plain two-candidate selector.
    init_scale_ladder: Optional[Tuple[float, ...]] = None
    # Fully-fused Pallas GN iteration at the shift-stack levels
    # (ops/pallas/fused_iter.py): tap accumulation, residual, t-IRLS scale
    # fixed point, weights and the H/b/err/count reduction in ONE kernel —
    # one HBM pass per iteration, 45 scalars out.  Requires
    # ``approximate_image2_gradient`` (precomputed Jacobian) and ignores
    # ``weighter.scale_subsample`` (the in-VMEM scale uses every valid
    # pixel); the scale runs ``weighter.unroll_iterations`` (default 3)
    # unrolled steps.  Levels outside ``shift_stack_levels`` use the
    # regular paths; the motion prior and depth residuals are added
    # XLA-side around the kernel's photometric reduction (and ride
    # fully in-kernel on the ``use_level_kernel`` path).
    use_fused_iteration: bool = False
    # Freeze the recentered shift window at each LEVEL's starting
    # estimate (fused path only).  Per-evaluation recentering re-extracts
    # the (H+2r, W+2r) window (pad + dynamic-slice + parity split — three
    # full-image HBM passes) even though the integer center moves
    # subpixel within a level; freezing extracts once per level and each
    # iteration pays only the displacement math.  Pixels drifting past
    # the frozen ball's edge are masked invalid exactly like any
    # out-of-ball pixel, and the coverage fallback trigger still guards
    # hard motion at level start.
    freeze_shift_window: bool = False
    # Levenberg-Marquardt trust-region mode (north-star "Gauss-Newton/
    # Levenberg-Marquardt").  None = plain Gauss-Newton with the
    # reference's exact stopping semantics.  A value enables LM:
    # - solve (H + lambda*diag(H)) delta = b with adaptive lambda
    #   (x lm_up on a rejected trial, x lm_down on an accepted one);
    # - rejected trials ROLL BACK (the reference/GN loop keeps a bad
    #   increment applied) and re-solve the carried 6x6 system at higher
    #   damping without re-evaluating residuals' Jacobian;
    # - predictive stopping: converge when the predicted error reduction
    #   0.5*delta^T b (in mean units) drops below ``tolerance`` or
    #   ``relative_tolerance * err`` — saving the trailing
    #   "confirm convergence" evaluation every level pays under GN.
    lm_lambda0: Optional[float] = None
    lm_up: float = 4.0
    lm_down: float = 0.5
    lm_lambda_max: float = 1e5
    # Level-fused solver: run the ENTIRE per-level LM loop inside one
    # Pallas kernel (ops/pallas/level_solver.py) — warp geometry, tent
    # taps, t-IRLS, H/b reduction, damped 6x6 Cholesky, SE(3) update and
    # stopping all on-chip; the frozen window/Jacobian stream from HBM
    # once per LEVEL instead of once per iteration, and the sequential
    # per-iteration dispatch cost (measured ~3 thunks x ~0.9 ms on the
    # target transport, benchmarks/RESULTS.md) collapses to one kernel
    # launch per level.  Applies at fused levels when ``lm_lambda0``,
    # ``use_fused_iteration`` and ``freeze_shift_window`` are set; the
    # motion prior, exposure-bias illumination AND the geometric depth
    # term all ride the kernel (the depth term taps a second frozen
    # window over the current depth map).  Other levels, the "affine"
    # illumination mode and the hard-motion fallback branch keep the
    # XLA loop.
    use_level_kernel: bool = False
    # Per-row-block recentering (level-kernel path only): split the grid
    # rows into this many blocks and give each its OWN integer window
    # center, so the shift ball only covers the within-block displacement
    # spread — rotation/parallax-induced row-dependent displacement stops
    # forcing a large radius.  Every per-pixel tensor moves to a slab
    # layout whose halo rows keep the kernel's uniform vertical rolls
    # from crossing into a neighbor's window (block_layout,
    # ops/pallas/stackwarp.py).  None/1 = single global center.
    recenter_blocks: Optional[int] = None
    # Per-TILE recentering (level-kernel path only): additionally split
    # the grid COLUMNS into this many blocks, giving each
    # (row-block, col-block) TILE its own integer window center.  A
    # rotation's displacement field varies in BOTH axes; row blocks
    # absorb only the vertical component, tiles absorb the local mean in
    # full — over a 32-px tile a keyframe-class rotation's residual
    # spread is ~theta*32 px, inside a radius-3 ball, which keeps SLAM
    # frame-to-keyframe solves on the level-fused kernel instead of the
    # gather fallback (the measured SLAM latency floor, round-4
    # attribution in benchmarks/RESULTS.md).  Per-pixel tensors move to
    # a 2-D tile mosaic with halo rows AND columns
    # (ops/pallas/stackwarp.tile_layout).  Requires ``recenter_blocks``
    # (the row-block count).  None/1 = row blocks or global center.
    recenter_col_blocks: Optional[int] = None
    # Tile recentering clip bound in pixels (None = 4x the larger tap
    # radius, the odometry default).  Keyframe-class baselines measure
    # >12 px of displacement, which saturates the default clip and
    # silently drops pixels; the SLAM regime wants ~2x the expected
    # baseline displacement (extraction padding is the only cost).
    recenter_center_bound: Optional[int] = None
    # Anisotropic shift ball (block path only): vertical tap radius,
    # defaulting to ``shift_stack_radius``.  With per-block VERTICAL
    # recentering the row-structured displacement component (rotation,
    # forward motion) is absorbed by the block centers, so the vertical
    # radius can shrink below the horizontal one — (2*ry+1)*(2*rx+1)
    # taps, e.g. 35 instead of 49 at ry=2, rx=3.  The depth-parallax
    # spread is mostly horizontal (translation flow ~ fx*t/Z), which is
    # why the HORIZONTAL radius keeps the full size.  The per-block
    # coverage trigger judges the anisotropic ball, so scenes violating
    # the assumption fall back rather than silently losing pixels.
    shift_stack_radius_y: Optional[int] = None
    # ESM-style gradients (Benhimane & Malis): the precomputed Jacobian
    # uses 0.5 * (grad I1(x) + grad I2(w0(x))) instead of grad I1 alone,
    # where w0 is each LEVEL's starting warp.  The averaged gradient is
    # second-order accurate at the solution, cutting iterations where the
    # pure inverse-compositional approximation converges only linearly.
    # Cost model (why this stays on the fast path): the Jacobian remains
    # level-start-constant, so per-iteration cost is unchanged; at
    # fused+frozen-window levels the warped image falls out of the
    # already-extracted window planes via one extra gather-free tap sweep,
    # and elsewhere grad I2 is one packed nearest-gather pass per level.
    # Requires ``approximate_image2_gradient``; with
    # ``use_fused_iteration`` also requires ``freeze_shift_window``.
    # MEASURED (benchmarks/RESULTS.md): a win only at levels whose
    # starting estimate is already near the solution — at coarse levels
    # the averaged gradient mixes in wrong-position samples and costs
    # iterations; restrict with ``esm_levels``.
    use_esm_gradients: bool = False
    # Pyramid levels at which ESM averaging applies (None = all levels).
    # Fine levels inherit a converged coarse estimate, where the
    # level-start warped gradient is accurate; coarse levels start far
    # out, where it is not.
    esm_levels: Optional[Tuple[int, ...]] = None
    # Rotation-trigger threshold override at ESM levels.  The rotation
    # fallback exists because a TEMPLATE-gradient Jacobian stays biased
    # under content rotation; ESM's Jacobian is (half) evaluated at the
    # level-start WARP, so for warm-started solves carrying a large
    # total rotation with small REMAINING motion (the SLAM
    # frame-to-keyframe regime) the total-rotation magnitude wildly
    # overstates the bias — firing the trigger pushes every keyframe
    # solve off the level-fused kernel onto the per-iteration gather
    # path (measured: that fallback IS the SLAM 161-vs-71 ms gap,
    # benchmarks/RESULTS.md).  None keeps ``fallback_max_rotation``.
    esm_fallback_max_rotation: Optional[float] = None
    # Beyond-reference: add geometric (depth) residuals to the photometric
    # objective: cost = sum w r_I^2 + depth_weight * sum huber(r_z)^2 with
    # r_z in meters.  Makes motion observable in low-texture scenes; the
    # default weight is tuned so well-textured sequences keep photometric
    # accuracy (benchmarks/RESULTS.md).
    use_depth_residuals: bool = False
    depth_weight: float = 1.0e4
    # Huber threshold (meters) for the depth residuals — depth maps have
    # gross outliers at discontinuities/occlusions that would otherwise
    # dominate the quadratic depth cost.
    depth_huber_delta: float = 0.03
    # Beyond-reference: photometric illumination compensation.  Real
    # cameras auto-expose, so brightness constancy breaks by a per-frame
    # gain/bias; the residual model gains nuisance unknowns that are
    # eliminated EXACTLY per iteration via a Schur complement on the
    # normal equations (no extra solve dimensions leave the reduction).
    #   None     - plain brightness constancy (the reference's model);
    #   "bias"   - r_i + c: one intensity offset per pair/level (handles
    #              exposure-bias wander; ~3 extra reduced scalars);
    #   "affine" - r_i + a*I1_i + c: gain AND offset (handles
    #              auto-exposure gain wander; ~8 extra reduced scalars).
    # "bias" rides the fused/level Pallas kernels (in-kernel centering
    # + reduced scalars, rank-1 Schur); "affine" falls back to the XLA
    # iteration path.
    illumination: Optional[str] = None
    # Reference-parity quirk modes (for the golden-oracle tests,
    # tests/reference_oracle/): feed RAW ksize-3 Sobel values (gain 8)
    # into the Jacobian like the reference (jacobian.py:70-71 feeds
    # cv2.Sobel output unscaled), instead of true intensity derivatives.
    # Raw gradients shrink every GN step ~8x — correctness-neutral at
    # convergence, but it changes the iteration trajectory, so exact
    # step-for-step parity needs the quirk reproduced.
    raw_sobel_gain: bool = False
    # Reference-parity quirk #5 (base_robust_dvo.py:194): add the
    # reference's (dimensionally inconsistent) motion-prior energy term
    # ``0.5 * sigma * ||log(old)||`` to the scalar error instead of the
    # consistent ``0.5 * (1/sigma) * ||log(old)||^2``.  Only the stopping
    # decisions see this scalar; H/b use 1/sigma either way.
    reference_prior_energy: bool = False

    def stride_for_level(self, level: int) -> int:
        if self.grid_strides is not None:
            return self.grid_strides[level]
        return self.finest_stride if level == 0 else 1

    def max_iterations_for_level(self, level: int) -> int:
        if self.max_iterations_per_level is not None:
            return self.max_iterations_per_level[level]
        return self.max_iterations

    def __post_init__(self):
        if self.levels < 1:
            raise ValueError(f"levels must be >= 1, got {self.levels}")
        if self.max_iterations < 1:
            raise ValueError("max_iterations must be >= 1")
        if self.max_iterations_per_level is not None:
            object.__setattr__(
                self, "max_iterations_per_level",
                tuple(int(n) for n in self.max_iterations_per_level),
            )
            if len(self.max_iterations_per_level) != self.levels:
                raise ValueError(
                    "max_iterations_per_level length must equal levels"
                )
            if any(n < 1 for n in self.max_iterations_per_level):
                raise ValueError(
                    "max_iterations_per_level entries must be >= 1"
                )
        if self.sigma is not None and self.sigma <= 0:
            raise ValueError("sigma must be positive or None")
        if self.finest_stride < 1:
            raise ValueError("finest_stride must be >= 1")
        if self.lm_lambda0 is not None and self.lm_lambda0 <= 0:
            raise ValueError("lm_lambda0 must be positive or None")
        if self.lm_up <= 1.0 or not (0.0 < self.lm_down < 1.0):
            raise ValueError("need lm_up > 1 and 0 < lm_down < 1")
        if self.illumination not in (None, "bias", "affine"):
            raise ValueError("illumination must be None, 'bias' or 'affine'")
        if self.recenter_blocks is not None:
            if self.recenter_blocks < 1:
                raise ValueError("recenter_blocks must be >= 1 or None")
            if self.recenter_blocks > 1:
                if not self.use_level_kernel:
                    raise ValueError(
                        "recenter_blocks > 1 requires use_level_kernel "
                        "(per-block centers are a level-solver feature)"
                    )
                if self.use_esm_gradients:
                    raise ValueError(
                        "recenter_blocks is incompatible with "
                        "use_esm_gradients (the ESM warped image assumes "
                        "a single frozen window center)"
                    )
        if self.recenter_col_blocks is not None:
            if self.recenter_col_blocks < 1:
                raise ValueError(
                    "recenter_col_blocks must be >= 1 or None"
                )
            if self.recenter_col_blocks > 1:
                if self.recenter_blocks is None:
                    raise ValueError(
                        "recenter_col_blocks requires recenter_blocks "
                        "(the row-block count of the tile grid; 1 is "
                        "a valid row count)"
                    )
                if not self.use_level_kernel:
                    raise ValueError(
                        "recenter_col_blocks > 1 requires "
                        "use_level_kernel (per-tile centers are a "
                        "level-solver feature)"
                    )
                if self.use_esm_gradients:
                    raise ValueError(
                        "recenter_col_blocks is incompatible with "
                        "use_esm_gradients (the ESM warped image "
                        "assumes a single frozen window center)"
                    )
        if self.recenter_center_bound is not None:
            if self.recenter_col_blocks is None or self.recenter_col_blocks < 2:
                raise ValueError(
                    "recenter_center_bound requires recenter_col_blocks "
                    "> 1 (it parameterizes the tile path)"
                )
            if self.recenter_center_bound < 1:
                raise ValueError("recenter_center_bound must be >= 1")
        if self.shift_stack_radius_y is not None:
            if self.recenter_blocks is None or self.recenter_blocks < 2:
                raise ValueError(
                    "shift_stack_radius_y requires recenter_blocks > 1 "
                    "(the anisotropic ball is a block-path feature)"
                )
            if self.shift_stack_radius_y < 1:
                raise ValueError("shift_stack_radius_y must be >= 1")
            if (
                self.shift_stack_radius is not None
                and self.shift_stack_radius_y > self.shift_stack_radius
            ):
                raise ValueError(
                    "shift_stack_radius_y must not exceed "
                    "shift_stack_radius (vertical recentering shrinks "
                    "the vertical radius, never grows it)"
                )
        if self.init_scale_ladder is not None:
            object.__setattr__(
                self, "init_scale_ladder", tuple(self.init_scale_ladder)
            )
            if not self.robust_init_selection:
                raise ValueError(
                    "init_scale_ladder requires robust_init_selection "
                    "(the ladder extends the warm-start selector)"
                )
        if self.use_esm_gradients:
            if not self.approximate_image2_gradient:
                raise ValueError(
                    "use_esm_gradients requires approximate_image2_gradient "
                    "(ESM averages the precomputed template gradient with "
                    "the level-start warped gradient)"
                )
            if self.use_fused_iteration and not self.freeze_shift_window:
                raise ValueError(
                    "use_esm_gradients with use_fused_iteration requires "
                    "freeze_shift_window (the warped image is derived from "
                    "the frozen window planes)"
                )
        if self.grid_strides is not None:
            # JSON gives a list; coerce so the config stays hashable.
            object.__setattr__(self, "grid_strides", tuple(self.grid_strides))
            if len(self.grid_strides) != self.levels:
                raise ValueError("grid_strides length must equal levels")
            if any(s < 1 for s in self.grid_strides):
                raise ValueError("grid_strides entries must be >= 1")
        object.__setattr__(
            self, "shift_stack_levels", tuple(self.shift_stack_levels)
        )
        if self.esm_levels is not None:
            object.__setattr__(self, "esm_levels", tuple(self.esm_levels))

    @classmethod
    def from_dict(cls, data: dict) -> "RobustDVOConfig":
        """Build from a reference-style JSON config dict.

        Ignores the reference's backend-selection keys (``use_gpu``,
        ``height``, ``width`` — gpu_…py:16-20): there is one backend here
        and no preallocation.
        """
        data = dict(data)
        for ignored in ("use_gpu", "height", "width", "method"):
            data.pop(ignored, None)
        # Weighter hyper-params (hard-coded in the reference's ctor) come in
        # as a nested dict here; top-level max_iterations/tolerance belong
        # to the solver, matching the reference JSON schema.
        wdata = data.pop("weighter", None)
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(data) - known
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        if wdata is not None:
            data["weighter"] = (
                wdata if isinstance(wdata, TWeighterConfig) else TWeighterConfig(**wdata)
            )
        return cls(**data)

    @classmethod
    def from_json(cls, path) -> "RobustDVOConfig":
        with Path(path).open("r") as fp:
            return cls.from_dict(json.load(fp))
