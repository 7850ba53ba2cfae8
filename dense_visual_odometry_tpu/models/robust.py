"""Robust dense visual odometry: coarse-to-fine photometric Gauss-Newton.

TPU-native redesign of the reference solver
(``/root/reference/src/dense_visual_odometry/core/robust_dense_visual_odometry/base_robust_dvo.py:137-236``):
the host-side double loop (levels x GN iterations with numpy/scipy per
iteration) becomes **one jitted program per frame pair**: pyramids are
static tuples unrolled at trace time, each level's GN iteration runs as a
``lax.while_loop`` whose carry holds the estimate, the motion-prior anchor
and the full stopping state (tolerance break, divergence counter
``max_increased_steps_allowed``, best-estimate semantics), and every
residual pass reduces to the 6x6 normal equations on-device — nothing
pixel-sized ever reaches the host.

Stopping semantics match the reference exactly (base_robust_dvo.py:203-232):

- the increment is only applied when the error *decreased* and the loop has
  not converged, so the returned estimate is always the best one seen;
- ``|err - err_prev| < tolerance``  => stop without applying the increment;
- error increases bump a counter; ``counter > max_increased_steps_allowed``
  => stop (the estimate keeps its last accepted value).

Deliberate deviations from reference *bugs* (SURVEY §5 quirks — behaviour
on valid inputs is matched, the bugs are not):

- Sobel gradients are normalized by 1/8 (true intensity derivatives).  The
  reference feeds raw ksize-3 Sobel values (gain 8) into J, silently
  shrinking every GN step by 8x (jacobian.py:47-73).
- The motion-prior energy term uses the consistent
  ``0.5 * (1/sigma) * ||log(old)||^2`` instead of the reference's
  ``0.5 * sigma * ||log(old)||`` (quirk #5, base_robust_dvo.py:195).
- The t-weighter sigma^2 fixed point is 1/N-normalized by default
  (quirk #3); ``TWeighterConfig(normalize_scale=False)`` restores the
  reference update.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dense_visual_odometry_tpu.camera import CameraModel
from dense_visual_odometry_tpu.config import RobustDVOConfig
from dense_visual_odometry_tpu.models.weighting import (
    huber_weights,
    t_distribution_weights_with_scale,
)
from dense_visual_odometry_tpu.ops import gradients as grad_ops
from dense_visual_odometry_tpu.ops import interp as interp_ops
from dense_visual_odometry_tpu.ops import pyramid as pyr_ops
from dense_visual_odometry_tpu.ops.residuals import (
    approximate_jacobian,
    approximate_jacobian_planes,
    depth_residuals,
    normal_equations,
    warp_residuals,
    warp_residuals_packed,
    warp_residuals_shift,
)
from dense_visual_odometry_tpu.utils.lie import se3

# Raw ksize-3 Sobel has gain 8 per unit pixel step ([1,2,1] smoothing x
# [-1,0,1] central difference); divide it out to get d(intensity)/d(pixel).
_SOBEL_GAIN = 8.0


def _prior_energy(
    cfg: RobustDVOConfig, inv_cov: jnp.ndarray, log_old: jnp.ndarray
) -> jnp.ndarray:
    """Motion-prior contribution to the scalar error (stopping decisions).

    Consistent form ``0.5 * (1/sigma) * ||log(old)||^2`` by default; with
    ``cfg.reference_prior_energy`` the reference's quirk #5 term
    ``0.5 * sigma * ||log(old)||`` (base_robust_dvo.py:194) so the oracle
    tests can match its stopping trajectory exactly.
    """
    sq = jnp.sum(log_old * log_old, axis=-1)
    if cfg.reference_prior_energy:
        return 0.5 * jnp.float32(cfg.sigma) * jnp.sqrt(sq)
    return 0.5 * inv_cov * sq


class FrameData(NamedTuple):
    """Preprocessed per-frame state: gray + metric-depth pyramids.

    ``gray[l]`` / ``depth_m[l]`` is pyramid level ``l`` (level 0 = full
    resolution); tuples have static length so jit unrolls over levels.
    Depth is meters with 0 marking invalid pixels (the reference keeps raw
    DN pyramids and scales at deprojection — median-filter + decimate
    commute with the positive scale, so filtering in meters is identical).
    """

    gray: Tuple[jnp.ndarray, ...]
    depth_m: Tuple[jnp.ndarray, ...]


class LevelDiagnostics(NamedTuple):
    iterations: jnp.ndarray  # i32: GN iterations executed at this level
    error: jnp.ndarray  # f32: final mean weighted squared residual
    count: jnp.ndarray  # f32: valid-pixel count at the last iteration
    # f32: converged IRLS residual scale sigma (intensity units) from the
    # t-distribution weighter's fixed point — the alignment-quality signal
    # (a well-aligned pair ends near sensor noise; a mistracked one stays
    # high).  With use_weighter=False this is the initial sigma, untouched.
    scale: jnp.ndarray


class TrackResult(NamedTuple):
    """Output of one frame-to-frame alignment.

    ``transform`` maps camera_{t-1} points into camera_t (the reference's
    ``estimate``, base_dense_visual_odometry.py:72-79: the new world pose
    is ``pose_{t-1} @ transform^-1``).
    """

    transform: jnp.ndarray  # (4, 4)
    success: jnp.ndarray  # bool: finite estimate with enough valid pixels
    diagnostics: LevelDiagnostics  # stacked coarse-to-fine, length = levels
    hessian: jnp.ndarray  # (6, 6) finest-level photometric J^T W J at the
    # solution: the Laplace information of the estimate (pose-graph weight)


def preprocess_frame(
    color_or_gray: jnp.ndarray,
    depth_raw: jnp.ndarray,
    camera: CameraModel,
    *,
    levels: int,
    max_distance: float = 5.0,
    quantize: bool = False,
) -> FrameData:
    """Color/gray + raw depth -> pyramids, fully on device.

    color_or_gray : (..., H, W, 3) RGB or (..., H, W) gray, any numeric
        dtype (leading dims are batch).  RGB is detected by a trailing
        channel axis of size 3 matching ``depth_raw``'s spatial shape —
        a (degenerate) 3-pixel-wide gray image would need explicit
        conversion by the caller.
    depth_raw : (..., H, W) raw depth DN (0 = invalid).
    """
    is_rgb = (
        color_or_gray.ndim == depth_raw.ndim + 1
        and color_or_gray.shape[-1] == 3
    )
    if is_rgb:
        gray = pyr_ops.rgb_to_gray(color_or_gray, quantize=quantize)
    else:
        gray = color_or_gray.astype(jnp.float32)
    depth_m = pyr_ops.preprocess_depth(depth_raw, camera.depth_scale, max_distance)
    return FrameData(
        gray=pyr_ops.build_pyramid(gray, levels),
        depth_m=pyr_ops.build_pyramid(depth_m, levels),
    )


class _GNCarry(NamedTuple):
    estimate: jnp.ndarray  # (4, 4) current (= best accepted) transform
    prior_anchor: jnp.ndarray  # (4, 4) motion-prior anchor ("old")
    err_prev: jnp.ndarray  # f32 error of the last *accepted* step
    err_last: jnp.ndarray  # f32 error of the last evaluation (diagnostics)
    count_last: jnp.ndarray  # f32 valid pixels at last evaluation
    weight_lambda: jnp.ndarray  # (...) warm-started IRLS 1/sigma^2
    inc_count: jnp.ndarray  # i32 consecutive error increases
    it: jnp.ndarray  # i32 iterations executed
    done: jnp.ndarray  # bool


class _LMCarry(NamedTuple):
    est_acc: jnp.ndarray  # (..., 4, 4) last ACCEPTED transform
    anchor_acc: jnp.ndarray  # (..., 4, 4) motion-prior anchor at est_acc
    est_try: jnp.ndarray  # (..., 4, 4) trial point evaluated next
    anchor_try: jnp.ndarray
    hess_acc: jnp.ndarray  # (..., 6, 6) full system (incl. prior) at est_acc
    rhs_acc: jnp.ndarray  # (..., 6)
    err_acc: jnp.ndarray  # f32 error at est_acc (inf before first eval)
    count_acc: jnp.ndarray  # f32 valid pixels at est_acc
    lm_lambda: jnp.ndarray  # (...) adaptive damping
    weight_lambda: jnp.ndarray  # (...) warm-started IRLS 1/sigma^2
    it: jnp.ndarray  # i32
    done: jnp.ndarray  # bool


def _bias_schur(sys, residuals, jacobian, weights):
    """Eliminate a global intensity-bias unknown from the GN system.

    Joint model ``r_i ~ J_i delta + c`` (c = per-pair exposure offset):
    with the ones-column block ``g = sum w J_i`` (6,), ``s = sum w``,
    ``b_c = -sum w r``, the Schur complement onto the pose block is
    ``H' = H - g g^T / s``, ``b' = b - g b_c / s``.  The reported error
    becomes the bias-minimized ``sum w (r - mu)^2 / count`` with
    ``mu = sum w r / s`` — consistent with what the solve optimizes, so
    the stopping rules see the right objective.  Three extra reduced
    scalars + a rank-1 update; nothing pixel-sized is touched.
    """
    batch_shape = jacobian.shape[:-3] if jacobian.ndim >= 3 else ()
    jac = jacobian.reshape(batch_shape + (-1, 6))
    res = residuals.reshape(batch_shape + (-1,))
    wts = weights.reshape(batch_shape + (-1,))
    g = jnp.einsum("...ni,...n->...i", jac, wts)
    s = jnp.sum(wts, axis=-1)
    rho = jnp.sum(wts * res, axis=-1)  # = -b_c
    s_safe = jnp.maximum(s, 1e-6)
    hess = sys.hessian - (
        g[..., :, None] * g[..., None, :] / s_safe[..., None, None]
    )
    rhs = sys.rhs + g * (rho / s_safe)[..., None]
    mu = rho / s_safe
    error = sys.error - s * mu * mu / jnp.maximum(sys.count, 1.0)
    return sys._replace(hessian=hess, rhs=rhs, error=error)


def _affine_schur(sys, residuals, jacobian, weights, template_c):
    """Eliminate a gain+bias pair: joint model ``r_i ~ J_i delta + a*I_i + c``.

    ``template_c`` is the valid-mean-CENTERED template intensity plane;
    centering decorrelates the gain and bias nuisance columns so the 2x2
    block ``S = N^T W N`` (``N_i = [I_i, 1]``) stays well-conditioned in
    f32 (exactness is unaffected — span([I,1]) == span([I-mu,1])).  Schur
    onto the pose block with ``G = J^T W N`` (6x2), ``t = N^T W r``:
    ``H' = H - G S^-1 G^T``, ``b' = b + G S^-1 t``, and the reported
    error drops by ``t^T S^-1 t / count`` — the affine-minimized
    objective the stopping rules should see.  Closed-form 2x2 inverse;
    six extra reduced scalars + two rank-1 updates.
    """
    batch_shape = jacobian.shape[:-3] if jacobian.ndim >= 3 else ()
    jac = jacobian.reshape(batch_shape + (-1, 6))
    res = residuals.reshape(batch_shape + (-1,))
    wts = weights.reshape(batch_shape + (-1,))
    tpl = template_c.reshape(batch_shape + (-1,))
    s_ii = jnp.sum(wts * tpl * tpl, axis=-1)
    s_i1 = jnp.sum(wts * tpl, axis=-1)
    s_11 = jnp.sum(wts, axis=-1)
    t_i = jnp.sum(wts * tpl * res, axis=-1)
    t_1 = jnp.sum(wts * res, axis=-1)
    det = jnp.maximum(s_ii * s_11 - s_i1 * s_i1, 1e-6)
    g_i = jnp.einsum("...ni,...n->...i", jac, wts * tpl)  # J^T W I  (6,)
    g_1 = jnp.einsum("...ni,...n->...i", jac, wts)  # J^T W 1  (6,)
    beta_i = (s_11 * t_i - s_i1 * t_1) / det  # S^-1 t
    beta_1 = (s_ii * t_1 - s_i1 * t_i) / det
    m_i = (s_11[..., None] * g_i - s_i1[..., None] * g_1) / det[..., None]
    m_1 = (s_ii[..., None] * g_1 - s_i1[..., None] * g_i) / det[..., None]
    hess = sys.hessian - (
        g_i[..., :, None] * m_i[..., None, :]
        + g_1[..., :, None] * m_1[..., None, :]
    )
    rhs = sys.rhs + g_i * beta_i[..., None] + g_1 * beta_1[..., None]
    error = sys.error - (t_i * beta_i + t_1 * beta_1) / jnp.maximum(
        sys.count, 1.0
    )
    return sys._replace(hessian=hess, rhs=rhs, error=error)


def _lm_loop(
    evaluate, estimate0, prior_anchor0, cfg, batch_shape, rel_eff=None,
    max_iterations=None,
):
    """Levenberg-Marquardt trust-region iteration (``cfg.lm_lambda0`` set).

    Differences vs the reference/GN loop (deliberate, documented in
    :class:`~dense_visual_odometry_tpu.config.RobustDVOConfig`):

    - one residual/Jacobian evaluation per iteration, at the TRIAL point;
      a rejected trial rolls back and re-solves the carried 6x6 system
      with increased damping (the GN loop keeps bad increments applied
      and re-evaluates the same system, reference
      base_robust_dvo.py:214-227);
    - damped solve ``(H + lambda * diag(H)) delta = b``;
    - predictive stopping: the expected error decrease of the next step,
      ``delta . b / count`` in mean-error units, under ``tolerance`` or
      ``relative_tolerance * err`` ends the level — the level never pays
      an extra evaluation just to confirm convergence.
    """
    eye6 = jnp.eye(6, dtype=jnp.float32)
    rel = cfg.relative_tolerance if rel_eff is None else rel_eff
    max_iter = cfg.max_iterations if max_iterations is None else max_iterations

    def cond(c: _LMCarry):
        return jnp.logical_and(jnp.any(~c.done), c.it < max_iter)

    def body(c: _LMCarry) -> _LMCarry:
        hess, rhs, err, count, _photo, wlam = evaluate(
            c.est_try, c.anchor_try, c.weight_lambda
        )
        ok_eval = jnp.isfinite(err) & (count >= 6.0)
        active = ~c.done
        take = (err < c.err_acc) & ok_eval & active
        sel2 = take[..., None, None]
        est_acc = jnp.where(sel2, c.est_try, c.est_acc)
        anchor_acc = jnp.where(sel2, c.anchor_try, c.anchor_acc)
        hess_acc = jnp.where(sel2, hess, c.hess_acc)
        rhs_acc = jnp.where(take[..., None], rhs, c.rhs_acc)
        err_acc = jnp.where(take, err, c.err_acc)
        count_acc = jnp.where(take, count, c.count_acc)
        lam = jnp.where(
            active,
            jnp.where(take, c.lm_lambda * cfg.lm_down, c.lm_lambda * cfg.lm_up),
            c.lm_lambda,
        )
        lam = jnp.clip(lam, 1e-10, cfg.lm_lambda_max)

        # Marquardt-scaled damped solve at the accepted point (carried
        # system — a rejected trial costs no new pixel pass) with the same
        # tiny Tikhonov floor as the GN path for rank deficiency.
        floor = 1e-8 * (1.0 + jnp.trace(hess_acc, axis1=-2, axis2=-1))
        damped = (
            hess_acc
            + lam[..., None, None] * (hess_acc * eye6)
            + floor[..., None, None] * eye6
        )
        delta = jnp.linalg.solve(damped, rhs_acc[..., None])[..., 0]
        ok = jnp.all(jnp.isfinite(delta), axis=-1) & (count_acc >= 6.0)
        delta = jnp.where(ok[..., None], delta, 0.0)

        # Predicted decrease of the mean error for this step.
        pred = jnp.sum(delta * rhs_acc, axis=-1) / jnp.maximum(count_acc, 1.0)
        converged = pred < cfg.tolerance
        if rel is not None:
            converged = converged | (pred < rel * jnp.abs(err_acc))
        done = c.done | (converged & ok_eval) | ~ok | (lam >= cfg.lm_lambda_max)

        inc = se3.exp(delta)
        # The converging increment is predicted to (slightly) reduce the
        # error — apply it rather than discard it, recovering the accuracy
        # of the GN loop's trailing evaluation without paying for one.
        apply_final = (converged & ok_eval & ok & active)[..., None, None]
        est_acc = jnp.where(apply_final, inc @ est_acc, est_acc)
        anchor_acc = jnp.where(
            apply_final, se3.inverse(inc) @ anchor_acc, anchor_acc
        )
        move = (~done & active)[..., None, None]
        est_try = jnp.where(move, inc @ est_acc, est_acc)
        anchor_try = jnp.where(move, se3.inverse(inc) @ anchor_acc, anchor_acc)
        return _LMCarry(
            est_acc=est_acc,
            anchor_acc=anchor_acc,
            est_try=est_try,
            anchor_try=anchor_try,
            hess_acc=hess_acc,
            rhs_acc=rhs_acc,
            err_acc=err_acc,
            count_acc=count_acc,
            lm_lambda=lam,
            weight_lambda=wlam,
            it=c.it + 1,
            done=done,
        )

    fmax = jnp.finfo(jnp.float32).max
    init = _LMCarry(
        est_acc=estimate0,
        anchor_acc=prior_anchor0,
        est_try=estimate0,
        anchor_try=prior_anchor0,
        hess_acc=jnp.zeros(batch_shape + (6, 6), jnp.float32),
        rhs_acc=jnp.zeros(batch_shape + (6,), jnp.float32),
        err_acc=jnp.full(batch_shape, fmax, jnp.float32),
        count_acc=jnp.zeros(batch_shape, jnp.float32),
        lm_lambda=jnp.full(batch_shape, cfg.lm_lambda0, jnp.float32),
        weight_lambda=jnp.full(
            batch_shape, 1.0 / (cfg.weighter.initial_sigma**2), jnp.float32
        ),
        it=jnp.int32(0),
        done=jnp.zeros(batch_shape, bool),
    )
    final = jax.lax.while_loop(cond, body, init)
    diag = LevelDiagnostics(
        iterations=final.it, error=final.err_acc, count=final.count_acc,
        scale=jax.lax.rsqrt(jnp.maximum(final.weight_lambda, 1e-20)),
    )
    return final.est_acc, final.anchor_acc, final.weight_lambda, diag


def _solve_level(
    gray_prev: jnp.ndarray,
    depth_prev_m: jnp.ndarray,
    gray_curr: jnp.ndarray,
    intrinsics: jnp.ndarray,
    estimate0: jnp.ndarray,
    prior_anchor0: jnp.ndarray,
    cfg: RobustDVOConfig,
    level: int = 0,
    depth_curr_m: Optional[jnp.ndarray] = None,
    want_hessian: bool = False,
    force_hard: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, LevelDiagnostics]:
    """Gauss-Newton at one pyramid level as a single ``while_loop``.

    ``force_hard`` (runtime bool, broadcastable to the batch shape) ORs
    into the hard-motion fallback trigger — the scale-gated retrack pass
    uses it to force the robust path regardless of what the level-start
    estimate looks like.  Ignored unless the fallback is configured.

    Natively batched: images (..., H, W), transforms (..., 4, 4).  The
    stopping state is per batch element (a converged pair freezes while
    the loop runs on for the others); the loop exits when every element is
    done.  This is how the batch dimension stays inside plain tensor ops
    instead of a ``vmap`` over control flow (whose per-element loop
    transformation multiplies XLA compile time ~linearly in B).
    """
    batch_shape = estimate0.shape[:-2]
    stride = cfg.stride_for_level(level)
    # Reference-parity quirk mode: raw ksize-3 Sobel (gain 8) straight
    # into J, like jacobian.py:70-71 (see RobustDVOConfig.raw_sobel_gain).
    sgain = 1.0 if cfg.raw_sobel_gain else _SOBEL_GAIN
    use_shift_stack = (
        cfg.shift_stack_radius is not None and level in cfg.shift_stack_levels
    )
    use_fused = (
        use_shift_stack
        and cfg.use_fused_iteration
        and cfg.approximate_image2_gradient
        # "bias" rides the fused kernels (3 extra reduced scalars + a
        # rank-1 Schur); "affine" rides the LEVEL kernel (rank-2 Schur
        # in-kernel, round-4 VERDICT task 6) with its non-loop
        # evaluations (final Hessian; non-level-kernel iterations) on
        # the XLA shift-stack path.  Depth residuals ride the LEVEL
        # kernel natively (a second frozen window over the current
        # depth map); on the per-iteration fused path the depth term is
        # added XLA-side in eval_mode.
        and (
            cfg.illumination in (None, "bias")
            or (cfg.illumination == "affine" and cfg.use_level_kernel)
        )
    )
    use_esm = (
        cfg.use_esm_gradients
        and cfg.approximate_image2_gradient
        and (cfg.esm_levels is None or level in cfg.esm_levels)
    )
    # Estimate-independent work hoisted out of the GN loop (the reference's
    # _setup, cpu_robust_dense_visual_odometry.py:54-77).
    if cfg.approximate_image2_gradient:
        gx1, gy1 = grad_ops.sobel(gray_prev)
        grads = None
        if use_fused:
            # The fused kernel consumes 6 LEADING Jacobian planes on the
            # strided grid.  Building them directly skips both the
            # trailing-6 -> planes relayout (a 6-wide minor axis tiles at
            # ~95% padding on TPU; the transpose costs more than the
            # kernel itself) and the full-res work the stride discards.
            pre_jac = None
            g1x_s = (gx1 / sgain)[..., ::stride, ::stride]
            g1y_s = (gy1 / sgain)[..., ::stride, ::stride]
            if use_esm:
                pre_jac_planes = None  # built from the frozen window below
            else:
                pre_jac_planes = approximate_jacobian_planes(
                    depth_prev_m[..., ::stride, ::stride], intrinsics,
                    g1x_s, g1y_s, grid_stride=stride,
                )
            if cfg.illumination == "affine":
                # Affine's non-loop evaluations run the XLA shift path
                # (shift_mode below), which consumes the trailing-6
                # Jacobian layout; build it alongside the kernel planes.
                pre_jac = approximate_jacobian(
                    gray_prev, depth_prev_m, intrinsics,
                    gx1 / sgain, gy1 / sgain,
                )
        else:
            g1x = gx1 / sgain
            g1y = gy1 / sgain
            if use_esm:
                # ESM: average with grad I2 sampled ONCE per level at the
                # starting warp (nearest through the packed f16 pair
                # plane: 1 gather/pixel; gradients are smooth, the same
                # trade packed_sampling makes for its gradient taps).
                from dense_visual_odometry_tpu.ops.residuals import (
                    _warp_geometry,
                )

                gx2e, gy2e = grad_ops.sobel(gray_curr)
                packed_g2 = interp_ops.pack_pair_f16(
                    gx2e / sgain, gy2e / sgain
                )
                _, u0f, v0f, vg0f = _warp_geometry(
                    depth_prev_m, intrinsics, estimate0, 1
                )
                g2x, g2y, ok2 = interp_ops.nearest_sample_packed(
                    packed_g2, u0f, v0f
                )
                okm = vg0f & ok2
                g1x = jnp.where(okm, 0.5 * (g1x + g2x), g1x)
                g1y = jnp.where(okm, 0.5 * (g1y + g2y), g1y)
            pre_jac = approximate_jacobian(
                gray_prev, depth_prev_m, intrinsics, g1x, g1y,
            )
            pre_jac_planes = None
    else:
        gx2, gy2 = grad_ops.sobel(gray_curr)
        grads = (gx2 / sgain, gy2 / sgain)
        pre_jac = None
        pre_jac_planes = None

    if cfg.use_depth_residuals:
        gzx, gzy = grad_ops.sobel(depth_prev_m)
        grads_z = (gzx / _SOBEL_GAIN, gzy / _SOBEL_GAIN)

    if stride > 1:
        # Residuals on a decimated grid of the previous frame; the current
        # image is still sampled at full resolution.
        gray_prev = gray_prev[..., ::stride, ::stride]
        depth_prev_m = depth_prev_m[..., ::stride, ::stride]
        if pre_jac is not None:
            pre_jac = pre_jac[..., ::stride, ::stride, :]
        if cfg.use_depth_residuals:
            # Gradients are d(depth)/d(full-res pixel) sampled at the
            # strided grid points — no rescaling needed.
            grads_z = (
                grads_z[0][..., ::stride, ::stride],
                grads_z[1][..., ::stride, ::stride],
            )

    # Hard-motion fallback applies wherever the fast-path assumptions can
    # break: at shift-stack levels (ball masking) and at ANY level using
    # the precomputed Jacobian (grad I1 at unwarped coordinates is wrong
    # once the warp is large).
    use_fallback = cfg.shift_stack_fallback and (
        use_shift_stack or cfg.approximate_image2_gradient
    )
    gray_curr_packed = (
        interp_ops.pack_neighbors(gray_curr) if cfg.packed_sampling else None
    )

    def make_fb_prep():
        """Gather-path inputs for the hard-motion fallback.

        The fallback samples through the packed-gather warp and (with a
        precomputed Jacobian configured) abandons it for exact
        current-image gradients — grad I1 at unwarped coordinates is the
        wrong descent direction once the warp is large.  Built LAZILY,
        inside the fallback branch: a ``lax.cond``'s operands are
        computed eagerly, so hoisting this prep outside the cond charges
        every easy level for a branch it never takes (measured 7.3
        ms/batch32 of dead prep on the bundled set,
        benchmarks/RESULTS.md).
        """
        packed = interp_ops.pack_neighbors(gray_curr)
        if cfg.approximate_image2_gradient:
            gx2_fb, gy2_fb = grad_ops.sobel(gray_curr)
            gfb = interp_ops.pack_pair_f16(
                gx2_fb / sgain, gy2_fb / sgain
            )
        else:
            gfb = None
        return packed, gfb
    if cfg.packed_sampling or use_shift_stack:
        # Both fast paths sample gradients from the packed (gx, gy) plane.
        grads_packed = (
            None if grads is None else interp_ops.pack_pair_f16(grads[0], grads[1])
        )

    use_prior = cfg.sigma is not None
    inv_cov = jnp.float32(0.0 if cfg.sigma is None else 1.0 / cfg.sigma)

    def eval_mode(mode, estimate, prior_anchor, weight_lambda, fb_prep=None):
        if mode == "fused":
            from dense_visual_odometry_tpu.ops.pallas.fused_iter import (
                fused_shift_iteration,
            )
            from dense_visual_odometry_tpu.ops.residuals import _warp_geometry

            _, u, v, valid_geom = _warp_geometry(
                depth_prev_m, intrinsics, estimate, stride
            )
            hess, rhs, err, count, lam = fused_shift_iteration(
                gray_prev, gray_curr, u, v, valid_geom,
                jacobian_planes=pre_jac_planes,
                lam0=weight_lambda,
                radius=cfg.shift_stack_radius,
                grid_stride=stride,
                dof=cfg.weighter.dof,
                unroll=cfg.weighter.unroll_iterations or 3,
                use_tweights=cfg.use_weighter,
                normalize_scale=cfg.weighter.normalize_scale,
                illum_bias=cfg.illumination == "bias",
                frozen=frozen_win,
            )
            if cfg.use_depth_residuals:
                # Geometric term, XLA-side (the per-iteration fused
                # kernel reduces photometry only; the LEVEL kernel has
                # the depth term in-kernel).  Same ordering as the
                # general path below: after photometric reduction,
                # before the prior.
                res_z, jac_z, valid_z = depth_residuals(
                    depth_prev_m, depth_curr_m, intrinsics, estimate,
                    grads_z[0], grads_z[1], grid_stride=stride,
                )
                w_z = huber_weights(
                    res_z * res_z, valid_z, delta=cfg.depth_huber_delta
                )
                sys_z = normal_equations(res_z, jac_z, w_z, valid_z)
                lam_z = jnp.float32(cfg.depth_weight)
                hess = hess + lam_z * sys_z.hessian
                rhs = rhs + lam_z * sys_z.rhs
                err = err + lam_z * sys_z.error
            photometric_hess = hess
            if use_prior:
                log_old = se3.log(prior_anchor)
                hess = hess + inv_cov * jnp.eye(6, dtype=jnp.float32)
                rhs = rhs + inv_cov * log_old
                err = err + _prior_energy(cfg, inv_cov, log_old)
            return hess, rhs, err, count, photometric_hess, lam
        if mode == "shift":
            res, jac, valid = warp_residuals_shift(
                gray_prev, depth_prev_m, gray_curr, intrinsics, estimate,
                grads_packed=grads_packed,
                precomputed_jacobian=pre_jac,
                grid_stride=stride,
                radius=cfg.shift_stack_radius,
                use_pallas=cfg.use_pallas_stack,
            )
        elif mode == "packed":
            res, jac, valid = warp_residuals_packed(
                gray_prev, depth_prev_m,
                gray_curr_packed if fb_prep is None else fb_prep[0],
                intrinsics, estimate,
                grads_packed=grads_packed,
                precomputed_jacobian=pre_jac,
                grid_stride=stride,
            )
        elif mode == "packed_exact":
            res, jac, valid = warp_residuals_packed(
                gray_prev, depth_prev_m, fb_prep[0], intrinsics, estimate,
                grads_packed=fb_prep[1],
                precomputed_jacobian=None,
                grid_stride=stride,
            )
        elif pre_jac is not None:
            res, jac, valid = warp_residuals(
                gray_prev, depth_prev_m, gray_curr, intrinsics, estimate,
                precomputed_jacobian=pre_jac, grid_stride=stride,
            )
        else:
            res, jac, valid = warp_residuals(
                gray_prev, depth_prev_m, gray_curr, intrinsics, estimate,
                grads[0], grads[1], grid_stride=stride,
            )
        tpl_c = None
        if cfg.illumination is not None:
            # Remove the best unweighted illumination fit BEFORE robust
            # weighting so the t-scale sees exposure-free residuals; the
            # Schur step below then eliminates the remaining WEIGHTED
            # nuisance exactly each iteration.
            nv = jnp.maximum(
                jnp.sum(valid, (-2, -1)).astype(jnp.float32), 1.0
            )
            mu_r = jnp.sum(jnp.where(valid, res, 0.0), (-2, -1)) / nv
            res = jnp.where(valid, res - mu_r[..., None, None], 0.0)
            if cfg.illumination == "affine":
                tpl_mu = jnp.sum(
                    jnp.where(valid, gray_prev, 0.0), (-2, -1)
                ) / nv
                tpl_c = jnp.where(
                    valid, gray_prev - tpl_mu[..., None, None], 0.0
                )
                alpha = jnp.sum(tpl_c * res, (-2, -1)) / jnp.maximum(
                    jnp.sum(tpl_c * tpl_c, (-2, -1)), 1e-6
                )
                res = res - alpha[..., None, None] * tpl_c
        if cfg.use_weighter:
            weights, weight_lambda = t_distribution_weights_with_scale(
                res * res, valid, cfg.weighter, event_ndim=2,
                init_lambda=weight_lambda if cfg.weighter.warm_start else None,
            )
        else:
            weights = valid.astype(jnp.float32)
        sys = normal_equations(res, jac, weights, valid)
        if cfg.illumination == "bias":
            sys = _bias_schur(sys, res, jac, weights)
        elif cfg.illumination == "affine":
            sys = _affine_schur(sys, res, jac, weights, tpl_c)

        hess, rhs, err = sys.hessian, sys.rhs, sys.error
        if cfg.use_depth_residuals:
            res_z, jac_z, valid_z = depth_residuals(
                depth_prev_m, depth_curr_m, intrinsics, estimate,
                grads_z[0], grads_z[1], grid_stride=stride,
            )
            w_z = huber_weights(
                res_z * res_z, valid_z, delta=cfg.depth_huber_delta
            )
            sys_z = normal_equations(res_z, jac_z, w_z, valid_z)
            lam_z = jnp.float32(cfg.depth_weight)
            hess = hess + lam_z * sys_z.hessian
            rhs = rhs + lam_z * sys_z.rhs
            err = err + lam_z * sys_z.error
        photometric_hess = hess  # without the prior: the measurement information
        if use_prior:
            log_old = se3.log(prior_anchor)
            hess = hess + inv_cov * jnp.eye(6, dtype=jnp.float32)
            rhs = rhs + inv_cov * log_old
            err = err + _prior_energy(cfg, inv_cov, log_old)
        return hess, rhs, err, sys.count, photometric_hess, weight_lambda

    # The per-iteration fused kernel has no rank-2 Schur; under "affine"
    # the LEVEL kernel runs the loop and any remaining evaluations (the
    # final Hessian, fallback-forced iterations) use the exact XLA
    # shift-stack path instead.
    shift_mode = (
        "fused" if use_fused and cfg.illumination != "affine" else "shift"
    )
    if use_shift_stack:
        default_mode = shift_mode
    elif cfg.packed_sampling:
        default_mode = "packed"
    else:
        default_mode = "plain"

    def fallback_trigger(estimate):
        """-> (any_hard scalar bool, hard (...) per-element bool)."""
        from dense_visual_odometry_tpu.ops.residuals import _warp_geometry
        from dense_visual_odometry_tpu.ops.shiftwarp import shift_coverage

        _, u, v, valid_geom = _warp_geometry(
            depth_prev_m, intrinsics, estimate, stride
        )
        radius = (
            cfg.shift_stack_radius if cfg.shift_stack_radius is not None
            else 4
        )
        if use_tiles:
            # Judge the path that will actually run: per-tile centers
            # keep strictly more pixels than row blocks or a global
            # center (round-4 VERDICT task 1 — this is what keeps SLAM
            # keyframe solves off the gather fallback).
            from dense_visual_odometry_tpu.ops.pallas.stackwarp import (
                shift_coverage_tiles,
            )

            cov = shift_coverage_tiles(
                u, v, radius, stride, cfg.recenter_blocks,
                cfg.recenter_col_blocks, coord_mask=valid_geom,
                radius_y=(
                    cfg.shift_stack_radius_y
                    if cfg.shift_stack_radius_y is not None
                    else radius
                ),
                center_bound=cfg.recenter_center_bound,
            )
        elif use_blocks:
            # Judge the path that will actually run: per-block centers
            # keep strictly more pixels than a single global center.
            from dense_visual_odometry_tpu.ops.pallas.stackwarp import (
                shift_coverage_blocks,
            )

            cov = shift_coverage_blocks(
                u, v, radius, stride, cfg.recenter_blocks,
                coord_mask=valid_geom,
                radius_y=(
                    cfg.shift_stack_radius_y
                    if cfg.shift_stack_radius_y is not None
                    else radius
                ),
            )
        else:
            cov = shift_coverage(u, v, radius, stride, coord_mask=valid_geom)
        hard = cov < cfg.shift_fallback_min_coverage
        if cfg.approximate_image2_gradient:
            # Rotation trigger, EVERY approximate-Jacobian level: an
            # in-plane rotation rotates the true gradient directions, so
            # the precomputed grad-I1 Jacobian stays biased even at the
            # converged solution — a warm-started rotation has near-zero
            # residual displacement, so the other triggers cannot see it
            # (measured: the whole rotation-heavy stress gap is this
            # term, benchmarks/RESULTS.md).
            rot = estimate[..., :3, :3]
            cos_t = 0.5 * (jnp.trace(rot, axis1=-2, axis2=-1) - 1.0)
            theta = jnp.arccos(jnp.clip(cos_t, -1.0, 1.0))
            # At ESM levels the Jacobian is (half) evaluated at the
            # level-start warp, so the total-rotation magnitude
            # overstates the gradient-direction bias for warm-started
            # solves; the optional relaxed threshold keeps the keyframe
            # regime on the fused kernel (config.esm_fallback_max_rotation).
            max_rot = (
                cfg.esm_fallback_max_rotation
                if use_esm and cfg.esm_fallback_max_rotation is not None
                else cfg.fallback_max_rotation
            )
            hard = hard | (theta > max_rot)
        if cfg.approximate_image2_gradient and level == cfg.levels - 1:
            # Jacobian-validity trigger, COARSEST level only: recentering
            # hides pure translation, but a precomputed Jacobian is wrong
            # when the warp still to be solved is large — which is only
            # unknowable at the level that starts from an uninformed
            # initialization.  Finer levels inherit a converged coarse
            # estimate, where total-warp magnitude says nothing about the
            # remaining motion (measured: the bundled set carries 4-8 px
            # of benign total warp at level 0).
            hp, wp = u.shape[-2], u.shape[-1]
            col = jnp.arange(wp, dtype=jnp.float32) * stride
            row = jnp.arange(hp, dtype=jnp.float32) * stride
            du = u - col[None, :]
            dv = v - row[:, None]
            mf = valid_geom.astype(jnp.float32)
            denom = jnp.maximum(jnp.sum(mf, axis=(-2, -1)), 1.0)
            rms = jnp.sqrt(
                jnp.sum((du * du + dv * dv) * mf, axis=(-2, -1)) / denom
            )
            hard = hard | (rms > cfg.fallback_max_displacement)
        return jnp.any(hard), hard

    # The trigger is evaluated ONCE at the level's starting estimate: a
    # level that begins easy stays on the fast path for all of its
    # iterations (wild LM *trial* points must not flip the whole batch
    # onto the slow path — their bad evaluations get rejected anyway),
    # and a level that begins hard stays on the robust path throughout.
    rel_eff = cfg.relative_tolerance
    frozen_win = None
    frozen_win_blocks = None
    frozen_depth_planes = None
    # Per-row-block recentering rides the level-fused kernel only: each
    # block of grid rows gets its own integer window center, shrinking
    # the displacement spread the shift ball must cover (ROADMAP item 1;
    # ops/pallas/stackwarp.block_layout).
    # Per-TILE recentering (2-D: row x col blocks) subsumes the row-only
    # path when ``recenter_col_blocks`` is set — each tile absorbs its
    # local mean displacement, keeping keyframe-class rotations inside
    # the shift ball (round-4 VERDICT task 1).
    use_tiles = (
        cfg.recenter_col_blocks is not None
        and cfg.recenter_col_blocks > 1
        and cfg.recenter_blocks is not None
        and use_fused
        and cfg.freeze_shift_window
        and cfg.use_level_kernel
        and cfg.lm_lambda0 is not None
        and not use_esm
    )
    use_blocks = (
        not use_tiles
        and cfg.recenter_blocks is not None
        and cfg.recenter_blocks > 1
        and use_fused
        and cfg.freeze_shift_window
        and cfg.use_level_kernel
        and cfg.lm_lambda0 is not None
        and not use_esm
    )
    if use_tiles:
        from dense_visual_odometry_tpu.ops.pallas.stackwarp import (
            compute_recenter_tiles,
            extract_parity_planes_tiles,
        )
        from dense_visual_odometry_tpu.ops.residuals import _warp_geometry

        _, u0, v0, vg0 = _warp_geometry(
            depth_prev_m, intrinsics, estimate0, stride
        )
        radius0 = cfg.shift_stack_radius
        radius0_y = (
            cfg.shift_stack_radius_y
            if cfg.shift_stack_radius_y is not None
            else radius0
        )
        nby0 = cfg.recenter_blocks
        nbx0 = cfg.recenter_col_blocks
        cu0, cv0 = compute_recenter_tiles(
            u0, v0, radius0, stride, nby0, nbx0, vg0, radius_y=radius0_y,
            center_bound=cfg.recenter_center_bound,
        )
        hp0, wp0 = u0.shape[-2], u0.shape[-1]
        tshape = cu0.shape[-2:]

        def _extract_tiles(img):
            if batch_shape:
                iflat = img.reshape((-1,) + img.shape[-2:])
                pl0 = extract_parity_planes_tiles(
                    iflat,
                    jnp.broadcast_to(cu0, batch_shape + tshape).reshape(
                        (-1,) + tshape
                    ),
                    jnp.broadcast_to(cv0, batch_shape + tshape).reshape(
                        (-1,) + tshape
                    ),
                    hp0, wp0, radius0, stride, nby0, nbx0,
                    radius_y=radius0_y,
                    center_bound=cfg.recenter_center_bound,
                )
                return pl0.reshape(batch_shape + pl0.shape[1:])
            return extract_parity_planes_tiles(
                img[None], cu0[None], cv0[None],
                hp0, wp0, radius0, stride, nby0, nbx0,
                radius_y=radius0_y,
                center_bound=cfg.recenter_center_bound,
            )[0]

        planes0 = _extract_tiles(gray_curr)
        frozen_win_blocks = (planes0, cu0, cv0)
        if cfg.use_depth_residuals and depth_curr_m is not None:
            frozen_depth_planes = _extract_tiles(depth_curr_m)
    elif use_blocks:
        from dense_visual_odometry_tpu.ops.pallas.stackwarp import (
            compute_recenter_blocks,
            extract_parity_planes_blocks,
        )
        from dense_visual_odometry_tpu.ops.residuals import _warp_geometry

        _, u0, v0, vg0 = _warp_geometry(
            depth_prev_m, intrinsics, estimate0, stride
        )
        radius0 = cfg.shift_stack_radius
        radius0_y = (
            cfg.shift_stack_radius_y
            if cfg.shift_stack_radius_y is not None
            else radius0
        )
        cu0, cv0 = compute_recenter_blocks(
            u0, v0, radius0, stride, cfg.recenter_blocks, vg0,
            radius_y=radius0_y,
        )
        hp0, wp0 = u0.shape[-2], u0.shape[-1]
        nblk0 = cu0.shape[-1]

        def _extract_blocks(img):
            if batch_shape:
                iflat = img.reshape((-1,) + img.shape[-2:])
                pl0 = extract_parity_planes_blocks(
                    iflat,
                    jnp.broadcast_to(cu0, batch_shape + (nblk0,)).reshape(
                        -1, nblk0
                    ),
                    jnp.broadcast_to(cv0, batch_shape + (nblk0,)).reshape(
                        -1, nblk0
                    ),
                    hp0, wp0, radius0, stride, cfg.recenter_blocks,
                    radius_y=radius0_y,
                )
                return pl0.reshape(batch_shape + pl0.shape[1:])
            return extract_parity_planes_blocks(
                img[None], cu0[None], cv0[None],
                hp0, wp0, radius0, stride, cfg.recenter_blocks,
                radius_y=radius0_y,
            )[0]

        planes0 = _extract_blocks(gray_curr)
        frozen_win_blocks = (planes0, cu0, cv0)
        if cfg.use_depth_residuals and depth_curr_m is not None:
            # The CURRENT depth map rides the same frozen window (same
            # integer centers, same displacement-ball assumptions) so
            # the level kernel can tap-sample z_meas in-kernel.
            frozen_depth_planes = _extract_blocks(depth_curr_m)
    elif use_fused and cfg.freeze_shift_window:
        # Window extraction (pad + dynamic-slice + parity split) depends
        # on the estimate only through the INTEGER recentering offsets,
        # which move subpixel within a level: extract once at the level's
        # starting estimate and let every iteration reuse the planes.
        # (XLA CSEs this geometry evaluation with the fallback trigger's.)
        from dense_visual_odometry_tpu.ops.pallas.stackwarp import (
            compute_recenter,
            extract_parity_planes,
        )
        from dense_visual_odometry_tpu.ops.residuals import _warp_geometry

        _, u0, v0, vg0 = _warp_geometry(
            depth_prev_m, intrinsics, estimate0, stride
        )
        radius0 = cfg.shift_stack_radius
        cu0, cv0 = compute_recenter(u0, v0, radius0, stride, vg0)
        hp0, wp0 = u0.shape[-2], u0.shape[-1]

        def _extract_plain(img):
            if batch_shape:
                iflat = img.reshape((-1,) + img.shape[-2:])
                pl0 = extract_parity_planes(
                    iflat,
                    jnp.broadcast_to(cu0, batch_shape).reshape(-1),
                    jnp.broadcast_to(cv0, batch_shape).reshape(-1),
                    hp0, wp0, radius0, stride,
                )
                return pl0.reshape(batch_shape + pl0.shape[1:])
            return extract_parity_planes(
                img[None], cu0[None], cv0[None],
                hp0, wp0, radius0, stride,
            )[0]

        planes0 = _extract_plain(gray_curr)
        frozen_win = (planes0, cu0, cv0)
        if cfg.use_depth_residuals and depth_curr_m is not None:
            # Frozen window over the CURRENT depth map for the level
            # kernel's in-kernel geometric term (same cu0/cv0 centers).
            frozen_depth_planes = _extract_plain(depth_curr_m)
        if use_esm:
            # ESM (fused path): the warped current image at the level's
            # starting estimate falls out of the ALREADY-extracted frozen
            # window via one extra gather-free tap sweep; its Sobel
            # gradient (= grad I2 at the warp, chain-ruled through an
            # approximately-identity dw/dx) is averaged with the template
            # gradient and baked into the level-constant Jacobian planes.
            from dense_visual_odometry_tpu.ops.pallas.stackwarp import (
                residual_displacements,
                stack_accumulate_pallas,
            )

            du0, dv0, vball0 = residual_displacements(
                u0, v0, cu0, cv0, radius0, stride,
                gray_curr.shape[-2], gray_curr.shape[-1],
            )
            val0 = vball0 & vg0
            interp_mode = jax.default_backend() != "tpu"
            if batch_shape:
                acc0 = stack_accumulate_pallas(
                    planes0.reshape((-1,) + planes0.shape[len(batch_shape):]),
                    du0.reshape((-1,) + du0.shape[-2:]),
                    dv0.reshape((-1,) + dv0.shape[-2:]),
                    radius0, grid_stride=stride, interpret=interp_mode,
                ).reshape(du0.shape)
            else:
                acc0 = stack_accumulate_pallas(
                    planes0[None], du0[None], dv0[None],
                    radius0, grid_stride=stride, interpret=interp_mode,
                )[0]
            warped0 = jnp.where(val0, acc0, 0.0)
            gwx, gwy = grad_ops.sobel(warped0)
            # Sobel on the strided grid measures d/d(grid step); divide by
            # the stride for d/d(full-res pixel) like the template grads.
            gwx = gwx / (sgain * stride)
            gwy = gwy / (sgain * stride)
            # The warped image is zeros outside validity — only average
            # where the whole 3x3 Sobel support was valid (1-px erosion);
            # elsewhere keep the pure template gradient (IC behaviour).
            okw = _erode3(val0)
            gex = jnp.where(okw, 0.5 * (g1x_s + gwx), g1x_s)
            gey = jnp.where(okw, 0.5 * (g1y_s + gwy), g1y_s)
            pre_jac_planes = approximate_jacobian_planes(
                depth_prev_m, intrinsics, gex, gey, grid_stride=stride,
            )
    if use_fallback:
        need_fb0, hard0 = fallback_trigger(estimate0)
        if force_hard is not None:
            hard0 = hard0 | force_hard
            need_fb0 = need_fb0 | jnp.any(force_hard)
        if rel_eff is not None:
            # Hard-motion levels get a tighter relative stop (per batch
            # element): the aggressive early stop is an easy-sequence
            # optimization that leaves real accuracy on the table when
            # the solve starts far out.
            rel_eff = rel_eff * jnp.where(
                hard0, cfg.fallback_tolerance_scale, 1.0
            )

    def evaluate(estimate, prior_anchor, weight_lambda, fb_prep=None):
        if use_fallback:
            fb_mode = (
                "packed_exact" if cfg.approximate_image2_gradient else "packed"
            )
            if fb_prep is None:
                fb_prep = make_fb_prep()
            # One scalar predicate for the whole batch: mixed batches take
            # the always-correct gather path; the common small-warp case
            # keeps full fast-path speed.
            return jax.lax.cond(
                need_fb0,
                lambda args: eval_mode(fb_mode, *args[:3], fb_prep=args[3]),
                lambda args: eval_mode(default_mode, *args[:3]),
                (estimate, prior_anchor, weight_lambda, fb_prep),
            )
        return eval_mode(default_mode, estimate, prior_anchor, weight_lambda)

    # Level-fused solver: the WHOLE per-level LM loop in one Pallas
    # kernel (ops/pallas/level_solver.py) — the frozen window streams
    # HBM->VMEM once per level and each on-chip iteration costs
    # microseconds instead of ~3 sequential dispatch steps (measured
    # transport attribution, benchmarks/RESULTS.md).  The hard-motion
    # branch keeps the XLA loop: its gather-based evaluate cannot (and
    # should not) live in the shift-window kernel.
    use_level_kernel = (
        cfg.use_level_kernel
        and use_fused
        and (frozen_win is not None or frozen_win_blocks is not None)
        and cfg.lm_lambda0 is not None
        and (not cfg.use_depth_residuals or frozen_depth_planes is not None)
    )
    if cfg.lm_lambda0 is not None and use_level_kernel:
        from dense_visual_odometry_tpu.ops.pallas.level_solver import (
            solve_level_fused,
        )

        lk_planes, lk_cu, lk_cv = (
            frozen_win_blocks if (use_blocks or use_tiles) else frozen_win
        )
        wlam_init = jnp.full(
            batch_shape, 1.0 / (cfg.weighter.initial_sigma**2), jnp.float32
        )

        def run_level_kernel(args):
            est_in, anc_in = args
            est, anchor, wlam, err, count, its = solve_level_fused(
                lk_planes, lk_cu, lk_cv, depth_prev_m, gray_prev,
                pre_jac_planes, intrinsics, est_in, anc_in, wlam_init,
                rel=(
                    None if rel_eff is None
                    else jnp.broadcast_to(rel_eff, batch_shape)
                ),
                image_h=gray_curr.shape[-2],
                image_w=gray_curr.shape[-1],
                radius=cfg.shift_stack_radius,
                grid_stride=stride,
                dof=cfg.weighter.dof,
                unroll=cfg.weighter.unroll_iterations or 3,
                use_tweights=cfg.use_weighter,
                normalize_scale=cfg.weighter.normalize_scale,
                tolerance=cfg.tolerance,
                lm_lambda0=cfg.lm_lambda0,
                lm_up=cfg.lm_up,
                lm_down=cfg.lm_down,
                lm_lambda_max=cfg.lm_lambda_max,
                max_iterations=cfg.max_iterations_for_level(level),
                n_blocks=(
                    cfg.recenter_blocks
                    if (use_blocks or use_tiles)
                    else 1
                ),
                n_blocks_x=(
                    cfg.recenter_col_blocks if use_tiles else 1
                ),
                sigma=cfg.sigma,
                reference_prior_energy=cfg.reference_prior_energy,
                illum_bias=cfg.illumination == "bias",
                illum_affine=cfg.illumination == "affine",
                depth_planes=(
                    frozen_depth_planes if cfg.use_depth_residuals else None
                ),
                zgrad=grads_z if cfg.use_depth_residuals else None,
                depth_weight=cfg.depth_weight,
                depth_huber_delta=cfg.depth_huber_delta,
                radius_y=(
                    cfg.shift_stack_radius_y
                    if (use_blocks or use_tiles)
                    and cfg.shift_stack_radius_y is not None
                    else cfg.shift_stack_radius
                ),
            )
            diag = LevelDiagnostics(
                iterations=its, error=err, count=count,
                scale=jax.lax.rsqrt(jnp.maximum(wlam, 1e-20)),
            )
            return est, anchor, wlam, diag

        def run_xla_loop(args):
            est_in, anc_in = args
            # The fallback prep is built HERE, inside the hard-motion
            # branch of the level cond, so the fast-path branch's program
            # contains no trace of it (lax.cond branches are lazy; only
            # their operands are eager).
            fb_prep = make_fb_prep() if use_fallback else None

            def ev(estimate, prior_anchor, weight_lambda):
                return evaluate(
                    estimate, prior_anchor, weight_lambda, fb_prep=fb_prep
                )

            return _lm_loop(
                ev, est_in, anc_in, cfg, batch_shape, rel_eff=rel_eff,
                max_iterations=cfg.max_iterations_for_level(level),
            )

        if use_fallback:
            final_est, final_anchor, final_wlam, diag = jax.lax.cond(
                need_fb0, run_xla_loop, run_level_kernel,
                (estimate0, prior_anchor0),
            )
        else:
            final_est, final_anchor, final_wlam, diag = run_level_kernel(
                (estimate0, prior_anchor0)
            )
        if want_hessian:
            hess = evaluate(final_est, final_anchor, final_wlam)[4]
        else:
            hess = jnp.zeros(batch_shape + (6, 6), jnp.float32)
        return final_est, diag, hess

    # Non-level-kernel solvers evaluate inside a while body: hoist the
    # fallback prep out of the loop explicitly (LICM through the inner
    # cond's operands is not guaranteed).  Cost matches the old
    # unconditional prep on these paths.
    fb_prep_hoisted = make_fb_prep() if use_fallback else None

    def evaluate_hoisted(estimate, prior_anchor, weight_lambda):
        return evaluate(
            estimate, prior_anchor, weight_lambda, fb_prep=fb_prep_hoisted
        )

    if cfg.lm_lambda0 is not None:
        final_est, final_anchor, final_wlam, diag = _lm_loop(
            evaluate_hoisted, estimate0, prior_anchor0, cfg, batch_shape,
            rel_eff=rel_eff,
            max_iterations=cfg.max_iterations_for_level(level),
        )
        if want_hessian:
            hess = evaluate_hoisted(final_est, final_anchor, final_wlam)[4]
        else:
            hess = jnp.zeros(batch_shape + (6, 6), jnp.float32)
        return final_est, diag, hess

    def cond(c: _GNCarry):
        return jnp.logical_and(
            jnp.any(~c.done), c.it < cfg.max_iterations_for_level(level)
        )

    def body(c: _GNCarry) -> _GNCarry:
        hess, rhs, err, count, photo_hess, lam = evaluate_hoisted(
            c.estimate, c.prior_anchor, c.weight_lambda
        )

        # 6x6 solve with tiny Tikhonov damping for rank-deficient H (the
        # reference used lstsq/gelsy for the same robustness).
        damp = 1e-8 * (1.0 + jnp.trace(hess, axis1=-2, axis2=-1))
        delta = jnp.linalg.solve(
            hess + damp[..., None, None] * jnp.eye(6, dtype=jnp.float32),
            rhs[..., None],
        )[..., 0]
        ok = jnp.all(jnp.isfinite(delta), axis=-1) & (count >= 6.0)
        delta = jnp.where(ok[..., None], delta, 0.0)
        inc = se3.exp(delta)

        err_diff = err - c.err_prev
        converged = jnp.abs(err_diff) < cfg.tolerance
        if cfg.relative_tolerance is not None:
            converged = converged | (
                jnp.abs(err_diff) < rel_eff * jnp.abs(err)
            )
        decreased = err_diff < 0.0
        active = ~c.done
        accept = decreased & ~converged & ok & active
        sel = accept[..., None, None]

        estimate = jnp.where(sel, inc @ c.estimate, c.estimate)
        prior_anchor = (
            jnp.where(sel, se3.inverse(inc) @ c.prior_anchor, c.prior_anchor)
            if use_prior
            else c.prior_anchor
        )
        err_prev = jnp.where(accept, err, c.err_prev)
        inc_count = jnp.where(
            converged | ~active,
            c.inc_count,
            jnp.where(decreased, 0, c.inc_count + 1),
        )
        done = c.done | converged | (inc_count > cfg.max_increased_steps_allowed) | ~ok
        del photo_hess  # the output hessian is re-evaluated after the loop
        return _GNCarry(
            estimate=estimate,
            prior_anchor=prior_anchor,
            err_prev=err_prev,
            err_last=jnp.where(active, err, c.err_last),
            count_last=jnp.where(active, count, c.count_last),
            weight_lambda=lam,
            inc_count=inc_count,
            it=c.it + 1,
            done=done,
        )

    fmax = jnp.finfo(jnp.float32).max
    init = _GNCarry(
        estimate=estimate0,
        prior_anchor=prior_anchor0,
        err_prev=jnp.full(batch_shape, fmax, jnp.float32),
        err_last=jnp.full(batch_shape, fmax, jnp.float32),
        count_last=jnp.zeros(batch_shape, jnp.float32),
        weight_lambda=jnp.full(
            batch_shape, 1.0 / (cfg.weighter.initial_sigma**2), jnp.float32
        ),
        inc_count=jnp.zeros(batch_shape, jnp.int32),
        it=jnp.int32(0),
        done=jnp.zeros(batch_shape, bool),
    )
    final = jax.lax.while_loop(cond, body, init)
    diag = LevelDiagnostics(
        iterations=final.it, error=final.err_last, count=final.count_last,
        scale=jax.lax.rsqrt(jnp.maximum(final.weight_lambda, 1e-20)),
    )
    if want_hessian:
        # The Laplace information must be evaluated AT the returned
        # estimate.  In-loop evaluations lag it whenever the loop exits
        # right after an accepted increment (iteration cap), so re-evaluate
        # once at the final estimate (warm-started IRLS scale); the BA
        # layer (models/slam.py) depends on this being exact.
        hess = evaluate_hoisted(
            final.estimate, final.prior_anchor, final.weight_lambda
        )[4]
    else:
        hess = jnp.zeros(batch_shape + (6, 6), jnp.float32)
    return final.estimate, diag, hess


def _erode3(mask: jnp.ndarray) -> jnp.ndarray:
    """3x3 binary erosion over the last two axes (borders erode away)."""
    h, w = mask.shape[-2], mask.shape[-1]
    pad = [(0, 0)] * (mask.ndim - 2) + [(1, 1), (1, 1)]
    p = jnp.pad(mask, pad, constant_values=False)
    out = mask
    for dy in range(3):
        for dx in range(3):
            out = out & p[..., dy : dy + h, dx : dx + w]
    return out


def _box2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 box downsample (odd trailing row/column dropped)."""
    h2, w2 = x.shape[-2] // 2, x.shape[-1] // 2
    a = x[..., 0 : 2 * h2 : 2, 0 : 2 * w2 : 2]
    b = x[..., 0 : 2 * h2 : 2, 1 : 2 * w2 : 2]
    c = x[..., 1 : 2 * h2 : 2, 0 : 2 * w2 : 2]
    d = x[..., 1 : 2 * h2 : 2, 1 : 2 * w2 : 2]
    return 0.25 * (a + b + c + d)


def _initial_photometric_error(
    gray_prev, depth_prev_m, gray_curr_packed, intrinsics, transform,
    grid_stride: int = 1,
):
    """Masked mean squared photometric error of a candidate transform.

    Low-overlap candidates (most pixels warped out of view) are penalized
    to +inf so a guess can't win by keeping only a handful of pixels.
    ``gray_curr_packed`` is a :func:`~ops.interp.pack_neighbors` plane:
    sampling through the f16 pair plane costs 2 gathers/pixel instead of
    4 — gathers are priced per index on TPU and this warp of the coarsest
    level is pure selection logic, so half-precision taps are free
    accuracy-wise.
    """
    from dense_visual_odometry_tpu.ops.interp import bilinear_sample_packed
    from dense_visual_odometry_tpu.ops.residuals import _warp_geometry

    _, u, v, valid_geom = _warp_geometry(
        depth_prev_m, intrinsics, transform, grid_stride
    )
    val, ok = bilinear_sample_packed(gray_curr_packed, u, v)
    valid = valid_geom & ok
    res = jnp.where(valid, val - gray_prev, 0.0)
    count = jnp.sum(valid.astype(jnp.float32), axis=(-2, -1))
    total = jnp.sum(valid_geom.astype(jnp.float32), axis=(-2, -1))
    err = jnp.sum(res * res, axis=(-2, -1)) / jnp.maximum(count, 1.0)
    enough = count >= jnp.maximum(0.25 * total, 6.0)
    return jnp.where(enough, err, jnp.finfo(jnp.float32).max)


def track_pair(
    prev: FrameData,
    curr: FrameData,
    camera: CameraModel,
    cfg: RobustDVOConfig,
    init_guess: Optional[jnp.ndarray] = None,
    last_transform: Optional[jnp.ndarray] = None,
) -> TrackResult:
    """Align ``curr`` against ``prev``: the reference's ``_step``.

    Coarse-to-fine over ``cfg.levels`` pyramid levels (unrolled — static),
    threading the estimate; each level re-anchors the motion prior at
    ``last_transform`` (base_robust_dvo.py:154).  Pure and jittable; wrap
    in ``jax.jit``/``vmap`` at the call site or use :func:`make_tracker`.
    """
    batch_shape = prev.gray[0].shape[:-2]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), batch_shape + (4, 4))
    estimate = eye if init_guess is None else jnp.broadcast_to(
        init_guess, batch_shape + (4, 4)
    )
    anchor = eye if last_transform is None else jnp.broadcast_to(
        last_transform, batch_shape + (4, 4)
    )

    if cfg.robust_init_selection and init_guess is not None:
        # Candidate scoring runs at HALF the coarsest level's resolution,
        # but through 2x2 BOX-FILTERED intensities, not a strided point
        # sample: a bare stride-2 subsample biases eye-vs-guess scores by
        # ~2-3% (point samples of render/sensor noise systematically favor
        # the interpolating candidate), which flipped marginal decisions
        # exactly on rotation-heavy motion — the regime this selector
        # exists for.  Box filtering integrates every pixel (the bias
        # measurably vanishes, and the decision margin widens — blur
        # suppresses the noise floor) while keeping the 4x gather cut.
        # f16 packed taps rank bit-identically to f32 (measured).
        lvl = cfg.levels - 1
        gp_sel = _box2(prev.gray[lvl])
        hs, ws = gp_sel.shape[-2], gp_sel.shape[-1]
        dp_sel = prev.depth_m[lvl][..., ::2, ::2][..., :hs, :ws]
        packed_sel = interp_ops.pack_neighbors(_box2(curr.gray[lvl]))
        half = jnp.asarray(
            [[0.5, 0.0, -0.25], [0.0, 0.5, -0.25], [0.0, 0.0, 1.0]],
            jnp.float32,
        )
        k_sel = half @ camera.at(lvl)
        if cfg.init_scale_ladder is not None:
            # Multi-hypothesis ladder along the constant-velocity screw:
            # candidates exp(a * log(guess)).  a=0 reproduces identity
            # exactly (exp(0) = I), a=1 the guess; intermediate /
            # extrapolated scales cover deceleration and acceleration.
            # All candidates share one geometry pattern, so scoring is C
            # quarter-res warps — selection logic, not solver work.
            scales = sorted(set((0.0, 1.0) + tuple(cfg.init_scale_ladder)))
            xi = se3.log(estimate)
            # a=1.0 uses the provided estimate VERBATIM, not
            # exp(1.0 * log(estimate)): so3.log is ill-conditioned near
            # theta=pi, so the f32 log/exp round-trip could corrupt a
            # large-rotation warm start that the two-candidate selector
            # passes through untouched.
            cands = jnp.stack(
                [
                    estimate if a == 1.0 else se3.exp(jnp.float32(a) * xi)
                    for a in scales
                ]
            )
            errs = jnp.stack(
                [
                    _initial_photometric_error(
                        gp_sel, dp_sel, packed_sel, k_sel, cands[i]
                    )
                    for i in range(len(scales))
                ]
            )
            # Stable tie-break: argmin returns the FIRST minimal index,
            # and scales are sorted ascending, so ties prefer the
            # smaller motion — identity over an equal-scoring guess.
            # NOTE this is the OPPOSITE of the two-candidate selector
            # below, which keeps the guess on a tie (err_eye < err_guess
            # is false): a deliberate deviation, because reachable ties
            # are pathological here — _initial_photometric_error returns
            # exactly finfo(f32).max for EVERY low-overlap candidate, and
            # when all rungs are overlap-penalized the safe start is the
            # smallest motion, not an arbitrary ladder rung.
            best = jnp.argmin(errs, axis=0)
            onehot = jax.nn.one_hot(best, len(scales), dtype=jnp.float32)
            onehot = jnp.moveaxis(onehot, -1, 0)
            estimate = jnp.einsum("c...,c...ij->...ij", onehot, cands)
        else:
            err_guess = _initial_photometric_error(
                gp_sel, dp_sel, packed_sel, k_sel, estimate
            )
            err_eye = _initial_photometric_error(
                gp_sel, dp_sel, packed_sel, k_sel, eye
            )
            estimate = jnp.where(
                (err_eye < err_guess)[..., None, None], eye, estimate
            )

    est_init = estimate

    def run_cascade(force_hard):
        est = est_init
        diags = []
        hessian = jnp.zeros(batch_shape + (6, 6), jnp.float32)
        for level in range(cfg.levels - 1, -1, -1):
            est, diag, hessian = _solve_level(
                prev.gray[level],
                prev.depth_m[level],
                curr.gray[level],
                camera.at(level),
                est,
                anchor,
                cfg,
                level=level,
                depth_curr_m=curr.depth_m[level],
                want_hessian=(level == 0),
                force_hard=force_hard,
            )
            diags.append(diag)
        stacked = LevelDiagnostics(
            iterations=jnp.stack([d.iterations for d in diags]),
            error=jnp.stack([d.error for d in diags]),
            count=jnp.stack([d.count for d in diags]),
            scale=jnp.stack([d.scale for d in diags]),
        )
        return est, stacked, hessian

    estimate, stacked, hessian = run_cascade(None)

    use_retrack = (
        cfg.retrack_max_scale is not None
        and cfg.use_weighter
        and cfg.shift_stack_fallback
    )
    if use_retrack:
        # Scale-gated retrack: a mistracked element ends the cascade with
        # a large IRLS residual scale (estimate-INDEPENDENT — the only
        # signal that survives an uninformed init, where every
        # estimate-based trigger reads zero and the biased fast path
        # "converges" instantly; see RobustDVOConfig.retrack_max_scale).
        # Re-solve those elements from the initial estimate with the
        # robust fallback forced at every level; one scalar cond keeps
        # clean batches at full speed.
        bad = stacked.scale[-1] > cfg.retrack_max_scale

        est2, st2, hess2 = jax.lax.cond(
            jnp.any(bad),
            lambda _: run_cascade(bad),
            lambda _: (estimate, stacked, hessian),
            None,
        )
        pick = bad[..., None, None]
        estimate = jnp.where(pick, est2, estimate)
        hessian = jnp.where(pick, hess2, hessian)
        stacked = LevelDiagnostics(
            # The while-loop counter is shared across the batch; report
            # the larger of the two passes (equal when no retrack ran).
            iterations=jnp.maximum(stacked.iterations, st2.iterations),
            error=jnp.where(bad[None], st2.error, stacked.error),
            count=jnp.where(bad[None], st2.count, stacked.count),
            scale=jnp.where(bad[None], st2.scale, stacked.scale),
        )
    success = (
        jnp.all(jnp.isfinite(estimate), axis=(-2, -1))
        & jnp.isfinite(stacked.error[-1])
        & (stacked.count[-1] >= 6.0)
    )
    return TrackResult(
        transform=estimate, success=success, diagnostics=stacked, hessian=hessian
    )


def step_pose(pose: jnp.ndarray, result: TrackResult) -> jnp.ndarray:
    """World-pose update: ``pose_t = pose_{t-1} @ transform^-1`` on success
    (reference base_dense_visual_odometry.py:72-79), unchanged on failure.
    """
    new_pose = pose @ se3.inverse(result.transform)
    return jnp.where(result.success[..., None, None], new_pose, pose)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _track_jit(prev, curr, intrinsics, depth_scale_dummy, cfg, init_guess, last_transform):
    camera = CameraModel(intrinsics=intrinsics, depth_scale=1.0)
    del depth_scale_dummy  # pyramids are already metric
    return track_pair(prev, curr, camera, cfg, init_guess, last_transform)


def make_tracker(cfg: RobustDVOConfig):
    """A jitted ``(prev, curr, intrinsics, init_guess, last_transform) ->
    TrackResult`` closure over a static config."""

    def run(prev, curr, intrinsics, init_guess=None, last_transform=None):
        eye = jnp.eye(4, dtype=jnp.float32)
        return _track_jit(
            prev, curr, jnp.asarray(intrinsics, jnp.float32), 0.0, cfg,
            eye if init_guess is None else init_guess,
            eye if last_transform is None else last_transform,
        )

    return run
