"""Robust IRLS weighting as pure on-device functions.

Capability parity with the reference weighter package
(``/root/reference/src/dense_visual_odometry/weighter/t_weighter.py``):
t-distribution scale via fixed-point iteration, plus a Huber alternative.
The fixed point runs as a ``lax.while_loop`` over a scalar lambda — the
reference's host loop around a Numba reduction (t_weighter.py:21-34)
becomes a fully on-device scan with masked reductions.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dense_visual_odometry_tpu.config import TWeighterConfig


def t_distribution_weights(
    residuals_sq: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: TWeighterConfig,
    event_ndim: int = 0,
    init_lambda: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """See :func:`t_distribution_weights_with_scale`; returns weights only."""
    weights, _ = t_distribution_weights_with_scale(
        residuals_sq, valid, cfg, event_ndim, init_lambda
    )
    return weights


def t_distribution_weights_with_scale(
    residuals_sq: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: TWeighterConfig,
    event_ndim: int = 0,
    init_lambda: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel t-distribution IRLS weights.

    Parameters
    ----------
    residuals_sq : (..., *event) squared residuals.
    valid : same shape bool; invalid entries get weight 0 and do not
        contribute to the scale estimate.
    cfg : weighter hyper-parameters.  ``normalize_scale=False`` reproduces
        the reference's un-normalized sigma^2 update (t_weighter.py:38-47).
    event_ndim : number of trailing axes forming one sample's pixels; a
        separate scale is estimated per leading batch element.  0 = the
        whole array is one sample.
    init_lambda : optional warm start for the 1/sigma^2 fixed point (e.g.
        the converged value from the previous GN iteration — residuals
        change little between iterations, so the loop then converges in
        1-3 steps instead of ~10).  Also returned so callers can carry it.

    The sigma^2 fixed point runs as one ``while_loop`` over a batched
    lambda vector: each batch element freezes once converged, the loop
    exits when all have (or at max_iterations).

    Returns
    -------
    weights : same shape float32, ``(dof+1) / (dof + r^2 / sigma^2)``,
        zero on invalid pixels.
    """
    dof = jnp.float32(cfg.dof)
    validf = valid.astype(jnp.float32)
    axes = tuple(range(-event_ndim, 0)) if event_ndim else None
    batch_shape = residuals_sq.shape[: residuals_sq.ndim - event_ndim] if event_ndim else ()
    expand = (Ellipsis,) + (None,) * event_ndim if event_ndim else (Ellipsis,)

    # Scale estimation can run on a strided subset (the fixed point
    # re-reads the residual image each iteration; the statistic barely
    # moves under stride-s subsampling while traffic drops s^2-fold).
    sub = cfg.scale_subsample
    if sub > 1 and event_ndim >= 2:
        r_est = residuals_sq[..., ::sub, ::sub]
        v_est = validf[..., ::sub, ::sub]
    else:
        r_est, v_est = residuals_sq, validf

    count = jnp.maximum(jnp.sum(v_est, axis=axes), 1.0)
    denom = count if cfg.normalize_scale else jnp.ones_like(count)

    if init_lambda is None:
        init_lambda = jnp.full(
            batch_shape, 1.0 / (cfg.initial_sigma**2), jnp.float32
        )
    else:
        init_lambda = jnp.broadcast_to(init_lambda, batch_shape)

    def fixed_point(lam):
        sigma_sq = (
            jnp.sum(
                v_est * r_est * (dof + 1.0) / (dof + r_est * lam[expand]),
                axis=axes,
            )
            / denom
        )
        return 1.0 / jnp.maximum(sigma_sq, 1e-20)

    if cfg.unroll_iterations is not None:
        # Fixed unrolled steps: no loop scheduling overhead, no
        # convergence check (the warm-started lambda converges in 2-3).
        lam = init_lambda
        for _ in range(cfg.unroll_iterations):
            lam = fixed_point(lam)
    else:

        def cond(carry):
            _, it, done = carry
            return jnp.logical_and(jnp.any(~done), it < cfg.max_iterations)

        def body(carry):
            lam, it, done = carry
            new_lam = jnp.where(done, lam, fixed_point(lam))
            new_done = done | (jnp.abs(new_lam - lam) < cfg.tolerance)
            return new_lam, it + 1, new_done

        lam, _, _ = jax.lax.while_loop(
            cond,
            body,
            (init_lambda, jnp.int32(0), jnp.zeros(batch_shape, bool)),
        )
    weights = validf * (dof + 1.0) / (dof + residuals_sq * lam[expand])
    return weights, lam


def huber_weights(
    residuals_sq: jnp.ndarray, valid: jnp.ndarray, delta: float = 4.0
) -> jnp.ndarray:
    """Huber IRLS weights: 1 inside |r| <= delta, delta/|r| outside."""
    r = jnp.sqrt(jnp.maximum(residuals_sq, 1e-20))
    w = jnp.where(r <= delta, 1.0, delta / r)
    return valid.astype(jnp.float32) * w


def weighted_error(
    residuals_sq: jnp.ndarray, weights: jnp.ndarray, valid: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean weighted squared error over valid pixels -> (error, count)."""
    count = jnp.sum(valid.astype(jnp.float32))
    err = jnp.sum(weights * residuals_sq) / jnp.maximum(count, 1.0)
    return err, count
