"""Vectorized RANSAC for rigid-body fitting.

Capability parity with the reference's generic RANSAC
(``/root/reference/src/dense_visual_odometry/utils/match_filtering.py:12-134``)
— model fit on minimal samples, inlier scoring, consensus refit,
confidence-based iteration count — redesigned TPU-first: instead of a
sequential host loop with early exit, ALL hypotheses are generated and
scored in parallel (one ``vmap`` over a static hypothesis count derived
from the same confidence formula, ``match_filtering.py:12-33``), then the
best consensus set is refit once.  Data-independent shapes, one compiled
program, no host round-trips.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from dense_visual_odometry_tpu.utils.rigid import RigidFit, fit_rigid_svd


def max_samples_by_confidence(
    confidence: float, sample_size: int, inlier_ratio: float
) -> int:
    """Iterations needed to hit an all-inlier sample with ``confidence``
    (reference match_filtering.py:12-33)."""
    p_all_inlier = inlier_ratio**sample_size
    if p_all_inlier >= 1.0:
        return 1
    denom = math.log(1.0 - p_all_inlier)
    if denom >= 0.0:
        return 1
    return max(1, math.ceil(math.log(1.0 - confidence) / denom))


class RansacResult(NamedTuple):
    fit: RigidFit  # final consensus refit
    inliers: jnp.ndarray  # (N,) bool
    inlier_count: jnp.ndarray  # i32
    best_hypothesis: jnp.ndarray  # i32 index of winning minimal sample


def ransac_rigid(
    key: jax.Array,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    *,
    threshold: float = 0.05,
    confidence: float = 0.99,
    inlier_ratio: float = 0.5,
    sample_size: int = 4,
    num_hypotheses: Optional[int] = None,
    weights: Optional[jnp.ndarray] = None,
    sample_mask: Optional[jnp.ndarray] = None,
) -> RansacResult:
    """Robust SE(3) fit of ``dst ~= T @ src`` under outliers.

    src, dst : (N, 3) corresponded points.
    threshold : inlier distance in meters.
    num_hypotheses : static hypothesis count; default from the reference's
        confidence formula.
    sample_mask : optional (N,) bool — rows eligible for minimal samples.
        With fixed-shape masked inputs (invalid rows present as padding),
        sampling MUST be restricted to real rows or hypothesis quality
        collapses as the valid fraction drops (the reference compacted its
        match arrays before RANSAC; the mask replaces that compaction).

    All hypotheses are fit and scored in parallel; the one with the most
    inliers wins and its consensus set is refit (weighted, if ``weights``).
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    n = src.shape[0]
    if num_hypotheses is None:
        num_hypotheses = max_samples_by_confidence(
            confidence, sample_size, inlier_ratio
        )

    keys = jax.random.split(key, num_hypotheses)
    if sample_mask is not None:
        raw = sample_mask.astype(jnp.float32)
        total = jnp.sum(raw)
        # All-invalid input degenerates to uniform sampling (the fit's
        # validity gates reject the result downstream anyway); p must
        # still be a proper distribution.
        probs = jnp.where(total > 0.0, raw / jnp.maximum(total, 1.0), 1.0 / n)
    else:
        probs = None

    def one_hypothesis(k):
        idx = jax.random.choice(k, n, shape=(sample_size,), replace=False, p=probs)
        fit = fit_rigid_svd(src[idx], dst[idx])
        moved = src @ fit.transform[:3, :3].T + fit.transform[:3, 3]
        dist = jnp.linalg.norm(moved - dst, axis=-1)
        inl = (dist < threshold) & fit.valid
        return inl, jnp.sum(inl.astype(jnp.int32))

    inlier_masks, counts = jax.vmap(one_hypothesis)(keys)
    best = jnp.argmax(counts)
    inliers = inlier_masks[best]

    w = inliers.astype(jnp.float32)
    if weights is not None:
        w = w * jnp.asarray(weights, jnp.float32)
    final = fit_rigid_svd(src, dst, w)
    final = RigidFit(
        transform=final.transform,
        rmse=final.rmse,
        valid=final.valid & (counts[best] >= sample_size),
    )
    return RansacResult(
        fit=final,
        inliers=inliers,
        inlier_count=counts[best],
        best_hypothesis=best.astype(jnp.int32),
    )
