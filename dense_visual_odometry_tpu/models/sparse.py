"""Sparse feature-based visual odometry (the reference's alternative path).

Capability parity with the reference's disabled LoFTR pipeline
(``/root/reference/src/dense_visual_odometry/core/loftr.py``, disabled at
``core/__init__.py:1,10``): match 2-D features between frames, deproject
matches through depth, robust rigid-body fit (weighted Procrustes inside
RANSAC), RMSE gate.  The reference's matcher is a torch/kornia deep network
(loftr.py:31-54); per SURVEY §7.9 the *geometric* half is the required
capability — this module supplies it, plus a self-contained, jit-native
classical matcher (Harris corners + ZNCC patch correlation) so the sparse
pipeline runs end-to-end with no torch dependency:

- :func:`harris_corners` — fixed-K corner selection (top-K scores, static
  shapes — XLA-friendly ranking instead of NMS loops);
- :func:`match_patches` — ZNCC correlation of corner patches against a
  local search window in the next frame, one fused einsum;
- :func:`fit_from_matches` — depth-validity filtering, deprojection,
  RANSAC rigid fit, confidence/min-match/RMSE gating exactly mirroring the
  reference's checks (loftr.py:236-258, 211-220);
- :class:`SparseVO` — frame-to-frame session mirroring ``LoFTRDVO.step``.

External matchers (a deep net, external keypoints) can inject matches
directly into :func:`fit_from_matches` — the interface is plain arrays.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dense_visual_odometry_tpu.camera import CameraModel
from dense_visual_odometry_tpu.ops.gradients import sobel
from dense_visual_odometry_tpu.utils.ransac import ransac_rigid
from dense_visual_odometry_tpu.utils.rigid import RigidFit


class Matches(NamedTuple):
    """Corresponded pixel coordinates + confidence, fixed-size w/ validity."""

    uv_prev: jnp.ndarray  # (K, 2) float32 (u, v) in the previous frame
    uv_curr: jnp.ndarray  # (K, 2) float32 in the current frame
    confidence: jnp.ndarray  # (K,) float32 in [0, 1]
    valid: jnp.ndarray  # (K,) bool


class SparseResult(NamedTuple):
    transform: jnp.ndarray  # (4, 4) prev-cam -> curr-cam
    success: jnp.ndarray  # bool
    rmse: jnp.ndarray  # f32 final fit RMSE (meters)
    inlier_count: jnp.ndarray  # i32


def harris_corners(
    gray: jnp.ndarray, k: int = 256, border: int = 8, kappa: float = 0.04
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-``k`` Harris corners of an (H, W) image.

    Returns ((k, 2) float (u, v) coordinates, (k,) scores).  Static output
    size: weak images simply return low-score corners (callers threshold
    via the scores).  5x5 box-summed structure tensor; ranking by global
    top-k replaces data-dependent non-max suppression.
    """
    h, w = gray.shape[-2:]
    gx, gy = sobel(gray)
    gx, gy = gx / 8.0, gy / 8.0

    # 5x5 box filter as two separable shifted-plane sums (XLA fuses).
    def box(x):
        p = jnp.pad(x, ((2, 2), (2, 2)))
        vert = sum(p[i : i + h, 2 : 2 + w] for i in range(5))
        p2 = jnp.pad(vert, ((0, 0), (2, 2)))
        return sum(p2[:, i : i + w] for i in range(5))

    ixx, iyy, ixy = box(gx * gx), box(gy * gy), box(gx * gy)
    det = ixx * iyy - ixy * ixy
    tr = ixx + iyy
    score = det - kappa * tr * tr

    # Suppress borders (patch extraction needs margin).
    v_idx = jnp.arange(h)[:, None]
    u_idx = jnp.arange(w)[None, :]
    inside = (
        (v_idx >= border) & (v_idx < h - border)
        & (u_idx >= border) & (u_idx < w - border)
    )
    score = jnp.where(inside, score, -jnp.inf)

    # Cheap spatial spreading: keep the max per 8x8 cell, then global top-k
    # (one corner per cell at most — approximates NMS with static shapes).
    ch, cw = h // 8, w // 8
    cells = score[: ch * 8, : cw * 8].reshape(ch, 8, cw, 8)
    cell_max = cells.max(axis=(1, 3), keepdims=True)
    is_cell_max = (cells == cell_max) & (cells > -jnp.inf)
    spread = jnp.where(is_cell_max, cells, -jnp.inf).reshape(ch * 8, cw * 8)
    spread = jnp.pad(
        spread, ((0, h - ch * 8), (0, w - cw * 8)), constant_values=-jnp.inf
    )

    flat = spread.reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat, k)
    vs = (top_idx // w).astype(jnp.float32)
    us = (top_idx % w).astype(jnp.float32)
    return jnp.stack([us, vs], axis=-1), top_scores


def match_patches(
    gray_prev: jnp.ndarray,
    gray_curr: jnp.ndarray,
    corners_prev: jnp.ndarray,
    *,
    patch: int = 7,
    search: int = 12,
    min_zncc: float = 0.6,
) -> Matches:
    """ZNCC template matching of ``patch`` x ``patch`` windows around each
    previous-frame corner against a (2*search+1)^2 window in the current
    frame.  Fully vectorized: one (K, P^2) x (K, S^2, P^2) correlation.
    """
    half = patch // 2
    k = corners_prev.shape[0]
    h, w = gray_prev.shape[-2:]

    dy, dx = jnp.meshgrid(
        jnp.arange(-half, half + 1), jnp.arange(-half, half + 1), indexing="ij"
    )
    patch_off = jnp.stack([dx.ravel(), dy.ravel()], axis=-1)  # (P^2, 2) (u,v)

    sy, sx = jnp.meshgrid(
        jnp.arange(-search, search + 1),
        jnp.arange(-search, search + 1),
        indexing="ij",
    )
    search_off = jnp.stack([sx.ravel(), sy.ravel()], axis=-1)  # (S^2, 2)

    c = jnp.round(corners_prev).astype(jnp.int32)  # (K, 2) (u, v)

    def take(img, uv):
        u = jnp.clip(uv[..., 0], 0, w - 1)
        v = jnp.clip(uv[..., 1], 0, h - 1)
        return img.reshape(-1)[v * w + u]

    # Template patches: (K, P^2)
    tpl_uv = c[:, None, :] + patch_off[None, :, :]
    tpl = take(gray_prev, tpl_uv)
    tpl = tpl - tpl.mean(axis=-1, keepdims=True)
    tpl_norm = jnp.sqrt(jnp.sum(tpl * tpl, axis=-1) + 1e-6)

    # Candidate patches: (K, S^2, P^2)
    cand_uv = c[:, None, None, :] + search_off[None, :, None, :] + patch_off[None, None, :, :]
    cand = take(gray_curr, cand_uv)
    cand = cand - cand.mean(axis=-1, keepdims=True)
    cand_norm = jnp.sqrt(jnp.sum(cand * cand, axis=-1) + 1e-6)

    zncc = jnp.einsum("kp,ksp->ks", tpl, cand) / (tpl_norm[:, None] * cand_norm)
    best = jnp.argmax(zncc, axis=-1)  # (K,)
    best_score = jnp.take_along_axis(zncc, best[:, None], axis=-1)[:, 0]

    uv_curr = c.astype(jnp.float32) + search_off[best].astype(jnp.float32)
    in_bounds = (
        (uv_curr[:, 0] >= half) & (uv_curr[:, 0] < w - half)
        & (uv_curr[:, 1] >= half) & (uv_curr[:, 1] < h - half)
    )
    valid = (best_score >= min_zncc) & in_bounds
    return Matches(
        uv_prev=corners_prev.astype(jnp.float32),
        uv_curr=uv_curr,
        confidence=best_score,
        valid=valid,
    )


def fit_from_matches(
    key: jax.Array,
    matches: Matches,
    depth_prev_m: jnp.ndarray,
    depth_curr_m: jnp.ndarray,
    intrinsics: jnp.ndarray,
    *,
    min_matches: int = 12,
    ransac_threshold: float = 0.05,
    max_rmse: float = 0.10,
    num_hypotheses: int = 64,
) -> SparseResult:
    """Matches -> robust SE(3): the reference's LoFTR geometric tail
    (loftr.py:236-268 depth gating + deprojection, 60-106 RANSAC fit,
    211-220 RMSE gate) with masks instead of compaction.
    """
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    h, w = depth_prev_m.shape[-2:]

    def deproject(uv, depth):
        ui = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, w - 1)
        vi = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, h - 1)
        z = depth.reshape(-1)[vi * w + ui]
        x = (uv[:, 0] - cx) / fx * z
        y = (uv[:, 1] - cy) / fy * z
        return jnp.stack([x, y, z], axis=-1), z > 0.0

    pts_prev, ok_prev = deproject(matches.uv_prev, depth_prev_m)
    pts_curr, ok_curr = deproject(matches.uv_curr, depth_curr_m)
    valid = matches.valid & ok_prev & ok_curr
    n_valid = jnp.sum(valid.astype(jnp.int32))

    # RANSAC over all rows; invalid rows get zero weight in scoring by
    # collapsing them onto a far sentinel that can never be an inlier.
    sentinel = jnp.float32(1e6)
    src = jnp.where(valid[:, None], pts_prev, sentinel)
    dst = jnp.where(valid[:, None], pts_curr, -sentinel)
    result = ransac_rigid(
        key, src, dst,
        threshold=ransac_threshold,
        num_hypotheses=num_hypotheses,
        weights=matches.confidence * valid.astype(jnp.float32),
        sample_mask=valid,
    )

    success = (
        result.fit.valid
        & (n_valid >= min_matches)
        & (result.fit.rmse <= max_rmse)
        & (result.inlier_count >= min_matches // 2)
    )
    return SparseResult(
        transform=result.fit.transform,
        success=success,
        rmse=result.fit.rmse,
        inlier_count=result.inlier_count,
    )


def track_sparse(
    key: jax.Array,
    gray_prev: jnp.ndarray,
    depth_prev_m: jnp.ndarray,
    gray_curr: jnp.ndarray,
    depth_curr_m: jnp.ndarray,
    intrinsics: jnp.ndarray,
    *,
    num_corners: int = 256,
    min_corner_score: float = 1.0,
    **fit_kwargs,
) -> SparseResult:
    """Full sparse alignment of one frame pair (jit-able end to end)."""
    corners, scores = harris_corners(gray_prev, k=num_corners)
    matches = match_patches(gray_prev, gray_curr, corners)
    matches = matches._replace(valid=matches.valid & (scores >= min_corner_score))
    return fit_from_matches(
        key, matches, depth_prev_m, depth_curr_m, intrinsics, **fit_kwargs
    )


class SparseVO:
    """Frame-to-frame sparse odometry session (LoFTRDVO.step parity)."""

    def __init__(self, camera: CameraModel, seed: int = 0, **kwargs):
        self.camera = camera
        self._kwargs = kwargs
        self._key = jax.random.key(seed)
        self._prev: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
        self._pose = jnp.eye(4, dtype=jnp.float32)
        self.last_result: Optional[SparseResult] = None
        self._jit_track = jax.jit(
            lambda key, gp, dp, gc, dc, k: track_sparse(key, gp, dp, gc, dc, k, **kwargs)
        )

    def step(self, gray, depth_raw):
        from dense_visual_odometry_tpu.ops.pyramid import preprocess_depth
        from dense_visual_odometry_tpu.utils.lie import se3

        gray = jnp.asarray(gray, jnp.float32)
        depth_m = preprocess_depth(jnp.asarray(depth_raw), self.camera.depth_scale)
        if self._prev is None:
            self._prev = (gray, depth_m)
            return self._pose
        self._key, sub = jax.random.split(self._key)
        result = self._jit_track(
            sub, self._prev[0], self._prev[1], gray, depth_m,
            jnp.asarray(self.camera.intrinsics),
        )
        self.last_result = result
        if bool(result.success):
            self._pose = self._pose @ se3.inverse(result.transform)
            self._prev = (gray, depth_m)
        return self._pose
