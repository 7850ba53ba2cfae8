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
    centers_curr: Optional[jnp.ndarray] = None,
) -> Matches:
    """ZNCC template matching of ``patch`` x ``patch`` windows around each
    previous-frame corner against a (2*search+1)^2 window in the current
    frame.  Fully vectorized: one (K, P^2) x (K, S^2, P^2) correlation.

    ``centers_curr`` recenters each search window at a predicted
    current-frame location (e.g. a learned coarse match) instead of the
    corner's own coordinates — the fine stage of a coarse-to-fine
    matcher.
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
    cc = (
        c if centers_curr is None
        else jnp.round(centers_curr).astype(jnp.int32)
    )  # search-window centers in the current frame

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
    cand_uv = cc[:, None, None, :] + search_off[None, :, None, :] + patch_off[None, None, :, :]
    cand = take(gray_curr, cand_uv)
    cand = cand - cand.mean(axis=-1, keepdims=True)
    cand_norm = jnp.sqrt(jnp.sum(cand * cand, axis=-1) + 1e-6)

    zncc = jnp.einsum("kp,ksp->ks", tpl, cand) / (tpl_norm[:, None] * cand_norm)
    best = jnp.argmax(zncc, axis=-1)  # (K,)
    best_score = jnp.take_along_axis(zncc, best[:, None], axis=-1)[:, 0]

    # Subpixel peak: 1-D quadratic fits through the ZNCC neighbours of the
    # winning offset along each axis (standard parabola interpolation).
    # Integer-quantized matches cost ~0.5 px ~ z/fx meters of triangulated
    # error each; the refinement recovers most of it.
    s_dim = 2 * search + 1
    zgrid = zncc.reshape(k, s_dim, s_dim)
    by = best // s_dim
    bx = best % s_dim
    rows = jnp.arange(k)

    def neighbor(dy_, dx_):
        return zgrid[
            rows,
            jnp.clip(by + dy_, 0, s_dim - 1),
            jnp.clip(bx + dx_, 0, s_dim - 1),
        ]

    zc = best_score

    def parabola(zm, zp, interior):
        denom = zm - 2.0 * zc + zp
        off = jnp.where(
            jnp.abs(denom) > 1e-9, 0.5 * (zm - zp) / denom, 0.0
        )
        return jnp.where(interior, jnp.clip(off, -0.5, 0.5), 0.0)

    sub_dx = parabola(
        neighbor(0, -1), neighbor(0, 1), (bx > 0) & (bx < s_dim - 1)
    )
    sub_dy = parabola(
        neighbor(-1, 0), neighbor(1, 0), (by > 0) & (by < s_dim - 1)
    )
    subpixel = jnp.stack([sub_dx, sub_dy], axis=-1)

    uv_curr = (
        cc.astype(jnp.float32) + search_off[best].astype(jnp.float32) + subpixel
    )
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


def refine_reprojection(
    transform0: jnp.ndarray,
    pts_prev: jnp.ndarray,
    uv_curr: jnp.ndarray,
    weights: jnp.ndarray,
    intrinsics: jnp.ndarray,
    iterations: int = 8,
    huber_px: float = 2.0,
) -> jnp.ndarray:
    """Motion-only reprojection refinement (sparse Gauss-Newton PnP).

    The 3-D/3-D Procrustes fit inherits BOTH frames' depth noise — on
    RGB-D sensors the depth quantization (~1 cm at 2 m) dwarfs the
    matcher's subpixel accuracy.  Minimizing the 2-D reprojection error
    ``pi(T X_prev) - uv_curr`` uses depth from the previous frame only
    and weights residuals in pixel units where the matcher is precise.

    pts_prev : (K, 3) previous-camera 3-D points; uv_curr (K, 2) matched
    pixels; weights (K,) (0 disables a row).  Returns the refined (4, 4).
    """
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]

    def body(_, t):
        pts = pts_prev @ t[:3, :3].T + t[:3, 3]
        z = pts[:, 2]
        ok = (z > 1e-6) & (weights > 0.0)
        z_safe = jnp.where(ok, z, 1.0)
        u = fx * pts[:, 0] / z_safe + cx
        v = fy * pts[:, 1] / z_safe + cy
        r = jnp.stack([u - uv_curr[:, 0], v - uv_curr[:, 1]], axis=-1)
        r = jnp.where(ok[:, None], r, 0.0)
        # Huber in pixel units.
        rn = jnp.linalg.norm(r, axis=-1)
        w_h = jnp.where(rn <= huber_px, 1.0, huber_px / jnp.maximum(rn, 1e-9))
        w = weights * w_h * ok.astype(jnp.float32)
        # 2x6 reprojection Jacobian rows (standard pinhole + left-mult.
        # twist, same closed form as the dense warp Jacobian).
        inv_z = 1.0 / z_safe
        x, y = pts[:, 0], pts[:, 1]
        zeros = jnp.zeros_like(z)
        ju = fx * jnp.stack(
            [inv_z, zeros, -x * inv_z * inv_z,
             -x * y * inv_z * inv_z, 1.0 + x * x * inv_z * inv_z,
             -y * inv_z],
            axis=-1,
        )
        jv = fy * jnp.stack(
            [zeros, inv_z, -y * inv_z * inv_z,
             -(1.0 + y * y * inv_z * inv_z), x * y * inv_z * inv_z,
             x * inv_z],
            axis=-1,
        )
        hess = (
            jnp.einsum("k,ki,kj->ij", w, ju, ju)
            + jnp.einsum("k,ki,kj->ij", w, jv, jv)
        )
        rhs = -(
            jnp.einsum("k,ki->i", w * r[:, 0], ju)
            + jnp.einsum("k,ki->i", w * r[:, 1], jv)
        )
        damp = 1e-8 * (1.0 + jnp.trace(hess))
        delta = jnp.linalg.solve(
            hess + damp * jnp.eye(6, dtype=jnp.float32), rhs
        )
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, 0.0)
        from dense_visual_odometry_tpu.utils.lie import se3

        return se3.exp(delta) @ t

    return jax.lax.fori_loop(0, iterations, body, transform0)


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
    depth_edge_tol: float = 0.05,
    refine_iterations: int = 8,
    refine_huber_px: float = 2.0,
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
        flat = depth.reshape(-1)
        z = flat[vi * w + ui]
        # Depth-edge gate: corners concentrate on depth discontinuities,
        # where +-1 px of match error flips the point between foreground
        # and background (centimeters of 3-D error).  Reject matches whose
        # 3x3 depth neighbourhood is inconsistent.
        zmin = jnp.full_like(z, jnp.inf)
        zmax = jnp.zeros_like(z)
        for dv_ in (-1, 0, 1):
            for du_ in (-1, 0, 1):
                un = jnp.clip(ui + du_, 0, w - 1)
                vn = jnp.clip(vi + dv_, 0, h - 1)
                zn = flat[vn * w + un]
                pos = zn > 0.0
                zmin = jnp.where(pos, jnp.minimum(zmin, zn), zmin)
                zmax = jnp.where(pos, jnp.maximum(zmax, zn), zmax)
        flat_depth = (zmax - zmin) <= depth_edge_tol * jnp.maximum(z, 0.5)
        x = (uv[:, 0] - cx) / fx * z
        y = (uv[:, 1] - cy) / fy * z
        return jnp.stack([x, y, z], axis=-1), (z > 0.0) & flat_depth

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
    # Motion-only reprojection polish on the RANSAC inliers: pixel-space
    # residuals sidestep the current frame's depth noise entirely (the
    # dominant error of the 3-D/3-D fit on RGB-D quantized depth).
    w_refine = (
        matches.confidence
        * (valid & result.inliers).astype(jnp.float32)
    )
    refined = refine_reprojection(
        result.fit.transform, pts_prev, matches.uv_curr, w_refine, intrinsics,
        iterations=refine_iterations, huber_px=refine_huber_px,
    )
    refined_ok = jnp.all(jnp.isfinite(refined))
    transform = jnp.where(refined_ok, refined, result.fit.transform)
    return SparseResult(
        transform=transform,
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
    cycle_tolerance: Optional[float] = 1.5,
    **fit_kwargs,
) -> SparseResult:
    """Full sparse alignment of one frame pair (jit-able end to end).

    ``cycle_tolerance`` enables forward-backward consistency: each match
    is re-matched from the current frame back to the previous one and
    kept only if the round trip lands within this many pixels of the
    original corner (classic mutual-consistency outlier filter; None
    disables).
    """
    corners, scores = harris_corners(gray_prev, k=num_corners)
    matches = match_patches(gray_prev, gray_curr, corners)
    matches = matches._replace(valid=matches.valid & (scores >= min_corner_score))
    if cycle_tolerance is not None:
        back = match_patches(gray_curr, gray_prev, matches.uv_curr)
        cycle_err = jnp.linalg.norm(back.uv_curr - matches.uv_prev, axis=-1)
        matches = matches._replace(
            valid=matches.valid & back.valid & (cycle_err <= cycle_tolerance)
        )
    return fit_from_matches(
        key, matches, depth_prev_m, depth_curr_m, intrinsics, **fit_kwargs
    )


class SparseVO:
    """Frame-to-frame sparse odometry session (LoFTRDVO.step parity).

    Defaults are the bundled-set-validated operating point (ATE 3.9 mm vs
    7.7 mm with the round-1 settings): 1024 corners, depth-edge gating,
    subpixel ZNCC peaks and motion-only reprojection refinement.
    """

    def __init__(
        self,
        camera: CameraModel,
        seed: int = 0,
        matcher: str = "zncc",
        matcher_weights=None,
        **kwargs,
    ):
        """``matcher``: "zncc" (Harris + ZNCC, default) or "learned"
        (LoFTR-lite coarse network + ZNCC fine stage,
        :mod:`dense_visual_odometry_tpu.models.matcher`;
        ``matcher_weights`` overrides the committed checkpoint path)."""
        self.camera = camera
        self._key = jax.random.key(seed)
        self._prev: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
        self._pose = jnp.eye(4, dtype=jnp.float32)
        self.last_result: Optional[SparseResult] = None
        if matcher == "learned":
            from dense_visual_odometry_tpu.models import matcher as matcher_mod

            params = matcher_mod.load_params(
                matcher_weights if matcher_weights is not None
                else matcher_mod.DEFAULT_WEIGHTS
            )
            kwargs = {"depth_edge_tol": 0.03, **kwargs}
            self._kwargs = kwargs
            self._jit_track = jax.jit(
                lambda key, gp, dp, gc, dc, k: matcher_mod.track_sparse_learned(
                    key, params, gp, dp, gc, dc, k, **kwargs
                )
            )
        else:
            kwargs = {"num_corners": 1024, "depth_edge_tol": 0.03, **kwargs}
            self._kwargs = kwargs
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
