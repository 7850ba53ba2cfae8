"""Windowed pose-graph optimization (motion-only bundle adjustment).

New scope beyond the reference (north star, BASELINE.json config 4): the
reference composes each frame-to-frame estimate into the trajectory and
never revisits it (``base_dense_visual_odometry.py:72-79``), so drift
accumulates unchecked.  Here keyframe poses in a sliding window are jointly
re-optimized against all pairwise relative-pose measurements, each weighted
by the information matrix (J^T W J) the photometric tracker produced for
that pair — the GN Hessian is exactly the Laplace-approximation information
of the photometric alignment, so this is dense photometric BA marginalized
to poses.

TPU-native design:

- all edges evaluated in one ``vmap``; edge Jacobians are *exact*,
  computed by forward-mode autodiff through the SE(3) exp/log chain (no
  hand-derived approximations, no host branching);
- the (6K, 6K) normal system is assembled with scatter-adds and solved
  with a dense Cholesky — for K <= ~64 keyframes this is a trivial MXU
  problem; the structure mirrors the distributed path where per-device
  edge shards ``psum`` their H/b contributions (see parallel/distributed).
- gauge freedom fixed by a strong prior on pose 0 rather than variable
  elimination (keeps shapes static).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dense_visual_odometry_tpu.utils.lie import se3


class PoseGraphEdges(NamedTuple):
    """E relative-pose constraints between window poses (a pytree).

    measurement[e] is the measured ``X_i^-1 @ X_j`` (maps frame-j camera
    points... i.e. pose of j expressed in i); information[e] the 6x6 weight.
    """

    i: jnp.ndarray  # (E,) i32 source pose index
    j: jnp.ndarray  # (E,) i32 target pose index
    measurement: jnp.ndarray  # (E, 4, 4)
    information: jnp.ndarray  # (E, 6, 6)


class PoseGraphResult(NamedTuple):
    poses: jnp.ndarray  # (K, 4, 4) optimized camera-to-world poses
    chi2: jnp.ndarray  # scalar final weighted squared error
    chi2_history: jnp.ndarray  # (iters,) chi2 per iteration
    iterations: jnp.ndarray  # i32


def edge_residual(
    x_i: jnp.ndarray, x_j: jnp.ndarray, measurement: jnp.ndarray
) -> jnp.ndarray:
    """r = log(Z^-1 @ X_i^-1 @ X_j) — zero when the graph agrees with Z."""
    return se3.log(se3.inverse(measurement) @ se3.inverse(x_i) @ x_j)


def _edge_residual_and_jacobians(x_i, x_j, measurement):
    """Residual + exact 6x6 Jacobians w.r.t. left-multiplicative updates
    ``X <- exp(delta) @ X`` of both endpoint poses, via forward-mode AD."""

    def r_of_deltas(deltas):
        d_i, d_j = deltas[:6], deltas[6:]
        return edge_residual(
            se3.exp(d_i) @ x_i, se3.exp(d_j) @ x_j, measurement
        )

    zero = jnp.zeros(12, dtype=jnp.float32)
    r0 = r_of_deltas(zero)
    jac = jax.jacfwd(r_of_deltas)(zero)  # (6, 12)
    return r0, jac[:, :6], jac[:, 6:]


def build_normal_system(
    poses: jnp.ndarray,
    edges: PoseGraphEdges,
    k: int,
    robust_delta: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Linearize all edges at ``poses`` -> (chi2, H (K,K,6,6), b (K,6)).

    Pure and additive over edges — a shard of the edge set produces a
    partial system that sums (``psum``) with other shards' into the full
    one; this is what the distributed backend reduces over the mesh
    (parallel/distributed.py).  Edges with zero information contribute
    exactly nothing, so device-count padding is free.

    ``robust_delta`` applies a redescending Geman-McClure kernel per
    edge: weight ``(d^2 / (d^2 + chi^2))^2`` with chi the Mahalanobis
    error sqrt(r^T Omega r) — gross-outlier loop closures are driven to
    ~zero weight instead of merely softened (a Huber kernel still drags
    the graph linearly, which one bad closure exploits).
    """
    x_i = poses[edges.i]
    x_j = poses[edges.j]
    r, j_i, j_j = jax.vmap(_edge_residual_and_jacobians)(
        x_i, x_j, edges.measurement
    )
    omega = edges.information
    if robust_delta is not None:
        chi_sq = jnp.maximum(jnp.einsum("ea,eab,eb->e", r, omega, r), 1e-12)
        d_sq = robust_delta * robust_delta
        w = (d_sq / (d_sq + chi_sq)) ** 2
        omega = omega * w[:, None, None]
    # chi2 and per-edge weighted Jacobians.
    omega_r = jnp.einsum("eab,eb->ea", omega, r)
    chi2 = jnp.sum(r * omega_r)

    # Assemble H (K,K,6,6) and b (K,6) with scatter-adds.
    h_ii = jnp.einsum("eai,eab,ebj->eij", j_i, omega, j_i)
    h_jj = jnp.einsum("eai,eab,ebj->eij", j_j, omega, j_j)
    h_ij = jnp.einsum("eai,eab,ebj->eij", j_i, omega, j_j)
    b_i = jnp.einsum("eai,ea->ei", j_i, omega_r)
    b_j = jnp.einsum("eai,ea->ei", j_j, omega_r)

    hess = jnp.zeros((k, k, 6, 6), jnp.float32)
    hess = hess.at[edges.i, edges.i].add(h_ii)
    hess = hess.at[edges.j, edges.j].add(h_jj)
    hess = hess.at[edges.i, edges.j].add(h_ij)
    hess = hess.at[edges.j, edges.i].add(jnp.swapaxes(h_ij, -1, -2))
    rhs = jnp.zeros((k, 6), jnp.float32)
    rhs = rhs.at[edges.i].add(-b_i)
    rhs = rhs.at[edges.j].add(-b_j)
    return chi2, hess, rhs


def solve_normal_system(
    hess: jnp.ndarray,
    rhs: jnp.ndarray,
    gauge: jnp.ndarray,
    damping: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(K,K,6,6), (K,6) -> per-pose update deltas (K,6) + ok flag."""
    k = rhs.shape[0]
    dim = 6 * k
    hmat = jnp.transpose(hess, (0, 2, 1, 3)).reshape(dim, dim)
    hmat = hmat + jnp.diag(gauge.reshape(dim))
    hmat = hmat + damping * (1.0 + jnp.trace(hmat) / dim) * jnp.eye(
        dim, dtype=jnp.float32
    )
    delta = jax.scipy.linalg.solve(hmat, rhs.reshape(dim), assume_a="pos").reshape(k, 6)
    ok = jnp.all(jnp.isfinite(delta))
    return jnp.where(ok, delta, 0.0), ok


@functools.partial(
    jax.jit, static_argnames=("max_iterations", "robust_delta")
)
def optimize_pose_graph(
    poses: jnp.ndarray,
    edges: PoseGraphEdges,
    max_iterations: int = 10,
    tolerance: float = 1e-9,
    gauge_weight: float = 1e6,
    damping: float = 1e-6,
    robust_delta: Optional[float] = None,
) -> PoseGraphResult:
    """Gauss-Newton over the window; everything on-device.

    poses : (K, 4, 4) initial camera-to-world poses.
    robust_delta : optional Huber threshold on per-edge Mahalanobis error
        (outlier-edge protection; see ``build_normal_system``).
    """
    k = poses.shape[0]
    dim = 6 * k

    def evaluate(ps):
        return build_normal_system(ps, edges, k, robust_delta)

    gauge = jnp.zeros((k, 6), jnp.float32).at[0].set(gauge_weight)

    def body(_, carry):
        ps, chi2_hist, it, done = carry
        chi2, hess, rhs = evaluate(ps)
        delta, ok = solve_normal_system(hess, rhs, gauge, damping)
        new_ps = jnp.where(done | ~ok, ps, jax.vmap(se3.exp)(delta) @ ps)
        chi2_hist = chi2_hist.at[it].set(chi2)
        prev = jnp.where(it > 0, chi2_hist[jnp.maximum(it - 1, 0)], jnp.inf)
        new_done = done | ~ok | (jnp.abs(prev - chi2) < tolerance)
        # `iterations` reports iterations that actually updated poses.
        return new_ps, chi2_hist, jnp.where(done, it, it + 1), new_done

    init = (
        poses,
        jnp.full((max_iterations,), jnp.inf, jnp.float32),
        jnp.int32(0),
        jnp.bool_(False),
    )
    ps, hist, iters, _ = jax.lax.fori_loop(0, max_iterations, body, init)
    final_chi2, _, _ = evaluate(ps)
    return PoseGraphResult(
        poses=ps, chi2=final_chi2, chi2_history=hist, iterations=iters
    )


def odometry_chain_edges(
    transforms: jnp.ndarray, informations: Optional[jnp.ndarray] = None
) -> PoseGraphEdges:
    """Sequential-odometry edges from tracker outputs.

    transforms[t] is the tracker's frame-(t)->frame-(t+1) camera transform
    (its ``TrackResult.transform``); the induced relative *pose* is its
    inverse: ``X_t^-1 @ X_{t+1} = transform^-1``.
    """
    n = transforms.shape[0]
    if informations is None:
        informations = jnp.broadcast_to(
            jnp.eye(6, dtype=jnp.float32), (n, 6, 6)
        ).astype(jnp.float32)
    return PoseGraphEdges(
        i=jnp.arange(n, dtype=jnp.int32),
        j=jnp.arange(1, n + 1, dtype=jnp.int32),
        measurement=jax.vmap(se3.inverse)(transforms),
        information=informations,
    )


def concat_edges(*edge_sets: PoseGraphEdges) -> PoseGraphEdges:
    return PoseGraphEdges(
        i=jnp.concatenate([e.i for e in edge_sets]),
        j=jnp.concatenate([e.j for e in edge_sets]),
        measurement=jnp.concatenate([e.measurement for e in edge_sets]),
        information=jnp.concatenate([e.information for e in edge_sets]),
    )
