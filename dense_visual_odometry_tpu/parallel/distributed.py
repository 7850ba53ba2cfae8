"""Distributed windowed bundle adjustment over a device mesh.

North-star scope (BASELINE.json config 5) with no reference counterpart:
the pose-graph normal system is additive over edges
(``posegraph.build_normal_system``), so the edge set shards across the
mesh, every device linearizes its shard locally, and one ``psum`` over the
mesh axis reduces the (K,6,K,6) Hessian + (K,6) rhs into the replicated
global system — the Schur-complement-style "reduce the landmark/edge
blocks, solve the small pose system everywhere" pattern.  The 6K x 6K
solve is then computed redundantly on every device (cheaper than sharding
a tiny Cholesky) and poses stay replicated.

Expressed with ``shard_map`` so the collective is explicit and rides ICI;
on multi-host slices the same code runs under ``jax.distributed``
initialization with a global mesh (hosts see only their addressable
shards; ``psum`` spans hosts over DCN transparently).

Zero-information padding edges make any edge count divisible by the mesh.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35 exposes shard_map at the top level
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from dense_visual_odometry_tpu.models.posegraph import (
    PoseGraphEdges,
    PoseGraphResult,
    build_normal_system,
    solve_normal_system,
)
from dense_visual_odometry_tpu.utils.lie import se3

BATCH_AXIS = "data"


def pad_edges(edges: PoseGraphEdges, multiple: int) -> PoseGraphEdges:
    """Pad the edge set with zero-information self-edges (no-ops) so the
    edge count divides ``multiple``."""
    e = edges.i.shape[0]
    rem = (-e) % multiple
    if rem == 0:
        return edges
    zero4 = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (rem, 4, 4))
    return PoseGraphEdges(
        i=jnp.concatenate([edges.i, jnp.zeros((rem,), jnp.int32)]),
        j=jnp.concatenate([edges.j, jnp.zeros((rem,), jnp.int32)]),
        measurement=jnp.concatenate([edges.measurement, zero4]),
        information=jnp.concatenate(
            [edges.information, jnp.zeros((rem, 6, 6), jnp.float32)]
        ),
    )


def optimize_pose_graph_sharded(
    mesh: Mesh,
    poses: jnp.ndarray,
    edges: PoseGraphEdges,
    max_iterations: int = 10,
    tolerance: float = 1e-9,
    gauge_weight: float = 1e6,
    damping: float = 1e-6,
    axis_name: str = BATCH_AXIS,
) -> PoseGraphResult:
    """Same semantics as ``optimize_pose_graph`` with edges sharded over
    ``mesh``; poses replicated.  Works on any 1-D mesh (real multi-chip or
    the 8-device CPU simulation)."""
    n_dev = mesh.devices.size
    edges = pad_edges(edges, n_dev)
    k = poses.shape[0]

    edge_specs = PoseGraphEdges(
        i=P(axis_name), j=P(axis_name),
        measurement=P(axis_name), information=P(axis_name),
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), edge_specs),
        out_specs=(P(), P(), P()),
    )
    def global_system(ps, edge_shard):
        chi2, hess, rhs = build_normal_system(ps, edge_shard, k)
        return jax.lax.psum((chi2, hess, rhs), axis_name)

    gauge = jnp.zeros((k, 6), jnp.float32).at[0].set(gauge_weight)

    @functools.partial(jax.jit, static_argnames=())
    def run(poses, edges):
        def body(_, carry):
            ps, chi2_hist, it, done = carry
            chi2, hess, rhs = global_system(ps, edges)
            delta, ok = solve_normal_system(hess, rhs, gauge, damping)
            new_ps = jnp.where(done | ~ok, ps, jax.vmap(se3.exp)(delta) @ ps)
            chi2_hist = chi2_hist.at[it].set(chi2)
            prev = jnp.where(it > 0, chi2_hist[jnp.maximum(it - 1, 0)], jnp.inf)
            new_done = done | ~ok | (jnp.abs(prev - chi2) < tolerance)
            # Freeze the iteration count once converged so the reported
            # count matches the single-device optimize_pose_graph.
            return new_ps, chi2_hist, jnp.where(done, it, it + 1), new_done

        init = (
            poses,
            jnp.full((max_iterations,), jnp.inf, jnp.float32),
            jnp.int32(0),
            jnp.bool_(False),
        )
        ps, hist, iters, _ = jax.lax.fori_loop(0, max_iterations, body, init)
        chi2, _, _ = global_system(ps, edges)
        return PoseGraphResult(
            poses=ps, chi2=chi2, chi2_history=hist, iterations=iters
        )

    # Place the edge shards / replicate poses before entry.
    sharded_edges = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        edges,
        edge_specs,
    )
    poses = jax.device_put(poses, NamedSharding(mesh, P()))
    return run(poses, sharded_edges)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Multi-host bring-up: ``jax.distributed.initialize`` wrapper.

    On a real multi-host TPU slice the arguments come from the launcher
    environment (or are auto-detected on Cloud TPU); returns
    (process_index, device_count).  Single-host no-op when no coordinator
    is configured.
    """
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.device_count()
