"""Global bundle adjustment sharded over a device mesh.

The CG solver's heavy work is entirely observation-wise (Jacobian blocks,
Schur matvecs, robust costs are gathers/einsums/scatter-adds over the O
axis), so it data-parallelizes cleanly: shard the observation arrays across
the mesh, replicate poses/points, and turn every O-axis reduction into a
local scatter-add + `psum` (ops/optim.bundle_adjustment_cg's `axis_name`
hooks). Poses/points/CG scalars stay replicated, so each LM/CG step costs
two (P,6)+(M,3) psums over ICI — tiny next to the per-device O/D einsums.

The reference's only BA parallelism is Ceres `options.num_threads = 4`
(CeresOptimizer.cc:516); this scales the same solve over a TPU pod slice.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ceres_mono_orb_slam2_tpu.ops import optim, sim3opt


def bundle_adjustment_cg_sharded(
    mesh: Mesh,
    axis: str,
    K, R, t, points,
    obs_pose, obs_point, obs_uv, obs_inv_sigma2, obs_valid,
    fixed_pose, point_valid,
    iters: int = 20,
    cg_iters: int = 50,
    robust: bool = True,
) -> optim.BAResult:
    """Run bundle_adjustment_cg with the observation axis sharded over
    `mesh[axis]`. Observation array lengths must be divisible by the axis
    size (callers already pad to power-of-two buckets; pad `obs_valid` with
    False rows). Returns the same BAResult as the single-device solver, with
    replicated R/t/points and the inlier mask sharded over observations."""
    n = mesh.shape[axis]
    O = obs_pose.shape[0]
    if O % n != 0:
        raise ValueError(f"observation count {O} not divisible by mesh axis {n}")

    rep = P()
    obs = P(axis)
    fn = partial(
        optim.bundle_adjustment_cg,
        iters=iters, cg_iters=cg_iters, robust=robust, axis_name=axis,
    )
    sharded = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(rep, rep, rep, rep, obs, obs, obs, obs, obs, rep, rep),
        out_specs=optim.BAResult(R=rep, t=rep, points=rep, inlier_obs=obs, cost=rep),
        check_vma=False,
    )
    return sharded(
        jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), jnp.asarray(points),
        jnp.asarray(obs_pose), jnp.asarray(obs_point), jnp.asarray(obs_uv),
        jnp.asarray(obs_inv_sigma2), jnp.asarray(obs_valid),
        jnp.asarray(fixed_pose), jnp.asarray(point_valid),
    )


def optimize_essential_graph_sharded(
    mesh: Mesh,
    axis: str,
    R, t, s,
    edge_i, edge_j, Rm, tm, sm, edge_valid, fixed,
    gn_iters: int = 30,
    cg_iters: int = 100,
) -> sim3opt.EssentialGraphResult:
    """Run optimize_essential_graph with the EDGE axis sharded over
    `mesh[axis]` (reference analogue: CeresOptimizer::OptimizeEssentialGraph,
    CeresOptimizer.cc:737-957, which Ceres solves single-threaded). The
    (P, 7) sim3 vertex state is replicated; each GN/PCG step reduces the
    per-edge scatters with a `psum` over ICI. Edge array lengths must be
    divisible by the axis size (pad `edge_valid` with False rows)."""
    n = mesh.shape[axis]
    E = edge_i.shape[0]
    if E % n != 0:
        raise ValueError(f"edge count {E} not divisible by mesh axis {n}")

    rep = P()
    edge = P(axis)
    fn = partial(
        sim3opt.optimize_essential_graph,
        gn_iters=gn_iters, cg_iters=cg_iters, axis_name=axis,
    )
    sharded = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(rep, rep, rep, edge, edge, edge, edge, edge, edge, rep),
        out_specs=sim3opt.EssentialGraphResult(R=rep, t=rep, s=rep, cost=rep),
        check_vma=False,
    )
    return sharded(
        jnp.asarray(R), jnp.asarray(t), jnp.asarray(s),
        jnp.asarray(edge_i), jnp.asarray(edge_j), jnp.asarray(Rm),
        jnp.asarray(tm), jnp.asarray(sm), jnp.asarray(edge_valid),
        jnp.asarray(fixed),
    )
