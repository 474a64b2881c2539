"""Sim(3) optimizers: two-view sim3 refinement and essential-graph solve.

TPU-native equivalents of the reference's loop-closing optimizers:
- OptimizeSim3 (CeresOptimizer.cc:601-735; analytic Sim3ErrorTerm
  CeresOptimizer.h:168-253): 7-dof LM on the relative sim3 between two loop
  keyframes with both projection directions and Huber(sqrt(10)).
- OptimizeEssentialGraph (CeresOptimizer.cc:737-957; BCH-approximate
  Jacobians CeresOptimizer.h:271-328): pose graph over all keyframes as sim3
  elements, residual log(S_ji * S_i * S_j^-1). Instead of a sparse Cholesky,
  the normal equations are solved matrix-free with block-Jacobi
  preconditioned conjugate gradients — every Hv product is two gathers + two
  scatter-adds over the edge list, which is the TPU-friendly shape.

Tangent order everywhere: (upsilon(3), omega(3), sigma) — see ops/lie.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
from functools import partial
import jax.numpy as jnp

from ceres_mono_orb_slam2_tpu.ops import lie
from ceres_mono_orb_slam2_tpu.ops.optim import _proj_jacobian, _project, huber_cost, huber_weight


class Sim3Result(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    s: jnp.ndarray
    inliers: jnp.ndarray  # (N,) both-direction chi2 pass
    n_inliers: jnp.ndarray


@partial(jax.jit, static_argnames=("max_iters", "chi2_th"))
def optimize_sim3(
    K1,
    K2,
    X1,  # (N, 3) matched points in camera-1 frame
    X2,  # (N, 3) matched points in camera-2 frame
    uv1,  # (N, 2) observed pixels in image 1 (matching X2 via S12)
    uv2,  # (N, 2) observed pixels in image 2 (matching X1 via S12^-1)
    inv_sigma1,  # (N,)
    inv_sigma2,  # (N,)
    valid,  # (N,)
    R0,
    t0,
    s0,
    max_iters: int = 15,
    chi2_th: float = 10.0,
) -> Sim3Result:
    """Refine S12 (cam2 -> cam1 similarity) from matched camera-frame points.

    Residuals (reference Sim3ErrorTerm, both directions):
      r1 = uv1 - proj(K1, S12 @ X2),  r2 = uv2 - proj(K2, S12^-1 @ X1)
    Huber(sqrt(10)); LM on the 7-dof left increment.
    """
    delta = jnp.sqrt(jnp.asarray(chi2_th, jnp.float32))

    def residuals(R, t, s):
        q1 = s * (X2 @ R.T) + t  # S12 X2 in cam1
        Ri, ti, si = lie.sim3_inverse(R, t, s)
        q2 = si * (X1 @ Ri.T) + ti  # S12^-1 X1 in cam2
        r1 = uv1 - _project(K1, q1)
        r2 = uv2 - _project(K2, q2)
        return r1, r2, q1, q2

    def cost_fn(R, t, s):
        r1, r2, _, _ = residuals(R, t, s)
        s1 = inv_sigma1 * jnp.sum(r1 * r1, -1)
        s2 = inv_sigma2 * jnp.sum(r2 * r2, -1)
        c = huber_cost(s1, delta) + huber_cost(s2, delta)
        return jnp.sum(jnp.where(valid, c, 0.0))

    def step(carry, _):
        R, t, s, lam, cost = carry
        r1, r2, q1, q2 = residuals(R, t, s)
        s1 = inv_sigma1 * jnp.sum(r1 * r1, -1)
        s2 = inv_sigma2 * jnp.sum(r2 * r2, -1)
        w1 = jnp.where(valid, inv_sigma1 * huber_weight(s1, delta), 0.0)
        w2 = jnp.where(valid, inv_sigma2 * huber_weight(s2, delta), 0.0)

        # direction 1: q1 = exp(d) S12 X2 => dq1/dd = [I | -hat(q1) | q1]
        Jp1 = _proj_jacobian(K1, q1)  # (N,2,3)
        D1 = jnp.concatenate([jnp.broadcast_to(jnp.eye(3, dtype=q1.dtype), q1.shape[:-1] + (3, 3)),
                              -lie.hat(q1), q1[..., None]], axis=-1)  # (N,3,7)
        J1 = -(Jp1 @ D1)  # (N,2,7), dr1/dd
        # direction 2: q2 = (exp(d) S12)^-1 X1 = S12^-1 exp(-d) X1
        # => dq2/dd = -s^-1 R^T [I | -hat(X1) | X1]
        Ri = R.T
        si = 1.0 / s
        D2 = jnp.concatenate([jnp.broadcast_to(jnp.eye(3, dtype=q1.dtype), q1.shape[:-1] + (3, 3)),
                              -lie.hat(X1), X1[..., None]], axis=-1)  # (N,3,7)
        Jp2 = _proj_jacobian(K2, q2)
        J2 = Jp2 @ (si * Ri @ D2)  # dr2/dd = -Jp2 @ dq2/dd = +Jp2 si R^T D2

        H = jnp.einsum("nik,n,nil->kl", J1, w1, J1) + jnp.einsum("nik,n,nil->kl", J2, w2, J2)
        g = -(jnp.einsum("nik,n,ni->k", J1, w1, r1) + jnp.einsum("nik,n,ni->k", J2, w2, r2))
        Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(7, dtype=H.dtype)
        dx = jnp.linalg.solve(Hd, g)
        # scale-increment clamp (reference Sim3Parameterization guards the
        # scale from collapsing, CeresOptimizer.cc:24-47)
        dx = dx.at[6].set(jnp.clip(dx[6], -2.0, 2.0))
        dR, dt, ds = lie.sim3_exp(dx)
        R_new, t_new, s_new = lie.sim3_compose(dR, dt, ds, R, t, s)
        new_cost = cost_fn(R_new, t_new, s_new)
        accept = new_cost < cost
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        s = jnp.where(accept, s_new, s)
        lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-7), jnp.minimum(lam * 4.0, 1e5))
        cost = jnp.where(accept, new_cost, cost)
        return (R, t, s, lam, cost), None

    s0 = jnp.asarray(s0, jnp.float32)
    R0 = lie.so3_project(R0)
    cost0 = cost_fn(R0, t0, s0)
    (R, t, s, _, _), _ = jax.lax.scan(
        step, (R0, t0, s0, jnp.asarray(1e-3, jnp.float32), cost0), None, length=max_iters
    )
    R = lie.so3_project(R)
    r1, r2, _, _ = residuals(R, t, s)
    c1 = inv_sigma1 * jnp.sum(r1 * r1, -1)
    c2 = inv_sigma2 * jnp.sum(r2 * r2, -1)
    inliers = valid & (c1 <= chi2_th) & (c2 <= chi2_th)
    return Sim3Result(R=R, t=t, s=s, inliers=inliers, n_inliers=jnp.sum(inliers.astype(jnp.int32)))


class EssentialGraphResult(NamedTuple):
    R: jnp.ndarray  # (P, 3, 3)
    t: jnp.ndarray  # (P, 3)
    s: jnp.ndarray  # (P,)
    cost: jnp.ndarray


def _edge_residuals(R, t, s, ei, ej, Rm, tm, sm):
    """r_e = log(S_ji * S_i * S_j^-1) for each edge (measurement S_ji)."""
    Ri, ti, si = R[ei], t[ei], s[ei]
    Rj, tj, sj = R[ej], t[ej], s[ej]
    Rji_i, tji_i, sji_i = lie.sim3_compose(Rm, tm, sm, Ri, ti, si)
    Rjinv, tjinv, sjinv = lie.sim3_inverse(Rj, tj, sj)
    Re, te, se = lie.sim3_compose(Rji_i, tji_i, sji_i, Rjinv, tjinv, sjinv)
    return lie.sim3_log(Re, te, se)  # (E, 7)


@partial(jax.jit, static_argnames=("gn_iters", "cg_iters", "axis_name"))
def optimize_essential_graph(
    R,  # (P, 3, 3) initial sim3 rotations (world->camera, s*R|t form)
    t,  # (P, 3)
    s,  # (P,)
    edge_i,  # (E,) int32
    edge_j,  # (E,) int32
    Rm,  # (E, 3, 3) measured S_ji
    tm,  # (E, 3)
    sm,  # (E,)
    edge_valid,  # (E,) bool
    fixed,  # (P,) bool — at least the loop keyframe (reference cc:788-791)
    gn_iters: int = 30,
    cg_iters: int = 100,
    axis_name: str = None,
) -> EssentialGraphResult:
    """Sim3 pose-graph optimization, matrix-free PCG Gauss-Newton.

    Jacobians use the reference's BCH approximation
    (Jr^-1 ~ I + ad/2 + ad^2/12, CeresOptimizer.h:271-328):
      dr/ddelta_i =  Jl^-1(r) Adj(S_ji)   (left increments S <- exp(d) S)
      dr/ddelta_j = -Jr^-1(r)

    With `axis_name` set, the solver runs under `shard_map` with the EDGE
    axis sharded across a device mesh: every edge-axis reduction (gradient
    and Hessian-diagonal scatters, GN matvecs, costs) becomes a local
    scatter-add + `psum`, while the (P, 7) vertex state stays replicated —
    the same recipe as `bundle_adjustment_cg`'s observation sharding
    (parallel/sharded_ba.py).
    """
    P = R.shape[0]
    free = (~fixed).astype(R.dtype)[:, None]
    ew = edge_valid.astype(R.dtype)

    def allsum(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x

    def cost_fn(R, t, s):
        r = _edge_residuals(R, t, s, edge_i, edge_j, Rm, tm, sm)
        return allsum(jnp.sum(ew * jnp.sum(r * r, -1)))

    def gn_step(carry, _):
        R, t, s, lam, cost = carry
        r = _edge_residuals(R, t, s, edge_i, edge_j, Rm, tm, sm)  # (E,7)
        Jr_inv = lie.sim3_right_jacobian_inv_approx(r)  # (E,7,7)
        Jl_inv = lie.sim3_right_jacobian_inv_approx(-r)
        Adj_m = lie.sim3_adjoint(Rm, tm, sm)
        Ji = Jl_inv @ Adj_m  # (E,7,7)
        Jj = -Jr_inv

        Ji = Ji * ew[:, None, None]
        Jj = Jj * ew[:, None, None]

        # gradient b = -J^T r, scattered to vertices
        bi = -jnp.einsum("eki,ek->ei", Ji, r)
        bj = -jnp.einsum("eki,ek->ei", Jj, r)
        b = allsum(jnp.zeros((P, 7), R.dtype).at[edge_i].add(bi).at[edge_j].add(bj))
        b = b * free

        # block-diagonal of H for the Jacobi preconditioner + damping
        Hii = jnp.einsum("eki,ekl->eil", Ji, Ji)
        Hjj = jnp.einsum("eki,ekl->eil", Jj, Jj)
        Hdiag = allsum(
            jnp.zeros((P, 7, 7), R.dtype).at[edge_i].add(Hii).at[edge_j].add(Hjj))
        eye7 = jnp.eye(7, dtype=R.dtype)
        Hdiag_d = Hdiag + lam * (Hdiag * eye7) + 1e-6 * eye7
        Minv = jnp.linalg.inv(Hdiag_d)

        def Hv(x):  # damped Gauss-Newton matvec, matrix-free over edges
            yi = jnp.einsum("ekl,el->ek", Ji, x[edge_i]) + jnp.einsum("ekl,el->ek", Jj, x[edge_j])
            out = allsum(
                jnp.zeros((P, 7), R.dtype)
                .at[edge_i]
                .add(jnp.einsum("eki,ek->ei", Ji, yi))
                .at[edge_j]
                .add(jnp.einsum("eki,ek->ei", Jj, yi))
            )
            damp = lam * jnp.einsum("pij,pj->pi", Hdiag * eye7, x) + 1e-6 * x
            return (out + damp) * free

        # PCG
        def cg_body(carry, _):
            x, rr, p, rz = carry
            Ap = Hv(p)
            pAp = jnp.sum(p * Ap)
            alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = jnp.einsum("pij,pj->pi", Minv, rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
            p = z + beta * p
            return (x, rr, p, rz_new), None

        x0 = jnp.zeros((P, 7), R.dtype)
        z0 = jnp.einsum("pij,pj->pi", Minv, b)
        (dx, _, _, _), _ = jax.lax.scan(cg_body, (x0, b, z0, jnp.sum(b * z0)), None, length=cg_iters)
        dx = dx * free

        dR, dt, ds = lie.sim3_exp(dx)
        R_new = dR @ R
        t_new = ds[:, None] * (dR @ t[..., None])[..., 0] + dt
        s_new = ds * s
        new_cost = cost_fn(R_new, t_new, s_new)
        accept = new_cost < cost
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        s = jnp.where(accept, s_new, s)
        lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-6), jnp.minimum(lam * 4.0, 1e4))
        cost = jnp.where(accept, new_cost, cost)
        return (R, t, s, lam, cost), None

    cost0 = cost_fn(R, t, s)
    (R, t, s, _, cost), _ = jax.lax.scan(
        gn_step, (R, t, s, jnp.asarray(1e-4, R.dtype), cost0), None, length=gn_iters
    )
    return EssentialGraphResult(R=lie.so3_project(R), t=t, s=s, cost=cost)
