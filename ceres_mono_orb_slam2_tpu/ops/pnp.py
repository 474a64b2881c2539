"""Absolute-pose (PnP) RANSAC for relocalization.

TPU-native equivalent of the reference PnPsolver (src/PnPsolver.cc: EPnP
inside RANSAC, minimal sets of 4, prob 0.99, 300 iterations, chi2 gate
5.991*sigma2(octave), set up by Tracking.cc:1019-1030). Re-designed for
vmap: hypotheses use a 6-point DLT of the 3x4 projection matrix followed by
orthogonal Procrustes extraction of (R, t) — a one-eigendecomposition minimal
solver that batches perfectly, where EPnP's staged control-point/beta
machinery does not. The non-minimal refinement on inliers (reference
Refine(), PnPsolver.cc:263-340) is the same DLT over all inliers; callers
then polish with optim.pose_optimization exactly as Tracking does.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
from functools import partial
import jax.numpy as jnp


def _dlt_pose(pts3d, uv_norm, weights):
    """Weighted DLT for P = [R|t] from normalized image points.

    pts3d: (..., M, 3); uv_norm: (..., M, 2) K^-1-normalized observations;
    weights: (..., M) row weights (0 disables a correspondence).
    Returns R (..., 3, 3), t (..., 3) with cam = R @ X + t (up to sign/scale
    fixed by cheirality + Procrustes).
    """
    X, Y, Z = pts3d[..., 0], pts3d[..., 1], pts3d[..., 2]
    o = jnp.ones_like(X)
    u, v = uv_norm[..., 0], uv_norm[..., 1]
    z = jnp.zeros_like(X)
    r1 = jnp.stack([X, Y, Z, o, z, z, z, z, -u * X, -u * Y, -u * Z, -u], axis=-1)
    r2 = jnp.stack([z, z, z, z, X, Y, Z, o, -v * X, -v * Y, -v * Z, -v], axis=-1)
    A = jnp.concatenate([r1 * weights[..., None], r2 * weights[..., None]], axis=-2)  # (..., 2M, 12)
    AtA = jnp.swapaxes(A, -1, -2) @ A
    _, vecs = jnp.linalg.eigh(AtA)
    p = vecs[..., :, 0]
    P = p.reshape(p.shape[:-1] + (3, 4))
    M = P[..., :, :3]
    # sign: majority of used points must have positive depth
    zc = jnp.einsum("...ij,...mj->...mi", M, pts3d)[..., 2] + P[..., 2, 3][..., None]
    pos = jnp.sum(jnp.where(weights > 0, jnp.sign(zc), 0.0), axis=-1)
    sgn = jnp.where(pos >= 0, 1.0, -1.0)
    P = P * sgn[..., None, None]
    M = P[..., :, :3]
    # Procrustes: nearest scaled rotation. scale = geometric mean of singular values.
    U, S, Vt = jnp.linalg.svd(M)
    R = U @ Vt
    detR = jnp.linalg.det(R)
    # fix improper rotation by flipping last column of U
    U = U.at[..., :, 2].multiply(jnp.where(detR < 0, -1.0, 1.0)[..., None])
    S = S.at[..., 2].multiply(jnp.where(detR < 0, -1.0, 1.0))
    R = U @ Vt
    scale = jnp.exp(jnp.mean(jnp.log(jnp.maximum(S, 1e-12)), axis=-1))
    t = P[..., :, 3] / jnp.maximum(scale, 1e-12)[..., None]
    return R, t


def _p3p_pose(pts3d, bearings, sets):
    """Minimal 3-point absolute pose, vmapped over hypotheses.

    The reference relocalizes with EPnP minimal sets of FOUR
    (PnPsolver.cc:68-157,347-1000); at inlier ratio w the probability a
    sample is all-inlier is w^4 there vs w^3 here — strictly more robust at
    the low ratios where relocalization matters. TPU-native formulation:
    solve the P3P depth system  d_i^2 + d_j^2 - 2 d_i d_j cos_ij = D_ij^2
    by Newton iteration (3x3 closed-form solve per step, pure VPU — the
    classical quartic needs complex root machinery that doesn't batch),
    started from multiple scale seeds to cover the root branches, then
    extract (R, t) by Kabsch alignment of the back-projected camera points.

    pts3d: (N, 3); bearings: (N, 3) unit K^-1 rays; sets: (NH, 3) indices.
    Returns R (NH*S, 3, 3), t (NH*S, 3) for S seeds per hypothesis.
    """
    Xw = pts3d[sets]  # (NH, 3, 3)
    x = bearings[sets]  # (NH, 3, 3) unit rays
    c12 = jnp.sum(x[:, 0] * x[:, 1], -1)
    c13 = jnp.sum(x[:, 0] * x[:, 2], -1)
    c23 = jnp.sum(x[:, 1] * x[:, 2], -1)
    D12 = jnp.sum((Xw[:, 0] - Xw[:, 1]) ** 2, -1)
    D13 = jnp.sum((Xw[:, 0] - Xw[:, 2]) ** 2, -1)
    D23 = jnp.sum((Xw[:, 1] - Xw[:, 2]) ** 2, -1)
    scale0 = jnp.sqrt(jnp.maximum(D12 + D13 + D23, 1e-12) / 3.0)

    seeds = jnp.asarray([0.5, 1.0, 2.0, 4.0], pts3d.dtype)

    def solve_one(seed, c12, c13, c23, D12, D13, D23, s0):
        d = jnp.full((3,), seed * s0, pts3d.dtype)

        def body(d, _):
            f = jnp.stack([
                d[0] ** 2 + d[1] ** 2 - 2 * d[0] * d[1] * c12 - D12,
                d[0] ** 2 + d[2] ** 2 - 2 * d[0] * d[2] * c13 - D13,
                d[1] ** 2 + d[2] ** 2 - 2 * d[1] * d[2] * c23 - D23,
            ])
            J = jnp.stack([
                jnp.stack([2 * d[0] - 2 * d[1] * c12, 2 * d[1] - 2 * d[0] * c12, jnp.zeros_like(c12)]),
                jnp.stack([2 * d[0] - 2 * d[2] * c13, jnp.zeros_like(c12), 2 * d[2] - 2 * d[0] * c13]),
                jnp.stack([jnp.zeros_like(c12), 2 * d[1] - 2 * d[2] * c23, 2 * d[2] - 2 * d[1] * c23]),
            ])
            # damped 3x3 Newton step (closed-form adjugate inverse)
            a, b_, c_ = J[0, 0], J[0, 1], J[0, 2]
            e, f_, g = J[1, 0], J[1, 1], J[1, 2]
            h, i_, j_ = J[2, 0], J[2, 1], J[2, 2]
            det = (a * (f_ * j_ - g * i_) - b_ * (e * j_ - g * h) + c_ * (e * i_ - f_ * h))
            det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
            inv = jnp.stack([
                jnp.stack([f_ * j_ - g * i_, c_ * i_ - b_ * j_, b_ * g - c_ * f_]),
                jnp.stack([g * h - e * j_, a * j_ - c_ * h, c_ * e - a * g]),
                jnp.stack([e * i_ - f_ * h, b_ * h - a * i_, a * f_ - b_ * e]),
            ]) / det
            d = d - inv @ f
            return jnp.maximum(d, 1e-6), None

        d, _ = jax.lax.scan(body, d, None, length=20)
        return d

    # (S, NH, 3) depth solutions over seed x hypothesis
    depths = jax.vmap(lambda s: jax.vmap(solve_one, in_axes=(None, 0, 0, 0, 0, 0, 0, 0))(
        s, c12, c13, c23, D12, D13, D23, scale0))(seeds)
    S = seeds.shape[0]
    NH = sets.shape[0]
    d_all = depths.reshape(S * NH, 3)
    x_all = jnp.tile(x, (S, 1, 1))
    Xw_all = jnp.tile(Xw, (S, 1, 1))
    Pc = d_all[..., None] * x_all  # (S*NH, 3, 3) camera points
    # Kabsch: R,t minimizing |Pc - (R Xw + t)|
    muc = Pc.mean(axis=1)
    muw = Xw_all.mean(axis=1)
    H = jnp.einsum("nmi,nmj->nij", Pc - muc[:, None], Xw_all - muw[:, None])
    U, _, Vt = jnp.linalg.svd(H)
    detUV = jnp.linalg.det(U @ Vt)
    U = U.at[..., :, 2].multiply(jnp.where(detUV < 0, -1.0, 1.0)[..., None])
    R = U @ Vt
    t = muc - jnp.einsum("nij,nj->ni", R, muw)
    return R, t


class PnPResult(NamedTuple):
    success: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray  # (N,)
    n_inliers: jnp.ndarray


@partial(jax.jit, static_argnames=("n_hypotheses", "min_set", "chi2_th", "min_inliers",
                                   "solver"))
def ransac_pnp(
    key,
    K,
    pts3d,  # (N, 3) world points
    uv,  # (N, 2) observed (undistorted) pixels
    inv_sigma2,  # (N,) per-observation information (1/sigma^2 of octave)
    valid,  # (N,)
    n_hypotheses: int = 256,
    min_set: int = 6,
    chi2_th: float = 5.991,
    min_inliers: int = 10,
    solver: str = "p3p",
) -> PnPResult:
    """Batched RANSAC absolute pose + non-minimal re-fit on inliers.

    Matches the reference's acceptance logic (SetRansacParameters
    PnPsolver.cc:122-157: chi2 5.991 scaled by octave sigma2, minimum inlier
    count) with all hypotheses evaluated in parallel. `solver="p3p"` uses
    3-point minimal samples (good-sample probability w^3, vs the reference
    EPnP's w^4 and the old DLT's w^6 — decisive below ~50% inliers);
    `solver="dlt"` keeps the 6-point DLT hypotheses.
    """
    N = pts3d.shape[0]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    uvn = jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)

    if solver == "p3p":
        min_set = 3
    noise = jax.random.uniform(key, (n_hypotheses, N))
    noise = jnp.where(valid[None, :], noise, -1.0)
    sets = jax.lax.top_k(noise, min_set)[1]  # (NH, m)

    if solver == "p3p":
        rays = jnp.concatenate([uvn, jnp.ones(uvn.shape[:-1] + (1,), uvn.dtype)], -1)
        rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
        R, t = _p3p_pose(pts3d, rays, sets)  # (4*NH, ...) seed-expanded
    else:
        w = jnp.zeros((n_hypotheses, N), K.dtype)
        w = w.at[jnp.arange(n_hypotheses)[:, None], sets].set(1.0)
        R, t = _dlt_pose(
            jnp.broadcast_to(pts3d, (n_hypotheses, N, 3)),
            jnp.broadcast_to(uvn, (n_hypotheses, N, 2)),
            w,
        )

    def score(R, t):
        Xc = jnp.einsum("...ij,mj->...mi", R, pts3d) + t[..., None, :]
        zok = Xc[..., 2] > 1e-6
        zs = jnp.where(zok, Xc[..., 2], 1.0)
        u = fx * Xc[..., 0] / zs + cx
        v = fy * Xc[..., 1] / zs + cy
        chi2 = ((u - uv[..., 0]) ** 2 + (v - uv[..., 1]) ** 2) * inv_sigma2
        return valid & zok & (chi2 <= chi2_th)

    inl = score(R, t)  # (NH, N)
    counts = jnp.sum(inl.astype(jnp.int32), axis=-1)
    best = jnp.argmax(counts)

    # non-minimal refit on the best hypothesis' inliers (reference Refine())
    wref = inl[best].astype(K.dtype)
    Rr, tr = _dlt_pose(pts3d, uvn, wref)
    inl_r = score(Rr, tr)
    # keep whichever is better (the refit can rarely degrade)
    better = jnp.sum(inl_r.astype(jnp.int32)) >= counts[best]
    R_out = jnp.where(better, Rr, R[best])
    t_out = jnp.where(better, tr, t[best])
    inl_out = jnp.where(better, inl_r, inl[best])
    n = jnp.sum(inl_out.astype(jnp.int32))
    return PnPResult(success=n >= min_inliers, R=R_out, t=t_out, inliers=inl_out, n_inliers=n)


def ransac_pnp_multi(key, K, pts3d, uv, inv_sigma2, valid, **kw) -> PnPResult:
    """RANSAC over a BATCH of relocalization candidates simultaneously:
    pts3d (C, N, 3), uv (C, N, 2), inv_sigma2 (C, N), valid (C, N).

    The reference interleaves `iterate(5)` RANSAC rounds across candidates
    (Tracking.cc:1039-1128) so no single candidate monopolizes compute before
    the others get a chance; the batched-TPU equivalent runs EVERY
    candidate's full hypothesis set in one vmapped call and lets the caller
    rank candidates by inlier count. Returns a PnPResult with a leading
    candidate axis on every field."""
    keys = jax.random.split(key, pts3d.shape[0])
    return jax.vmap(
        lambda k_, p_, u_, w_, v_: ransac_pnp(k_, K, p_, u_, w_, v_, **kw)
    )(keys, pts3d, uv, inv_sigma2, valid)
