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


class PnPResult(NamedTuple):
    success: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray  # (N,)
    n_inliers: jnp.ndarray


@partial(jax.jit, static_argnames=("n_hypotheses", "min_set", "chi2_th", "min_inliers"))
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
) -> PnPResult:
    """Batched RANSAC absolute pose + non-minimal re-fit on inliers.

    Matches the reference's acceptance logic (SetRansacParameters
    PnPsolver.cc:122-157: chi2 5.991 scaled by octave sigma2, minimum inlier
    count) with all hypotheses evaluated in parallel.
    """
    N = pts3d.shape[0]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    uvn = jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)

    noise = jax.random.uniform(key, (n_hypotheses, N))
    noise = jnp.where(valid[None, :], noise, -1.0)
    sets = jax.lax.top_k(noise, min_set)[1]  # (NH, m)

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
