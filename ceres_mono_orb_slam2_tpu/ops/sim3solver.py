"""Horn closed-form similarity + RANSAC for loop-closure Sim3 estimation.

TPU-native equivalent of the reference Sim3Solver (src/Sim3Solver.cc): Horn
1987 absolute orientation (quaternion from the 4x4 N-matrix eigendecomposition,
:225-363) with the reference's asymmetric scale formula (:326-336), inside a
RANSAC over 3-point sets (:147-212) whose inlier test is two-way reprojection
with chi2 gates 9.210 * sigma2 (:93-94). All hypotheses evaluate as one
vmapped batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
from functools import partial
import jax.numpy as jnp


def horn_sim3(P1, P2, fix_scale: bool = False):
    """Closed-form similarity S12 aligning point sets: P1 ~ s * R @ P2 + t.

    P1, P2: (..., M, 3) corresponding 3D points (M >= 3).
    Returns (R (...,3,3), t (...,3), s (...,)).
    """
    c1 = jnp.mean(P1, axis=-2, keepdims=True)
    c2 = jnp.mean(P2, axis=-2, keepdims=True)
    Pr1 = P1 - c1
    Pr2 = P2 - c2
    # (..., 3, 3) = sum p2 p1^T — this orientation of Horn's M makes the
    # recovered quaternion rotate frame-2 points into frame 1
    M = jnp.swapaxes(Pr2, -1, -2) @ Pr1
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    # Horn's symmetric 4x4 N matrix (quaternion (w, x, y, z) ordering)
    N = jnp.stack(
        [
            jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], axis=-1),
            jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], axis=-1),
            jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], axis=-1),
            jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], axis=-1),
        ],
        axis=-2,
    )
    _, vecs = jnp.linalg.eigh(N)
    q = vecs[..., :, -1]  # largest eigenvalue -> rotation quaternion (w,x,y,z)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], axis=-1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], axis=-1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )
    P3 = (R @ jnp.swapaxes(Pr2, -1, -2))  # (..., 3, M) rotated Pr2
    if fix_scale:
        s = jnp.ones(P1.shape[:-2], P1.dtype)
    else:
        # reference asymmetric scale (Sim3Solver.cc:326-336):
        # s = <Pr1, R Pr2> / ||R Pr2||^2
        num = jnp.sum(jnp.swapaxes(Pr1, -1, -2) * P3, axis=(-1, -2))
        den = jnp.sum(P3 * P3, axis=(-1, -2))
        s = num / jnp.maximum(den, 1e-12)
    t = c1[..., 0, :] - s[..., None] * (R @ c2[..., 0, :, None])[..., 0]
    return R, t, s


class Sim3RansacResult(NamedTuple):
    success: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    s: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


# NOTE deliberately not jitted: under jit the batched 4x4 eigh lowers through
# a different path whose eigenvector signs/ordering perturb the Horn seed
# enough to flip borderline RANSAC inlier sets; this runs once per loop
# candidate (not hot), so dispatch overhead is irrelevant.
def ransac_sim3(
    key,
    K1,
    K2,
    X1,  # (N, 3) matched map points in camera-1 frame
    X2,  # (N, 3) matched map points in camera-2 frame
    uv1,  # (N, 2) keypoint of the match in image 1
    uv2,  # (N, 2) keypoint of the match in image 2
    inv_sigma2_1,  # (N,) octave information in image 1
    inv_sigma2_2,  # (N,)
    valid,  # (N,)
    n_hypotheses: int = 256,
    chi2_th: float = 9.210,
    min_inliers: int = 20,
    fix_scale: bool = False,
) -> Sim3RansacResult:
    """RANSAC Horn sim3 S12 with two-way reprojection inlier test
    (reference Sim3Solver::iterate + CheckInliers)."""
    N = X1.shape[0]
    noise = jax.random.uniform(key, (n_hypotheses, N))
    noise = jnp.where(valid[None, :], noise, -1.0)
    sets = jax.lax.top_k(noise, 3)[1]  # (NH, 3)
    R, t, s = horn_sim3(X1[sets], X2[sets], fix_scale=fix_scale)

    def proj(Km, X):
        z = jnp.where(jnp.abs(X[..., 2]) < 1e-9, 1e-9, X[..., 2])
        return jnp.stack(
            [Km[0, 0] * X[..., 0] / z + Km[0, 2], Km[1, 1] * X[..., 1] / z + Km[1, 2]], axis=-1
        )

    def inlier_mask(R, t, s):
        # X2 -> cam1
        q1 = s[..., None, None] * jnp.einsum("...ij,mj->...mi", R, X2) + t[..., None, :]
        # X1 -> cam2 via inverse
        si = 1.0 / s
        Rt = jnp.swapaxes(R, -1, -2)
        ti = -si[..., None] * (Rt @ t[..., None])[..., 0]
        q2 = si[..., None, None] * jnp.einsum("...ij,mj->...mi", Rt, X1) + ti[..., None, :]
        e1 = jnp.sum((proj(K1, q1) - uv1) ** 2, axis=-1) * inv_sigma2_1
        e2 = jnp.sum((proj(K2, q2) - uv2) ** 2, axis=-1) * inv_sigma2_2
        return valid & (e1 <= chi2_th) & (e2 <= chi2_th)

    inl = inlier_mask(R, t, s)
    counts = jnp.sum(inl.astype(jnp.int32), axis=-1)
    best = jnp.argmax(counts)
    n = counts[best]
    return Sim3RansacResult(
        success=n >= min_inliers,
        R=R[best],
        t=t[best],
        s=s[best],
        inliers=inl[best],
        n_inliers=n,
    )
