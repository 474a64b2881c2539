"""SO(3) / SE(3) / Sim(3) Lie-group operations in JAX.

Replaces the reference's use of Eigen quaternions + Sophus (Sim3/SO3 Lie
groups used throughout src/CeresOptimizer.{h,cc}; the sim3 tangent-space
math is derived in the reference README.md:49-84). Everything here is pure
jnp, differentiable, and vmap-safe; all branchy small-angle handling is done
with `jnp.where` on safe-guarded denominators so the functions trace cleanly
under jit.

Conventions:
  - so3 tangent: omega (3,); se3 tangent: (upsilon(3), omega(3)) -> (6,)
  - sim3 tangent: (upsilon(3), omega(3), sigma) -> (7,)  [Sophus order]
  - Sim3 element: (R (3,3), t (3,), s scalar), acting as x -> s*R@x + t.
  - quaternions are (x, y, z, w) to match Eigen coefficient order
    (reference MatEigenConverter.cc:71-79).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-7


def hat(w):
    """so3 hat: (..., 3) -> (..., 3, 3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc(theta):
    """sin(theta)/theta, safe at 0."""
    safe = jnp.where(jnp.abs(theta) < _EPS, 1.0, theta)
    return jnp.where(jnp.abs(theta) < _EPS, 1.0 - theta**2 / 6.0, jnp.sin(safe) / safe)


def so3_exp(w):
    """Rodrigues: (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    W = hat(w)
    W2 = W @ W
    a = _sinc(theta)[..., None, None]
    # (1 - cos t)/t^2 = 2 sin^2(t/2)/t^2 — half-angle form is cancellation-free
    small = theta2 < _EPS**2
    safe_t2 = jnp.where(small, 1.0, theta2)
    sh = jnp.sin(theta * 0.5)
    b = jnp.where(small, 0.5 - theta2 / 24.0, 2.0 * sh * sh / safe_t2)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def so3_log(R):
    """(..., 3, 3) -> (..., 3). Handles angles up to pi (inclusive-ish)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # Generic: w = theta/(2 sin theta) * vee(R - R^T)
    sin_theta = jnp.sin(theta)
    w_generic = vee(R - jnp.swapaxes(R, -1, -2))
    small = theta < 1e-5
    # arccos loses ~sqrt(eps) precision near +-1; use a wide near-pi band and
    # recover theta there from |vee(R - R^T)| = 2 sin(theta) via arcsin.
    near_pi = jnp.pi - theta < 1e-3
    factor = jnp.where(
        small,
        0.5 + theta**2 / 12.0,
        theta / jnp.where(jnp.abs(sin_theta) < _EPS, 1.0, 2.0 * sin_theta),
    )
    w = factor[..., None] * w_generic
    sin_np = jnp.clip(0.5 * jnp.linalg.norm(w_generic, axis=-1), 0.0, 1.0)
    theta = jnp.where(near_pi, jnp.pi - jnp.arcsin(sin_np), theta)
    # Near pi: (R + I)/2 ~ a a^T; take its largest column as the axis, with
    # the sign aligned to vee(R - R^T) = 2 sin(theta) a (zero only at exactly pi,
    # where either sign is a valid log).
    B = (R + jnp.eye(3, dtype=R.dtype)) * 0.5
    diag = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(B, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    axis = col / jnp.maximum(jnp.linalg.norm(col, axis=-1, keepdims=True), _EPS)
    flip = jnp.where(jnp.sum(w_generic * axis, axis=-1) < 0, -1.0, 1.0)
    w_pi = flip[..., None] * axis * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w)


def so3_project(R):
    """Project a near-rotation onto SO(3) (closest in Frobenius norm).

    Two Newton steps of the polar-decomposition iteration
    R <- R (3I - R^T R)/2, quadratically convergent for ||R^T R - I|| < 1 —
    far cheaper than an SVD and jit/vmap-friendly.

    Load-bearing: the reference renormalizes its pose quaternion after every
    Ceres solve (CeresOptimizer.cc:335 frame_qcw.normalized()). Without the
    equivalent, f32 determinant error (~1e-7/op) survives the LM solves
    (left-multiplying by orthogonal increments preserves det) and the
    constant-velocity model COMPOUNDS it multiplicatively every frame
    (det(R_pred) = det(R_cur)·det(R_last)²) — exponential growth that
    reaches percent scale by frame ~13-16 and was the round-1 tracking
    divergence (KNOWN_ISSUES #1): det(R)≠1 acts as a hidden scale factor on
    the whole camera, inflating apparent depth geometrically.
    """
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    for _ in range(2):
        R = R @ (1.5 * eye - 0.5 * (jnp.swapaxes(R, -1, -2) @ R))
    return R


def so3_left_jacobian(w):
    """Left Jacobian J_l of SO(3): exp((J_l w') ^) ~ d exp near w."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    W = hat(w)
    W2 = W @ W
    # (1-cos)/t^2 via half-angle; (t-sin t)/t^3 via Taylor below t=0.1 (the
    # closed form loses ~half the f32 mantissa to cancellation there).
    small = theta < 0.1
    safe_t = jnp.where(small, 1.0, theta)
    safe_t2 = jnp.where(small, 1.0, theta2)
    sh = jnp.sin(theta * 0.5)
    a = jnp.where(theta < _EPS, 0.5 - theta2 / 24.0, 2.0 * sh * sh / jnp.where(theta < _EPS, 1.0, theta2))
    b = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0 + theta2 * theta2 / 5040.0,
        (safe_t - jnp.sin(theta)) / (safe_t2 * safe_t),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


# ----------------------------------------------------------------------------- SE(3)


def se3_exp(xi):
    """(..., 6) tangent (upsilon, omega) -> (R (...,3,3), t (...,3))."""
    v, w = xi[..., :3], xi[..., 3:6]
    R = so3_exp(w)
    V = so3_left_jacobian(w)
    t = (V @ v[..., None])[..., 0]
    return R, t


def se3_log(R, t):
    """(R, t) -> (..., 6)."""
    w = so3_log(R)
    V = so3_left_jacobian(w)
    v = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([v, w], axis=-1)


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def se3_compose(Ra, ta, Rb, tb):
    """(Ra,ta) * (Rb,tb): x -> Ra(Rb x + tb) + ta."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def se3_to_matrix(R, t):
    bot = jnp.zeros(R.shape[:-2] + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


# ----------------------------------------------------------------------------- quaternions


def quat_to_rot(q):
    """(x, y, z, w) quaternion -> rotation matrix. Normalizes input."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], axis=-1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], axis=-1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R):
    """Rotation matrix -> (x, y, z, w), w >= 0. Branch-free Shepperd method."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically best.
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    qw = jnp.sqrt(jnp.clip(qw, 1e-12, None)) * 0.5
    w0, x1, y2, z3 = qw[..., 0], qw[..., 1], qw[..., 2], qw[..., 3]
    c0 = jnp.stack([(m21 - m12) / (4 * w0), (m02 - m20) / (4 * w0), (m10 - m01) / (4 * w0), w0], axis=-1)
    c1 = jnp.stack([x1, (m01 + m10) / (4 * x1), (m02 + m20) / (4 * x1), (m21 - m12) / (4 * x1)], axis=-1)
    c2 = jnp.stack([(m01 + m10) / (4 * y2), y2, (m12 + m21) / (4 * y2), (m02 - m20) / (4 * y2)], axis=-1)
    c3 = jnp.stack([(m02 + m20) / (4 * z3), (m12 + m21) / (4 * z3), z3, (m10 - m01) / (4 * z3)], axis=-1)
    best = jnp.argmax(qw, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    sign = jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    q = q * sign
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


# ----------------------------------------------------------------------------- Sim(3)


def _sim3_W(w, sigma):
    """The sim3 'V' matrix W s.t. t = W @ upsilon in sim3_exp.

    W = integral_0^1 e^{sigma u} R(u*theta) du
      = C*I + A*Omega + B*Omega^2,   Omega = hat(w),
    with moment integrals E_k = integral_0^1 u^k e^{sigma u} du:
      C = E0,  A = I1/theta,  B = I2/theta^2,
      I1 = int e^{su} sin(u theta),  I2 = int e^{su} (1 - cos(u theta)).

    f32-stability is the whole game here (the naive Sophus closed form loses
    the mantissa to cancellation for theta in [1e-5, 1e-1] and silently
    produces garbage W — which then explodes sim3_log residuals). Three
    regimes, all branches nan-safe so the unselected ones don't poison jit:
      1. theta < 0.1 and |sigma| < 0.1: double Taylor via E_k series,
      2. theta < 0.1, |sigma| >= 0.1: E_k by the stable recurrence
         E_k = (e^s - k E_{k-1})/s,
      3. theta >= 0.1: closed form with half-angle / expm1 building blocks.
    """
    dtype = w.dtype
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    s = jnp.exp(sigma)
    expm1s = jnp.expm1(sigma)
    Omega = hat(w)
    Omega2 = Omega @ Omega

    small_t = theta < 0.1
    small_s = jnp.abs(sigma) < 0.1

    # regime 1: E_k as series in sigma (|sigma| < 0.1 -> next term < 1e-8)
    def ek_series(k):
        return (
            1.0 / (k + 1)
            + sigma * (1.0 / (k + 2))
            + sigma**2 * (0.5 / (k + 3))
            + sigma**3 * (1.0 / (6.0 * (k + 4)))
            + sigma**4 * (1.0 / (24.0 * (k + 5)))
        )

    A1 = ek_series(1) - (theta2 / 6.0) * ek_series(3)
    B1 = 0.5 * ek_series(2) - (theta2 / 24.0) * ek_series(4)
    C1 = ek_series(0)

    # regime 2: E_k recurrence (stable for |sigma| >= 0.1)
    safe_sig = jnp.where(small_s, 1.0, sigma)
    E0 = expm1s / safe_sig
    E1 = (s - E0) / safe_sig
    E2 = (s - 2.0 * E1) / safe_sig
    E3 = (s - 3.0 * E2) / safe_sig
    E4 = (s - 4.0 * E3) / safe_sig
    A2 = E1 - (theta2 / 6.0) * E3
    B2 = 0.5 * E2 - (theta2 / 24.0) * E4

    C = jnp.where(small_s, C1, E0)

    # regime 3: closed form, theta >= 0.1
    safe_t = jnp.where(small_t, 1.0, theta)
    safe_t2 = jnp.where(small_t, 1.0, theta2)
    c = theta2 + sigma * sigma
    safe_c = jnp.where(small_t, 1.0, c)  # theta >= 0.1 -> c >= 0.01
    a_ = s * jnp.sin(theta)
    sh = jnp.sin(theta * 0.5)
    one_minus_b = 2.0 * s * sh * sh - expm1s  # = 1 - s cos(theta), stable
    A3 = (a_ * sigma + one_minus_b * safe_t) / (safe_t * safe_c)
    B3 = (C - (a_ * safe_t - sigma * one_minus_b) / safe_c) / safe_t2

    A = jnp.where(small_t, jnp.where(small_s, A1, A2), A3)
    B = jnp.where(small_t, jnp.where(small_s, B1, B2), B3)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), Omega.shape)
    return A[..., None, None] * Omega + B[..., None, None] * Omega2 + C[..., None, None] * eye


def sim3_exp(xi):
    """(..., 7) tangent (upsilon, omega, sigma) -> (R, t, s)."""
    v, w, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3_exp(w)
    s = jnp.exp(sigma)
    W = _sim3_W(w, sigma)
    t = (W @ v[..., None])[..., 0]
    return R, t, s


def sim3_log(R, t, s):
    """(R, t, s) -> (..., 7)."""
    w = so3_log(R)
    sigma = jnp.log(s)
    W = _sim3_W(w, sigma)
    v = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([v, w, sigma[..., None]], axis=-1)


def sim3_inverse(R, t, s):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return Rt, -s_inv[..., None] * (Rt @ t[..., None])[..., 0], s_inv


def sim3_compose(Ra, ta, sa, Rb, tb, sb):
    """(a) * (b): x -> sa*Ra(sb*Rb x + tb) + ta."""
    return Ra @ Rb, sa[..., None] * (Ra @ tb[..., None])[..., 0] + ta, sa * sb


def sim3_apply(R, t, s, x):
    """Apply sim3 to points x (..., 3)."""
    return s[..., None] * (R @ x[..., None])[..., 0] + t


def sim3_adjoint(R, t, s):
    """7x7 adjoint: S exp(x) S^-1 = exp(Adj_S x), tangent order (v, w, sigma).

    Adj = [[s R, hat(t) R, -t], [0, R, 0], [0, 0, 1]]
    (the form used by the reference's essential-graph Jacobian,
    CeresOptimizer.h:271-328 / README.md:49-84).
    """
    shp = R.shape[:-2]
    A = jnp.zeros(shp + (7, 7), dtype=R.dtype)
    A = A.at[..., 0:3, 0:3].set(s[..., None, None] * R)
    A = A.at[..., 0:3, 3:6].set(hat(t) @ R)
    A = A.at[..., 0:3, 6].set(-t)
    A = A.at[..., 3:6, 3:6].set(R)
    A = A.at[..., 6, 6].set(1.0)
    return A


def sim3_ad(xi):
    """7x7 'little' adjoint ad(xi) of a sim3 tangent vector.

    For xi = (v, w, sigma):
      ad = [[hat(w) + sigma I, hat(v), -v],
            [0,                hat(w),  0],
            [0,                0,       0]]
    """
    v, w, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    shp = xi.shape[:-1]
    A = jnp.zeros(shp + (7, 7), dtype=xi.dtype)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), shp + (3, 3))
    A = A.at[..., 0:3, 0:3].set(hat(w) + sigma[..., None, None] * eye)
    A = A.at[..., 0:3, 3:6].set(hat(v))
    A = A.at[..., 0:3, 6].set(-v)
    A = A.at[..., 3:6, 3:6].set(hat(w))
    return A


def sim3_right_jacobian_inv_approx(xi):
    """BCH-approximate inverse right Jacobian: Jr^-1 ~ I + 1/2 ad + 1/12 ad^2.

    This is the approximation the reference uses for the essential-graph
    residual Jacobians (CeresOptimizer.h:271-328).
    """
    ad = sim3_ad(xi)
    eye = jnp.broadcast_to(jnp.eye(7, dtype=xi.dtype), ad.shape)
    return eye + 0.5 * ad + (1.0 / 12.0) * (ad @ ad)
