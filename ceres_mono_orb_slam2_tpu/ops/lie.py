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
    # (1 - cos t)/t^2, safe
    small = theta2 < _EPS**2
    safe_t2 = jnp.where(small, 1.0, theta2)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe_t2)[..., None, None]
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
    near_pi = jnp.pi - theta < 1e-4
    factor = jnp.where(
        small,
        0.5 + theta**2 / 12.0,
        theta / jnp.where(jnp.abs(sin_theta) < _EPS, 1.0, 2.0 * sin_theta),
    )
    w = factor[..., None] * w_generic
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


def so3_left_jacobian(w):
    """Left Jacobian J_l of SO(3): exp((J_l w') ^) ~ d exp near w."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    W = hat(w)
    W2 = W @ W
    small = theta < _EPS
    safe_t = jnp.where(small, 1.0, theta)
    safe_t2 = jnp.where(small, 1.0, theta2)
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe_t2)
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (safe_t - jnp.sin(theta)) / (safe_t2 * safe_t))
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

    Closed form (Sophus-style): W = A*Omega + B*Omega^2 + C*I with
      C = (s-1)/sigma,  A, B per the theta/sigma cases, s = e^sigma.
    All cases blended with where-guards for jit safety.
    """
    dtype = w.dtype
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    s = jnp.exp(sigma)
    W = hat(w)
    W2 = W @ W

    small_sigma = jnp.abs(sigma) < 1e-5
    small_theta = theta < 1e-5
    safe_sigma = jnp.where(small_sigma, 1.0, sigma)
    safe_theta = jnp.where(small_theta, 1.0, theta)
    safe_theta2 = jnp.where(small_theta, 1.0, theta2)

    # C
    C = jnp.where(small_sigma, 1.0 + sigma / 2.0 + sigma**2 / 6.0, (s - 1.0) / safe_sigma)

    # Case sigma ~ 0:
    A_s0 = jnp.where(small_theta, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe_theta2)
    B_s0 = jnp.where(
        small_theta, 1.0 / 6.0 - theta2 / 120.0, (safe_theta - jnp.sin(theta)) / (safe_theta2 * safe_theta)
    )

    # Case sigma != 0, theta ~ 0:
    sig2 = safe_sigma * safe_sigma
    A_t0 = ((sigma - 1.0) * s + 1.0) / sig2
    B_t0 = (s * 0.5 * sig2 + s - 1.0 - sigma * s) / (sig2 * safe_sigma)

    # General case:
    a = s * jnp.sin(theta)
    b = s * jnp.cos(theta)
    c = theta2 + sigma * sigma
    safe_c = jnp.where(c < _EPS, 1.0, c)
    A_g = (a * sigma + (1.0 - b) * safe_theta) / (safe_theta * safe_c)
    B_g = (C - ((b - 1.0) * sigma + a * safe_theta) / safe_c) / safe_theta2

    A = jnp.where(small_sigma, A_s0, jnp.where(small_theta, A_t0, A_g))
    B = jnp.where(small_sigma, B_s0, jnp.where(small_theta, B_t0, B_g))

    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), W.shape)
    return A[..., None, None] * W + B[..., None, None] * W2 + C[..., None, None] * eye


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
