"""Lie group unit tests: exp/log roundtrips, composition identities, adjoints."""

import numpy as np
import jax.numpy as jnp
import pytest

from ceres_mono_orb_slam2_tpu.ops import lie


def random_tangents(rng, n, dim, scale=1.0):
    """Random tangents with the rotation block capped to |omega| < pi
    (so3/se3/sim3 log is only the exp inverse inside the pi-ball)."""
    x = rng.standard_normal((n, dim)) * scale
    if dim >= 3:
        rot = x[:, 3:6] if dim > 3 else x
        norm = np.linalg.norm(rot, axis=-1, keepdims=True)
        fac = np.minimum(1.0, 3.0 / np.maximum(norm, 1e-9))
        rot *= fac
    return jnp.asarray(x, dtype=jnp.float32)


def test_so3_exp_log_roundtrip(rng):
    w = random_tangents(rng, 64, 3, scale=1.0)
    R = lie.so3_exp(w)
    w2 = lie.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=2e-5)


def test_so3_orthogonality(rng):
    w = random_tangents(rng, 16, 3, scale=2.0)
    R = lie.so3_exp(w)
    RtR = jnp.swapaxes(R, -1, -2) @ R
    np.testing.assert_allclose(np.asarray(RtR), np.broadcast_to(np.eye(3), RtR.shape), atol=1e-5)
    det = jnp.linalg.det(R)
    np.testing.assert_allclose(np.asarray(det), 1.0, atol=1e-5)


def test_so3_log_near_pi(rng):
    axis = rng.standard_normal((8, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    w = jnp.asarray(axis * (np.pi - 1e-6), dtype=jnp.float32)
    R = lie.so3_exp(w)
    w2 = lie.so3_log(R)
    R2 = lie.so3_exp(w2)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)


def test_so3_small_angle(rng):
    w = random_tangents(rng, 8, 3, scale=1e-9)
    R = lie.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), R.shape), atol=1e-6)
    w2 = lie.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), 0.0, atol=1e-6)


def test_se3_exp_log_roundtrip(rng):
    xi = random_tangents(rng, 64, 6)
    R, t = lie.se3_exp(xi)
    xi2 = lie.se3_log(R, t)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_se3_inverse_compose(rng):
    xi = random_tangents(rng, 16, 6)
    R, t = lie.se3_exp(xi)
    Ri, ti = lie.se3_inverse(R, t)
    Rc, tc = lie.se3_compose(R, t, Ri, ti)
    np.testing.assert_allclose(np.asarray(Rc), np.broadcast_to(np.eye(3), Rc.shape), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-5)


def test_quat_roundtrip(rng):
    w = random_tangents(rng, 128, 3, scale=2.0)
    R = lie.so3_exp(w)
    q = lie.rot_to_quat(R)
    R2 = lie.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    # unit norm, w >= 0
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(q, axis=-1)), 1.0, atol=1e-5)
    assert np.all(np.asarray(q[..., 3]) >= 0)


def test_sim3_exp_log_roundtrip(rng):
    xi = random_tangents(rng, 64, 7, scale=0.8)
    R, t, s = lie.sim3_exp(xi)
    xi2 = lie.sim3_log(R, t, s)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_sim3_exp_sigma_zero_matches_se3(rng):
    xi6 = random_tangents(rng, 16, 6)
    xi7 = jnp.concatenate([xi6, jnp.zeros((16, 1), jnp.float32)], axis=-1)
    R6, t6 = lie.se3_exp(xi6)
    R7, t7, s7 = lie.sim3_exp(xi7)
    np.testing.assert_allclose(np.asarray(R7), np.asarray(R6), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t7), np.asarray(t6), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s7), 1.0, atol=1e-6)


def test_sim3_compose_inverse(rng):
    xa = random_tangents(rng, 16, 7, scale=0.5)
    xb = random_tangents(rng, 16, 7, scale=0.5)
    Ra, ta, sa = lie.sim3_exp(xa)
    Rb, tb, sb = lie.sim3_exp(xb)
    Rc, tc, sc = lie.sim3_compose(Ra, ta, sa, Rb, tb, sb)
    x = jnp.asarray(rng.standard_normal((16, 3)), jnp.float32)
    lhs = lie.sim3_apply(Rc, tc, sc, x)
    rhs = lie.sim3_apply(Ra, ta, sa, lie.sim3_apply(Rb, tb, sb, x))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)

    Ri, ti, si = lie.sim3_inverse(Ra, ta, sa)
    Rc, tc, sc = lie.sim3_compose(Ra, ta, sa, Ri, ti, si)
    np.testing.assert_allclose(np.asarray(Rc), np.broadcast_to(np.eye(3), Rc.shape), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sc), 1.0, atol=1e-5)


def test_sim3_adjoint_identity(rng):
    """Verify S exp(x) S^-1 == exp(Adj_S x) by applying both to points."""
    xs = random_tangents(rng, 8, 7, scale=0.3)
    xe = random_tangents(rng, 8, 7, scale=0.1)
    Rs, ts, ss = lie.sim3_exp(xs)
    Adj = lie.sim3_adjoint(Rs, ts, ss)
    # lhs: S * exp(xe) * S^-1
    Re, te, se = lie.sim3_exp(xe)
    Ri, ti, si = lie.sim3_inverse(Rs, ts, ss)
    R1, t1, s1 = lie.sim3_compose(Re, te, se, Ri, ti, si)
    Rl, tl, sl = lie.sim3_compose(Rs, ts, ss, R1, t1, s1)
    # rhs: exp(Adj @ xe)
    xr = (Adj @ xe[..., None])[..., 0]
    Rr, tr, sr = lie.sim3_exp(xr)
    np.testing.assert_allclose(np.asarray(Rl), np.asarray(Rr), atol=1e-4)
    np.testing.assert_allclose(np.asarray(tl), np.asarray(tr), atol=1e-3)
    np.testing.assert_allclose(np.asarray(sl), np.asarray(sr), atol=1e-4)


def test_sim3_ad_bracket(rng):
    """ad(x) y == bracket via d/dt log(exp(tx) exp(y) exp(-tx)) first-order check."""
    x = random_tangents(rng, 4, 7, scale=0.2)
    y = random_tangents(rng, 4, 7, scale=0.2)
    ad = lie.sim3_ad(x)
    eps = 1e-2
    # central finite-difference of Adj(exp(t x)) y at t=0

    def f(t):
        Rt, tt, st = lie.sim3_exp(t * x)
        return (lie.sim3_adjoint(Rt, tt, st) @ y[..., None])[..., 0]

    fd = (f(eps) - f(-eps)) / (2 * eps)
    an = (ad @ y[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(fd), np.asarray(an), atol=5e-3)
