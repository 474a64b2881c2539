"""Sim3 two-view refinement and essential-graph optimization tests."""

import numpy as np
import jax.numpy as jnp

from ceres_mono_orb_slam2_tpu.ops import lie, sim3opt

K = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], jnp.float32)


def test_optimize_sim3_recovers_similarity(rng):
    n = 80
    X2 = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 8, n)], -1
    ).astype(np.float32)
    xi_true = jnp.asarray(np.array([0.2, -0.1, 0.3, 0.05, -0.04, 0.08, np.log(1.3)], np.float32))
    R12, t12, s12 = lie.sim3_exp(xi_true)
    X1 = np.asarray(lie.sim3_apply(R12, t12, s12, jnp.asarray(X2)))

    def proj(X):
        return np.stack([500 * X[:, 0] / X[:, 2] + 320, 500 * X[:, 1] / X[:, 2] + 240], -1).astype(np.float32)

    uv1 = proj(X1) + rng.standard_normal((n, 2)).astype(np.float32) * 0.3
    uv2 = proj(X2) + rng.standard_normal((n, 2)).astype(np.float32) * 0.3

    xi0 = xi_true + jnp.asarray(np.array([0.05, -0.04, 0.06, 0.02, 0.02, -0.02, 0.08], np.float32))
    R0, t0, s0 = lie.sim3_exp(xi0)
    res = sim3opt.optimize_sim3(
        K, K, jnp.asarray(X1), jnp.asarray(X2), jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(n, jnp.float32), jnp.ones(n, jnp.float32), jnp.ones(n, bool),
        R0, t0, s0,
    )
    xi_rec = np.asarray(lie.sim3_log(res.R, res.t, res.s))
    assert np.linalg.norm(xi_rec - np.asarray(xi_true)) < 0.02
    assert int(res.n_inliers) > 70


def test_optimize_sim3_rejects_outliers(rng):
    n = 60
    X2 = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 8, n)], -1
    ).astype(np.float32)
    xi_true = jnp.asarray(np.array([0.1, 0.0, 0.2, 0.0, 0.03, 0.0, np.log(0.9)], np.float32))
    R12, t12, s12 = lie.sim3_exp(xi_true)
    X1 = np.asarray(lie.sim3_apply(R12, t12, s12, jnp.asarray(X2)))

    def proj(X):
        return np.stack([500 * X[:, 0] / X[:, 2] + 320, 500 * X[:, 1] / X[:, 2] + 240], -1).astype(np.float32)

    uv1, uv2 = proj(X1), proj(X2)
    uv1[:10] += rng.uniform(30, 60, (10, 2)).astype(np.float32)  # corrupt
    res = sim3opt.optimize_sim3(
        K, K, jnp.asarray(X1), jnp.asarray(X2), jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(n, jnp.float32), jnp.ones(n, jnp.float32), jnp.ones(n, bool),
        R12, t12, s12,
    )
    inl = np.asarray(res.inliers)
    assert inl[:10].sum() == 0
    assert inl[10:].mean() > 0.95


def circle_poses(P, radius=5.0):
    """Ground-truth world->camera sim3 poses around a circle, s=1."""
    Rs, ts, ss = [], [], []
    for k in range(P):
        ang = 2 * np.pi * k / P
        w = np.array([0.0, ang, 0.0], np.float32)
        Rwc = np.asarray(lie.so3_exp(jnp.asarray(w)))
        cw = np.array([radius * np.sin(ang), 0.0, radius * (1 - np.cos(ang))], np.float32)
        Rcw = Rwc.T
        tcw = -Rcw @ cw
        Rs.append(Rcw), ts.append(tcw), ss.append(1.0)
    return np.array(Rs), np.array(ts), np.array(ss, np.float32)


def rel_sim3(Ri, ti, si, Rj, tj, sj):
    """S_ji = S_j * S_i^-1."""
    Rii, tii, sii = lie.sim3_inverse(jnp.asarray(Ri), jnp.asarray(ti), jnp.asarray(si))
    return lie.sim3_compose(jnp.asarray(Rj), jnp.asarray(tj), jnp.asarray(sj), Rii, tii, sii)


def test_essential_graph_closes_loop(rng):
    P = 24
    Rt, tt, st = circle_poses(P)
    # exact measurements: consecutive odometry + one loop edge (P-1 -> 0)
    ei, ej, Rm, tm, sm = [], [], [], [], []
    for k in range(P - 1):
        # edge (i=k, j=k+1) with measurement S_ji = S_{k+1} S_k^-1
        Rr, tr, sr = rel_sim3(Rt[k], tt[k], st[k], Rt[k + 1], tt[k + 1], st[k + 1])
        ei.append(k), ej.append(k + 1)
        Rm.append(np.asarray(Rr)), tm.append(np.asarray(tr)), sm.append(float(sr))
    Rr, tr, sr = rel_sim3(Rt[P - 1], tt[P - 1], st[P - 1], Rt[0], tt[0], st[0])
    ei.append(P - 1), ej.append(0)
    Rm.append(np.asarray(Rr)), tm.append(np.asarray(tr)), sm.append(float(sr))

    # drifted initialization: integrate odometry with noise + scale drift
    R0 = [Rt[0]]
    t0 = [tt[0]]
    s0 = [1.0]
    for k in range(P - 1):
        noise = rng.standard_normal(7).astype(np.float32) * np.array([0.02] * 3 + [0.01] * 3 + [0.01], np.float32)
        dR, dt, ds = lie.sim3_exp(jnp.asarray(noise))
        Rn, tn, sn = lie.sim3_compose(
            dR, dt, ds,
            *lie.sim3_compose(jnp.asarray(Rm[k]), jnp.asarray(tm[k]), jnp.asarray(sm[k]),
                              jnp.asarray(R0[k]), jnp.asarray(t0[k]), jnp.asarray(np.float32(s0[k]))),
        )
        R0.append(np.asarray(Rn)), t0.append(np.asarray(tn)), s0.append(float(sn))

    fixed = np.zeros(P, bool)
    fixed[0] = True
    res = sim3opt.optimize_essential_graph(
        jnp.asarray(np.array(R0)), jnp.asarray(np.array(t0)), jnp.asarray(np.array(s0, np.float32)),
        jnp.asarray(np.array(ei, np.int32)), jnp.asarray(np.array(ej, np.int32)),
        jnp.asarray(np.array(Rm)), jnp.asarray(np.array(tm)), jnp.asarray(np.array(sm, np.float32)),
        jnp.ones(P, bool), jnp.asarray(fixed),
    )
    # consistent measurements + fixed anchor => recover ground truth
    err_t = np.abs(np.asarray(res.t) - tt).max()
    err_s = np.abs(np.asarray(res.s) - st).max()
    err_R = np.abs(np.asarray(res.R) - Rt).max()
    # initialization drift for comparison
    drift_t = np.abs(np.array(t0) - tt).max()
    assert drift_t > 0.1  # the test is non-trivial
    assert err_t < 0.02, err_t
    assert err_s < 0.01, err_s
    assert err_R < 0.01, err_R


def test_essential_graph_ignores_invalid_edges(rng):
    P = 8
    Rt, tt, st = circle_poses(P)
    ei, ej, Rm, tm, sm = [], [], [], [], []
    for k in range(P - 1):
        Rr, tr, sr = rel_sim3(Rt[k], tt[k], st[k], Rt[k + 1], tt[k + 1], st[k + 1])
        ei.append(k), ej.append(k + 1)
        Rm.append(np.asarray(Rr)), tm.append(np.asarray(tr)), sm.append(float(sr))
    # bogus edge, masked out
    ei.append(0), ej.append(4)
    Rm.append(np.eye(3, dtype=np.float32)), tm.append(np.ones(3, np.float32) * 99), sm.append(5.0)
    valid = np.ones(len(ei), bool)
    valid[-1] = False
    fixed = np.zeros(P, bool)
    fixed[0] = True
    res = sim3opt.optimize_essential_graph(
        jnp.asarray(Rt), jnp.asarray(tt), jnp.asarray(st),
        jnp.asarray(np.array(ei, np.int32)), jnp.asarray(np.array(ej, np.int32)),
        jnp.asarray(np.array(Rm)), jnp.asarray(np.array(tm)), jnp.asarray(np.array(sm, np.float32)),
        jnp.asarray(valid), jnp.asarray(fixed),
    )
    # already at optimum of valid edges: must not move
    assert np.abs(np.asarray(res.t) - tt).max() < 1e-3
