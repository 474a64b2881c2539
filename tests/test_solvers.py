"""RANSAC solver tests: two-view initialization, PnP, Horn sim3."""

import numpy as np
import jax
import jax.numpy as jnp

from ceres_mono_orb_slam2_tpu.ops import lie, pnp, sim3solver, twoview

K = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], jnp.float32)


def scene_and_views(rng, n=300, baseline=0.5, depth=(4.0, 10.0)):
    pts = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(*depth, n)], -1
    ).astype(np.float32)
    xi = np.array([baseline, 0.02, 0.01, 0.01, -0.08, 0.02], np.float32)
    R21, t21 = lie.se3_exp(jnp.asarray(xi))

    def proj(X):
        return np.stack([500 * X[:, 0] / X[:, 2] + 320, 500 * X[:, 1] / X[:, 2] + 240], -1)

    X2 = pts @ np.asarray(R21).T + np.asarray(t21)
    uv1 = proj(pts).astype(np.float32)
    uv2 = proj(X2).astype(np.float32)
    inb = (
        (uv1[:, 0] > 0) & (uv1[:, 0] < 640) & (uv1[:, 1] > 0) & (uv1[:, 1] < 480)
        & (uv2[:, 0] > 0) & (uv2[:, 0] < 640) & (uv2[:, 1] > 0) & (uv2[:, 1] < 480)
    )
    return pts, np.asarray(R21), np.asarray(t21), uv1, uv2, inb


def test_two_view_initialization(rng):
    pts, R21, t21, uv1, uv2, inb = scene_and_views(rng)
    uv1 += rng.standard_normal(uv1.shape).astype(np.float32) * 0.4
    uv2 += rng.standard_normal(uv2.shape).astype(np.float32) * 0.4
    # 15% mismatches
    n = len(pts)
    bad = rng.random(n) < 0.15
    uv2[bad] = rng.uniform(0, 640, (bad.sum(), 2)).astype(np.float32)
    valid = inb.copy()
    res = twoview.initialize_two_view(
        jax.random.PRNGKey(0), K, jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid)
    )
    assert bool(res.success)
    # direction of translation matches (scale is free in mono)
    t_est = np.asarray(res.t21)
    t_dir = t21 / np.linalg.norm(t21)
    cos = abs(np.dot(t_est / np.linalg.norm(t_est), t_dir))
    assert cos > 0.99
    # rotation error
    dR = np.asarray(res.R21) @ R21.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 1.0
    # triangulated points match ground truth up to the scale factor
    tri = np.asarray(res.triangulated)
    assert tri.sum() > 100
    assert not np.any(tri & bad)  # mismatches never triangulated
    X = np.asarray(res.points3d)[tri]
    scale = np.median(X[:, 2] / pts[tri][:, 2])
    err = np.linalg.norm(X / scale - pts[tri], axis=-1)
    # expected depth uncertainty here: z^2 * sigma_px / (f * b) ~ 0.14 at z=8
    assert np.median(err) < 0.25


def test_two_view_rejects_degenerate(rng):
    """Pure-rotation pair must not initialize (no parallax)."""
    pts, _, _, uv1, _, inb = scene_and_views(rng, baseline=0.0)
    w = np.array([0.0, -0.06, 0.01], np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    X2 = pts @ R.T
    uv2 = np.stack([500 * X2[:, 0] / X2[:, 2] + 320, 500 * X2[:, 1] / X2[:, 2] + 240], -1).astype(np.float32)
    res = twoview.initialize_two_view(
        jax.random.PRNGKey(1), K, jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(inb)
    )
    assert not bool(res.success)


def test_ransac_pnp(rng):
    pts, R21, t21, uv1, uv2, inb = scene_and_views(rng, n=200)
    uv2 += rng.standard_normal(uv2.shape).astype(np.float32) * 0.3
    bad = rng.random(len(pts)) < 0.3
    uv2[bad] += rng.uniform(20, 100, (bad.sum(), 2)).astype(np.float32)
    res = pnp.ransac_pnp(
        jax.random.PRNGKey(2), K, jnp.asarray(pts), jnp.asarray(uv2),
        jnp.ones(len(pts), jnp.float32), jnp.asarray(inb),
    )
    assert bool(res.success)
    Ri, ti = lie.se3_inverse(jnp.asarray(R21), jnp.asarray(t21))
    Rd, td = lie.se3_compose(res.R, res.t, Ri, ti)
    err = np.linalg.norm(np.asarray(lie.se3_log(Rd, td)))
    assert err < 0.02, err
    inl = np.asarray(res.inliers)
    assert inl[bad & inb].mean() < 0.1
    assert inl[(~bad) & inb].mean() > 0.9


def test_horn_sim3_exact(rng):
    P2 = rng.standard_normal((10, 3)).astype(np.float32)
    xi = jnp.asarray(np.array([0.3, -0.2, 0.5, 0.2, 0.1, -0.3, np.log(1.7)], np.float32))
    Rg, tg, sg = lie.sim3_exp(xi)
    P1 = np.asarray(lie.sim3_apply(Rg, tg, sg, jnp.asarray(P2)))
    R, t, s = sim3solver.horn_sim3(jnp.asarray(P1), jnp.asarray(P2))
    np.testing.assert_allclose(np.asarray(R), np.asarray(Rg), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), np.asarray(tg), atol=1e-4)
    np.testing.assert_allclose(float(s), float(sg), atol=1e-4)


def test_horn_sim3_fix_scale(rng):
    P2 = rng.standard_normal((12, 3)).astype(np.float32)
    xi = jnp.asarray(np.array([0.1, 0.2, -0.1, 0.1, -0.2, 0.05, 0.0], np.float32))
    Rg, tg, sg = lie.sim3_exp(xi)
    P1 = np.asarray(lie.sim3_apply(Rg, tg, sg, jnp.asarray(P2)))
    R, t, s = sim3solver.horn_sim3(jnp.asarray(P1), jnp.asarray(P2), fix_scale=True)
    assert float(s) == 1.0
    np.testing.assert_allclose(np.asarray(R), np.asarray(Rg), atol=1e-4)


def test_ransac_sim3(rng):
    n = 100
    X2 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 9, n)], -1).astype(np.float32)
    xi = jnp.asarray(np.array([0.2, -0.1, 0.3, 0.05, -0.04, 0.08, np.log(1.4)], np.float32))
    Rg, tg, sg = lie.sim3_exp(xi)
    X1 = np.asarray(lie.sim3_apply(Rg, tg, sg, jnp.asarray(X2)))

    def proj(X):
        return np.stack([500 * X[:, 0] / X[:, 2] + 320, 500 * X[:, 1] / X[:, 2] + 240], -1).astype(np.float32)

    uv1, uv2 = proj(X1), proj(X2)
    bad = rng.random(n) < 0.3
    X2c = X2.copy()
    X2c[bad] += rng.uniform(0.5, 2.0, (bad.sum(), 3)).astype(np.float32)
    res = sim3solver.ransac_sim3(
        jax.random.PRNGKey(3), K, K, jnp.asarray(X1), jnp.asarray(X2c),
        jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(n, jnp.float32), jnp.ones(n, jnp.float32), jnp.ones(n, bool),
    )
    assert bool(res.success)
    assert abs(float(res.s) - float(sg)) < 0.05
    assert np.abs(np.asarray(res.R) - np.asarray(Rg)).max() < 0.02
    inl = np.asarray(res.inliers)
    assert inl[bad].mean() < 0.15
    assert inl[~bad].mean() > 0.9


def test_p3p_beats_dlt_at_low_inlier_ratio(rng):
    """VERDICT r2 item #6: the reference relocalizes with EPnP minimal sets
    of 4 (PnPsolver.cc:68-157); minimal sets of 3 (P3P) dominate the old
    6-point DLT below ~50% inliers (good-sample probability w^3 vs w^6).
    At 30% inliers the DLT path must fail and P3P must succeed."""
    import jax

    from ceres_mono_orb_slam2_tpu.ops import lie, pnp

    N = 200
    K = jnp.asarray(np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32))
    pts = np.stack([rng.uniform(-5, 5, N), rng.uniform(-3, 3, N),
                    rng.uniform(4, 12, N)], -1).astype(np.float32)
    Rgt = np.asarray(lie.so3_exp(jnp.asarray(np.array([0.2, -0.3, 0.1], np.float32))))
    tgt = np.array([0.4, -0.2, 0.5], np.float32)
    Xc = pts @ Rgt.T + tgt
    uv = np.stack([500 * Xc[:, 0] / Xc[:, 2] + 320,
                   500 * Xc[:, 1] / Xc[:, 2] + 240], -1).astype(np.float32)
    uv += rng.normal(0, 0.5, uv.shape).astype(np.float32)
    out_idx = rng.choice(N, int(N * 0.7), replace=False)  # 30% inliers
    uv[out_idx] = rng.uniform([0, 0], [640, 480], (len(out_idx), 2)).astype(np.float32)
    w = jnp.ones(N, jnp.float32)
    valid = jnp.ones(N, bool)

    def good(r):
        if not bool(r.success):
            return False
        return (np.linalg.norm(np.asarray(r.R) - Rgt) < 0.05
                and np.linalg.norm(np.asarray(r.t) - tgt) < 0.1)

    n_p3p = n_dlt = 0
    for s in range(5):
        key = jax.random.PRNGKey(s)
        n_p3p += good(pnp.ransac_pnp(key, K, jnp.asarray(pts), jnp.asarray(uv), w, valid, solver="p3p"))
        n_dlt += good(pnp.ransac_pnp(key, K, jnp.asarray(pts), jnp.asarray(uv), w, valid, solver="dlt"))
    assert n_p3p >= 4, n_p3p
    assert n_dlt <= 1, n_dlt


def test_ransac_pnp_multi_round_robin(rng):
    """Batched all-candidate RANSAC (Tracking.cc:1039-1128 iterate(5)
    equivalent): the right candidate wins by inlier count."""
    import jax

    from ceres_mono_orb_slam2_tpu.ops import lie, pnp

    N, C = 120, 3
    K = jnp.asarray(np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32))
    pts = np.zeros((C, N, 3), np.float32)
    uv = np.zeros((C, N, 2), np.float32)
    valid = np.zeros((C, N), bool)
    Rgt = np.asarray(lie.so3_exp(jnp.asarray(np.array([0.1, 0.2, -0.1], np.float32))))
    tgt = np.array([0.2, 0.1, 0.3], np.float32)
    for c in range(C):
        p = np.stack([rng.uniform(-5, 5, N), rng.uniform(-3, 3, N),
                      rng.uniform(4, 12, N)], -1).astype(np.float32)
        Xc = p @ Rgt.T + tgt
        u = np.stack([500 * Xc[:, 0] / Xc[:, 2] + 320,
                      500 * Xc[:, 1] / Xc[:, 2] + 240], -1).astype(np.float32)
        if c != 1:  # candidates 0, 2: pure junk geometry
            u = rng.uniform([0, 0], [640, 480], (N, 2)).astype(np.float32)
        pts[c], uv[c] = p, u
        valid[c] = True
    res = pnp.ransac_pnp_multi(jax.random.PRNGKey(0), K, jnp.asarray(pts),
                               jnp.asarray(uv), jnp.ones((C, N), jnp.float32),
                               jnp.asarray(valid))
    ns = np.asarray(res.n_inliers)
    assert np.argmax(ns) == 1
    assert bool(np.asarray(res.success)[1])
    assert np.linalg.norm(np.asarray(res.R[1]) - Rgt) < 0.05
