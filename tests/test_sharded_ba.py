"""Sharded global bundle adjustment over a device mesh (VERDICT round-2 #8).

The matrix-free CG solver's work is observation-wise, so it data-parallelizes
by sharding the observation axis and psum-ing every O-axis reduction
(parallel/sharded_ba.py). These tests assert the sharded solve equals the
single-device solve on the 8-device virtual CPU mesh. Reference analogue:
Ceres `options.num_threads = 4` (CeresOptimizer.cc:516) — the reference's
only BA parallelism.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from ceres_mono_orb_slam2_tpu.ops import lie, optim, sim3opt
from ceres_mono_orb_slam2_tpu.parallel.sharded_ba import (
    bundle_adjustment_cg_sharded, optimize_essential_graph_sharded)


def _make_problem(rng, P=6, M=300, O=1504):
    """Synthetic BA problem; O divisible by 8 for the mesh axis."""
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)
    pts_gt = np.stack(
        [rng.uniform(-3, 3, M), rng.uniform(-2, 2, M), rng.uniform(4, 12, M)], -1)
    R = np.tile(np.eye(3, dtype=np.float32), (P, 1, 1))
    t = np.stack([np.array([0.4 * i, 0, 0], np.float32) for i in range(P)])
    op = rng.integers(0, P, O).astype(np.int32)
    oj = rng.integers(0, M, O).astype(np.int32)
    Xc = np.einsum("oij,oj->oi", R[op], pts_gt[oj]) + t[op]
    uv = np.stack(
        [500 * Xc[:, 0] / Xc[:, 2] + 320, 500 * Xc[:, 1] / Xc[:, 2] + 240], -1)
    uv = (uv + rng.normal(0, 0.3, uv.shape)).astype(np.float32)
    pts0 = (pts_gt + rng.normal(0, 0.15, pts_gt.shape)).astype(np.float32)
    t0 = (t + rng.normal(0, 0.05, t.shape)).astype(np.float32)
    fixed = np.zeros(P, bool)
    fixed[0] = True
    valid = np.ones(O, bool)
    valid[-7:] = False  # padded tail rows must not contribute
    return (K, R, t0, pts0, op, oj, uv,
            np.ones(O, np.float32), valid, fixed, np.ones(M, bool))


@pytest.fixture
def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    return Mesh(np.array(devs[:8]), ("obs",))


def test_sharded_cg_matches_single_device(rng, mesh8):
    args = _make_problem(rng)
    single = optim.bundle_adjustment_cg(
        *[jnp.asarray(a) for a in args], iters=15, cg_iters=40, robust=True)
    sharded = bundle_adjustment_cg_sharded(
        mesh8, "obs", *args, iters=15, cg_iters=40, robust=True)
    jax.block_until_ready(sharded)
    # reduction order differs across shards -> tolerances, not bit equality
    np.testing.assert_allclose(np.asarray(sharded.R), np.asarray(single.R),
                               rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(sharded.t), np.asarray(single.t),
                               rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(sharded.points),
                               np.asarray(single.points), rtol=0, atol=2e-2)
    # the solves agree pointwise much tighter than either moved the state
    moved = np.abs(np.asarray(single.t) - args[2]).max()
    assert moved > 1e-2, "problem too easy: solver barely moved"
    # inlier classification identical (sharded output is O-sharded; gather it)
    np.testing.assert_array_equal(
        np.asarray(sharded.inlier_obs), np.asarray(single.inlier_obs))


def test_sharded_essential_graph_matches_single_device(rng, mesh8):
    """The sim3 pose-graph solve sharded over the EDGE axis equals the
    single-device solve and recovers the ground-truth loop closure.
    Reference analogue: CeresOptimizer::OptimizeEssentialGraph
    (CeresOptimizer.cc:737-957), single-threaded in the reference."""
    from tests.test_sim3opt import circle_poses, rel_sim3

    P = 24  # 23 odometry edges + 1 loop edge = 24, divisible by the mesh
    Rt, tt, st = circle_poses(P)
    ei, ej, Rm, tm, sm = [], [], [], [], []
    for k in range(P - 1):
        Rr, tr, sr = rel_sim3(Rt[k], tt[k], st[k], Rt[k + 1], tt[k + 1], st[k + 1])
        ei.append(k), ej.append(k + 1)
        Rm.append(np.asarray(Rr)), tm.append(np.asarray(tr)), sm.append(float(sr))
    Rr, tr, sr = rel_sim3(Rt[P - 1], tt[P - 1], st[P - 1], Rt[0], tt[0], st[0])
    ei.append(P - 1), ej.append(0)
    Rm.append(np.asarray(Rr)), tm.append(np.asarray(tr)), sm.append(float(sr))

    # drifted initialization: integrate odometry with noise
    R0, t0, s0 = [Rt[0]], [tt[0]], [1.0]
    for k in range(P - 1):
        noise = rng.standard_normal(7).astype(np.float32) * np.array(
            [0.02] * 3 + [0.01] * 3 + [0.01], np.float32)
        dR, dt, ds = lie.sim3_exp(jnp.asarray(noise))
        Rn, tn, sn = lie.sim3_compose(
            dR, dt, ds,
            *lie.sim3_compose(jnp.asarray(Rm[k]), jnp.asarray(tm[k]),
                              jnp.asarray(sm[k]), jnp.asarray(R0[k]),
                              jnp.asarray(t0[k]), jnp.asarray(np.float32(s0[k]))))
        R0.append(np.asarray(Rn)), t0.append(np.asarray(tn)), s0.append(float(sn))

    fixed = np.zeros(P, bool)
    fixed[0] = True
    args = (np.array(R0), np.array(t0), np.array(s0, np.float32),
            np.array(ei, np.int32), np.array(ej, np.int32),
            np.array(Rm), np.array(tm), np.array(sm, np.float32),
            np.ones(P, bool), fixed)
    single = sim3opt.optimize_essential_graph(*[jnp.asarray(a) for a in args])
    sharded = optimize_essential_graph_sharded(mesh8, "obs", *args)
    jax.block_until_ready(sharded)
    np.testing.assert_allclose(np.asarray(sharded.R), np.asarray(single.R),
                               rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(sharded.t), np.asarray(single.t),
                               rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(sharded.s), np.asarray(single.s),
                               rtol=0, atol=1e-3)
    # and both recover the ground truth from the drifted initialization
    drift_t = np.abs(np.array(t0) - tt).max()
    assert drift_t > 0.1
    assert np.abs(np.asarray(sharded.t) - tt).max() < 0.02
    assert np.abs(np.asarray(sharded.s) - st).max() < 0.01


def test_sharded_cg_improves_cost(rng, mesh8):
    args = _make_problem(rng, P=8, M=400, O=2000)
    (K, R, t0, pts0, op, oj, uv, w, valid, fixed, pvalid) = args

    def cost(res):
        Rr, tr, pr = (np.asarray(res.R), np.asarray(res.t), np.asarray(res.points))
        Xc = np.einsum("oij,oj->oi", Rr[op], pr[oj]) + tr[op]
        prj = np.stack(
            [500 * Xc[:, 0] / Xc[:, 2] + 320, 500 * Xc[:, 1] / Xc[:, 2] + 240], -1)
        return float((((uv - prj) ** 2).sum(-1) * valid).sum())

    from types import SimpleNamespace

    c0 = cost(SimpleNamespace(R=R, t=t0, points=pts0))
    res = bundle_adjustment_cg_sharded(
        mesh8, "obs", *args, iters=20, cg_iters=50, robust=True)
    jax.block_until_ready(res)
    assert cost(res) < 0.1 * c0
