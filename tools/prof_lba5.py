"""Candidate rewrite of the bundle_adjustment LM iteration, raced against the
production solver for time and parity (VERDICT r4 item #3).

Design (TPU-first):
  - ALL index reductions via one-hot MXU matmuls; the (O, M) one-hot is
    consumed by ONE fused matmul per iteration (concat [hb | gb | WP] on the
    contraction's rhs) so its 64 MB materialization is read once, not 3x.
  - NO (M, P, 6, 3) <-> (P, 6, M, 3) transposes: the inner dim 3 lane-pads
    3 -> 128 on TPU (42x traffic blowup, the measured D2 cost). Everything
    stays in (M, P*18) lane-aligned layout; the Schur product is one clean
    2D transpose (M,288)->(288,M) + (288,M)@(M,288) matmul + a partial trace
    over the k-pairs.
  - 96x96 Cholesky kept (measured cheap: +0.25 ms / 10 iters).
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from ceres_mono_orb_slam2_tpu.ops import lie, optim

CHI2 = 5.991


def make(P, M, O, seed=0):
    rng = np.random.default_rng(seed)
    K = jnp.asarray([[718.856, 0, 607.19], [0, 718.856, 185.2], [0, 0, 1]],
                    jnp.float32)
    pts = np.stack([rng.uniform(-10, 10, M), rng.uniform(-3, 3, M),
                    rng.uniform(5, 40, M)], -1).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (P, 1, 1))
    t = np.stack([np.array([0.5 * i, 0, 0], np.float32) for i in range(P)])
    op = np.sort(rng.integers(0, P, O).astype(np.int32))
    oj = rng.integers(0, M, O).astype(np.int32)
    Xc = np.einsum("oij,oj->oi", R[op], pts[oj]) + t[op]
    Kn = np.asarray(K)
    uv = np.stack([Kn[0, 0] * Xc[:, 0] / Xc[:, 2] + Kn[0, 2],
                   Kn[1, 1] * Xc[:, 1] / Xc[:, 2] + Kn[1, 2]], -1)
    uv = (uv + rng.normal(0, 0.5, uv.shape)).astype(np.float32)
    fixed = np.zeros(P, bool)
    fixed[:4] = True
    return (K, jnp.asarray(R), jnp.asarray(t), jnp.asarray(pts),
            jnp.asarray(op), jnp.asarray(oj), jnp.asarray(uv),
            jnp.ones(O, jnp.float32), jnp.ones(O, bool), jnp.asarray(fixed),
            jnp.ones(M, bool))


@partial(jax.jit, static_argnames=("iters_huber", "iters_trimmed"))
def ba_new(K, R, t, points, obs_pose, obs_point, obs_uv, obs_inv_sigma2,
           obs_valid, fixed_pose, point_valid, iters_huber=5,
           iters_trimmed=10):
    P = R.shape[0]
    M = points.shape[0]
    O = obs_pose.shape[0]
    delta = jnp.sqrt(CHI2)
    free = ~fixed_pose
    free6 = jnp.repeat(free, 6)
    f32 = jnp.float32
    # iteration-invariant one-hots (hoisted out of the scan by XLA)
    oh_p = jax.nn.one_hot(obs_pose, P, dtype=f32)  # (O, P)
    oh_m = jax.nn.one_hot(obs_point, M, dtype=f32)  # (O, M)
    # lane-block index of each obs' pose within the (M, P*18) flat layout
    eye3 = jnp.eye(3, dtype=f32)
    eye6 = jnp.eye(6, dtype=f32)

    def chi2_of(Rp, tp, pts):
        Xc = (Rp[obs_pose] @ pts[obs_point][..., None])[..., 0] + tp[obs_pose]
        r = obs_uv - optim._project(K, Xc)
        s = obs_inv_sigma2 * jnp.sum(r * r, axis=-1)
        behind = Xc[..., 2] <= 1e-6
        return jnp.where(behind, 1e6, s), r, Xc

    def total_cost(Rp, tp, pts, mask, robust):
        s, _, _ = chi2_of(Rp, tp, pts)
        c = jnp.where(robust, optim.huber_cost(s, delta), s)
        return jnp.sum(jnp.where(mask, c, 0.0))

    def lm_iteration(Rp, tp, pts, lam, cost, mask, robust):
        s, r, Xc = chi2_of(Rp, tp, pts)
        w = obs_inv_sigma2 * jnp.where(robust, optim.huber_weight(s, delta), 1.0)
        w = jnp.where(mask & (Xc[..., 2] > 1e-6), w, 0.0)
        Jp = optim._proj_jacobian(K, Xc)  # (O, 2, 3)
        A = -jnp.concatenate([Jp, -Jp @ lie.hat(Xc)], axis=-1)  # (O, 2, 6)
        B = -(Jp @ Rp[obs_pose])  # (O, 2, 3)
        wA = w[:, None, None] * A

        # pose-side reductions: ONE (P, O) @ (O, 42) matmul
        ha = jnp.einsum("oik,oil->okl", wA, A).reshape(O, 36)
        ga = -jnp.einsum("oik,oi->ok", wA, r)
        pose_pack = oh_p.T @ jnp.concatenate([ha, ga], axis=1)  # (P, 42)
        Hpp = pose_pack[:, :36].reshape(P, 6, 6)
        bp = pose_pack[:, 36:42]

        # point-side reductions: ONE (M, O) @ (O, 12 + 18P) matmul
        wB = w[:, None, None] * B
        hb = jnp.einsum("oik,oil->okl", wB, B).reshape(O, 9)
        gb = -jnp.einsum("oik,oi->ok", wB, r)
        Wblk = jnp.einsum("oik,oil->okl", wA, B).reshape(O, 18)  # A^T w B
        WP = (Wblk[:, None, :] * oh_p[:, :, None]).reshape(O, P * 18)
        point_pack = oh_m.T @ jnp.concatenate([hb, gb, WP], axis=1)
        Hll = point_pack[:, :9].reshape(M, 3, 3)
        bl = point_pack[:, 9:12]
        Uf = point_pack[:, 12:]  # (M, P*18) = U[m, p, i, k] flat

        # damping
        Hll_d = Hll + lam * (Hll * eye3) + 1e-6 * eye3
        Hpp_d = Hpp + lam * (Hpp * eye6) + 1e-6 * eye6
        Hll_inv = optim._inv3x3(Hll_d)
        Hll_inv = jnp.where(point_valid[:, None, None], Hll_inv, 0.0)

        # T[m, a, l] = sum_k U[m, a, k] Hinv[m, k, l], a = (p, i) in [96)
        U3 = Uf.reshape(M, P * 6, 3)
        Tf = jnp.einsum("mak,mkl->mal", U3, Hll_inv).reshape(M, P * 18)

        # Schur: S[a, b] = Hpp_d - sum_{m,k} T[m,a,k] U[m,b,k]
        # = partial k-trace of (P*18, M) @ (M, P*18)
        G = Tf.T @ Uf  # (288P'... (P*18, P*18))
        Gk = G.reshape(P * 6, 3, P * 6, 3)
        S = -(Gk[:, 0, :, 0] + Gk[:, 1, :, 1] + Gk[:, 2, :, 2])
        bd = jnp.einsum("pq,pij->piqj", jnp.eye(P, dtype=f32), Hpp_d)
        S = S + bd.reshape(P * 6, P * 6)
        # rhs[a] = bp[a] - sum_{m,k} T[m,a,k] bl[m,k]
        D = jnp.einsum("mak,mk->a", Tf.reshape(M, P * 6, 3), bl)
        rhs = bp.reshape(P * 6) - D

        # gauge
        S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
        S = S + jnp.where(free6, 0.0, 1.0) * jnp.eye(P * 6, dtype=f32)
        rhs = jnp.where(free6, rhs, 0.0)

        L = jnp.linalg.cholesky(S)
        y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
        dp = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

        # back-substitution: dl = Hinv (bl - U^T dp)
        Ud = jnp.einsum("mak,a->mk", U3, dp)
        dl = jnp.einsum("mkl,ml->mk", Hll_inv, bl - Ud)
        dl = jnp.where(point_valid[:, None], dl, 0.0)

        dRp, dtp = lie.se3_exp(dp.reshape(P, 6))
        R_new = dRp @ Rp
        t_new = (dRp @ tp[..., None])[..., 0] + dtp
        pts_new = pts + dl
        new_cost = total_cost(R_new, t_new, pts_new, mask, robust)
        accept = new_cost < cost
        Rp = jnp.where(accept, R_new, Rp)
        tp = jnp.where(accept, t_new, tp)
        pts = jnp.where(accept, pts_new, pts)
        lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-7),
                        jnp.minimum(lam * 5.0, 1e6))
        cost = jnp.where(accept, new_cost, cost)
        return Rp, tp, pts, lam, cost

    def run_pass(Rp, tp, pts, mask, robust, n_iters):
        if n_iters == 0:
            return Rp, tp, pts, total_cost(Rp, tp, pts, mask, robust)

        def body(carry, _):
            Rp, tp, pts, lam, cost = carry
            Rp, tp, pts, lam, cost = lm_iteration(
                Rp, tp, pts, lam, cost, mask, robust)
            return (Rp, tp, pts, lam, cost), None

        cost0 = total_cost(Rp, tp, pts, mask, robust)
        init = (Rp, tp, pts, jnp.asarray(1e-4, f32), cost0)
        (Rp, tp, pts, _, cost), _ = jax.lax.scan(body, init, None,
                                                 length=n_iters)
        return Rp, tp, pts, cost

    R1, t1, pts1, _ = run_pass(lie.so3_project(R), t, points, obs_valid,
                               True, iters_huber)
    R1 = lie.so3_project(R1)
    s, _, Xc = chi2_of(R1, t1, pts1)
    keep = obs_valid & (s <= CHI2) & (Xc[..., 2] > 1e-6)
    R2, t2, pts2, cost = run_pass(R1, t1, pts1, keep, False, iters_trimmed)
    R2 = lie.so3_project(R2)
    s_f, _, Xc2 = chi2_of(R2, t2, pts2)
    inl = obs_valid & (s_f <= CHI2) & (Xc2[..., 2] > 1e-6)
    return R2, t2, pts2, inl, cost


def timeit_pipe(fn, args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def main():
    print("device:", jax.devices()[0])
    for (P, M, O) in [(16, 2048, 8192), (48, 2048, 8192)]:
        args = make(P, M, O)
        ms_old, out_old = timeit_pipe(
            lambda *a: optim.bundle_adjustment(*a, iters_huber=5,
                                               iters_trimmed=10), args)
        ms_new, out_new = timeit_pipe(
            lambda *a: ba_new(*a, iters_huber=5, iters_trimmed=10), args)
        dR = float(jnp.abs(out_new[0] - out_old.R).max())
        dt = float(jnp.abs(out_new[1] - out_old.t).max())
        dpts = float(jnp.abs(out_new[2] - out_old.points).max())
        ninl_old = int(out_old.inlier_obs.sum())
        ninl_new = int(out_new[3].sum())
        print(f"P={P:3d} 5+10: old {ms_old:7.2f} ms  new {ms_new:7.2f} ms  "
              f"dR={dR:.2e} dt={dt:.2e} dpts={dpts:.2e} "
              f"inl {ninl_old}/{ninl_new} cost {float(out_old.cost):.1f}/"
              f"{float(out_new[4]):.1f}", flush=True)


if __name__ == "__main__":
    main()
