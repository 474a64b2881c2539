"""Cumulative-strip bisection of the LM iteration inside bundle_adjustment
(VERDICT r4 item #3). Each variant executes the iteration body only up to a
named stage (later stages replaced by cheap placeholders that still feed the
carry, so nothing is dead-code-eliminated), inside the same 10-iteration scan.
The per-stage time delta localizes the latency.

Stages (cumulative):
  floor — carry arithmetic only
  A     — chi2 + robust weights + Jacobians (gathers + per-obs algebra)
  B     — + Hpp/bp/Hll/bl one-hot reductions
  C     — + U build via one-hot MXU matmul
  D     — + Hll^-1, T, Schur S, rhs
  E     — + Cholesky solve + dl back-substitution + pose/point update
  F     — + cost recompute + accept/reject (the full iteration)
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
STAGES = ["floor", "A", "B", "C", "D1", "D2", "D", "E1", "E2", "E", "F"]


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
    return dict(K=K, R=jnp.asarray(R), t=jnp.asarray(t), pts=jnp.asarray(pts),
                op=jnp.asarray(op), oj=jnp.asarray(oj), uv=jnp.asarray(uv),
                osig=jnp.ones(O, jnp.float32), ovalid=jnp.ones(O, bool),
                fixed=jnp.asarray(fixed), pvalid=jnp.ones(M, bool))


def build(P, M, O, upto):
    lvl = STAGES.index(upto)
    delta = jnp.sqrt(CHI2)

    def ba(K, R, t, points, obs_pose, obs_point, obs_uv, obs_inv_sigma2,
           obs_valid, fixed_pose, point_valid):
        free = ~fixed_pose
        free6 = jnp.repeat(free, 6)
        oh_p = jax.nn.one_hot(obs_pose, P, dtype=jnp.float32)
        oh_m = jax.nn.one_hot(obs_point, M, dtype=jnp.float32)

        def chi2_of(Rp, tp, pts):
            Xc = (Rp[obs_pose] @ pts[obs_point][..., None])[..., 0] + tp[obs_pose]
            r = obs_uv - optim._project(K, Xc)
            s = obs_inv_sigma2 * jnp.sum(r * r, axis=-1)
            return jnp.where(Xc[..., 2] <= 1e-6, 1e6, s), r, Xc

        def total_cost(Rp, tp, pts, mask):
            s, _, _ = chi2_of(Rp, tp, pts)
            return jnp.sum(jnp.where(mask, optim.huber_cost(s, delta), 0.0))

        def body(carry, _):
            Rp, tp, pts, lam, cost = carry
            if lvl >= 1:  # A
                s, r, Xc = chi2_of(Rp, tp, pts)
                w = obs_inv_sigma2 * optim.huber_weight(s, delta)
                w = jnp.where(obs_valid & (Xc[..., 2] > 1e-6), w, 0.0)
                Jp = optim._proj_jacobian(K, Xc)
                A = -jnp.concatenate([Jp, -Jp @ lie.hat(Xc)], axis=-1)
                B = -(Jp @ Rp[obs_pose])
                wA = w[:, None, None] * A
                cost = cost + 1e-20 * (jnp.sum(wA[0]) + jnp.sum(B[0]))
            if lvl >= 2:  # B
                ha = jnp.einsum("oik,oil->okl", wA, A).reshape(O, 36)
                hb = jnp.einsum("oik,oil->okl",
                                w[:, None, None] * B, B).reshape(O, 9)
                ga = -jnp.einsum("oik,oi->ok", wA, r)
                gb = -jnp.einsum("oik,oi->ok", w[:, None, None] * B, r)
                Hpp = (oh_p.T @ ha).reshape(P, 6, 6)
                bp = oh_p.T @ ga
                Hll = (oh_m.T @ hb).reshape(M, 3, 3)
                bl = oh_m.T @ gb
                cost = cost + 1e-20 * (jnp.sum(Hpp[0]) + jnp.sum(Hll[0]))
            if lvl >= 3:  # C
                Wblk = jnp.einsum("oik,oil->okl", wA, B)  # (O, 6, 3)
                WP = (Wblk.reshape(O, 1, 18) * oh_p[:, :, None]).reshape(
                    O, P * 18)
                U = (oh_m.T @ WP).reshape(M, P, 6, 3)
                cost = cost + 1e-20 * jnp.sum(U[0, 0])
            if lvl >= 4:  # D1: damping + Hll inverse + T
                eye3 = jnp.eye(3)
                eye6 = jnp.eye(6)
                Hll_d = Hll + lam * (Hll * eye3) + 1e-6 * eye3
                Hpp_d = Hpp + lam * (Hpp * eye6) + 1e-6 * eye6
                Hll_inv = optim._inv3x3(Hll_d)
                Hll_inv = jnp.where(point_valid[:, None, None], Hll_inv, 0.0)
                T = jnp.einsum("mpik,mkl->mpil", U, Hll_inv)
                cost = cost + 1e-20 * jnp.sum(T[0, 0])
            if lvl >= 5:  # D2: transposes + Schur product
                T2 = T.transpose(1, 2, 0, 3).reshape(P * 6, M * 3)
                U2 = U.transpose(1, 2, 0, 3).reshape(P * 6, M * 3)
                S = -T2 @ U2.T
                cost = cost + 1e-20 * jnp.sum(S[0])
            if lvl >= 6:  # D: diag add + gauge + rhs
                S = S.reshape(P, 6, P, 6).at[
                    jnp.arange(P), :, jnp.arange(P), :].add(Hpp_d).reshape(
                        P * 6, P * 6)
                S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
                S = S + jnp.where(free6, 0.0, 1.0) * jnp.eye(P * 6)
                rhs = (bp - jnp.einsum("mpik,mk->pi", T, bl)).reshape(P * 6)
                rhs = jnp.where(free6, rhs, 0.0)
                cost = cost + 1e-20 * (jnp.sum(S[0]) + jnp.sum(rhs))
            if lvl >= 7:  # E1: the 96x96 solve only
                L = jnp.linalg.cholesky(S)
                y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
                dp = jax.scipy.linalg.solve_triangular(
                    L.T, y, lower=False).reshape(P, 6)
                cost = cost + 1e-20 * jnp.sum(dp)
            if lvl >= 8:  # E2: + dl back-substitution
                dl = jnp.einsum("mkl,ml->mk", Hll_inv,
                                bl - jnp.einsum("mpik,pi->mk", U, dp))
                dl = jnp.where(point_valid[:, None], dl, 0.0)
                cost = cost + 1e-20 * jnp.sum(dl[0])
            if lvl >= 9:  # E: + se3_exp + update
                dRp, dtp = lie.se3_exp(dp)
                R_new = dRp @ Rp
                t_new = (dRp @ tp[..., None])[..., 0] + dtp
                pts_new = pts + dl
            if lvl >= 10:  # F: cost recompute + accept
                new_cost = total_cost(R_new, t_new, pts_new, obs_valid)
                accept = new_cost < cost
                Rp = jnp.where(accept, R_new, Rp)
                tp = jnp.where(accept, t_new, tp)
                pts = jnp.where(accept, pts_new, pts)
                lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-7),
                                jnp.minimum(lam * 5.0, 1e6))
                cost = jnp.where(accept, new_cost, cost)
            elif lvl >= 9:
                Rp, tp, pts = R_new, t_new, pts_new
                lam = lam * 1.0001
            else:
                lam = lam * 1.0001
            return (Rp, tp, pts, lam, cost), None

        init = (R, t, points, jnp.asarray(1e-4), jnp.asarray(0.0))
        (Rp, tp, pts, lam, cost), _ = jax.lax.scan(body, init, None, length=10)
        return Rp, tp, pts, cost

    return jax.jit(ba)


def timeit_pipe(fn, d, n=10):
    out = fn(d["K"], d["R"], d["t"], d["pts"], d["op"], d["oj"], d["uv"],
             d["osig"], d["ovalid"], d["fixed"], d["pvalid"])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(d["K"], d["R"], d["t"], d["pts"], d["op"], d["oj"], d["uv"],
                 d["osig"], d["ovalid"], d["fixed"], d["pvalid"])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print("device:", jax.devices()[0])
    P, M, O = 16, 2048, 8192
    d = make(P, M, O)
    prev = 0.0
    for st in STAGES:
        fn = build(P, M, O, st)
        ms = timeit_pipe(fn, d)
        print(f"upto {st:5s}: {ms:7.2f} ms  (+{ms - prev:6.2f})", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
