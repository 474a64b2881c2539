"""Variant shootout for the LM iteration inside bundle_adjustment
(VERDICT r4 item #3). Times full 5+5-iteration solves at the production
session shape with individual suspect ops swapped for TPU-friendlier forms:

  base   — current optim.bundle_adjustment structure
  chol   — 384x384 LU -> Cholesky + triangular solves
  onehot — (M,P,6,3) scatter-add -> one-hot MXU matmul
  seg    — Hpp/bp/Hll/bl generic scatters -> sorted-segment formulation
  all    — every swap together
  floor  — scan of 10 trivial iterations (dispatch/scan overhead floor)
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


def make(P, M, O, seed=0, sort=False):
    rng = np.random.default_rng(seed)
    K = jnp.asarray([[718.856, 0, 607.19], [0, 718.856, 185.2], [0, 0, 1]],
                    jnp.float32)
    pts = np.stack([rng.uniform(-10, 10, M), rng.uniform(-3, 3, M),
                    rng.uniform(5, 40, M)], -1).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (P, 1, 1))
    t = np.stack([np.array([0.5 * i, 0, 0], np.float32) for i in range(P)])
    op = rng.integers(0, P, O).astype(np.int32)
    oj = rng.integers(0, M, O).astype(np.int32)
    if sort:  # production _lba_build emits obs sorted by pose index
        order = np.lexsort((oj, op))
        op, oj = op[order], oj[order]
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


def build_ba(P, M, O, solve_kind="lu", u_kind="scatter", h_kind="scatter", skip_T=False):
    delta = jnp.sqrt(CHI2)

    def ba(K, R, t, points, obs_pose, obs_point, obs_uv, obs_inv_sigma2,
           obs_valid, fixed_pose, point_valid, iters_huber, iters_trimmed):
        free = ~fixed_pose
        free6 = jnp.repeat(free, 6)
        if u_kind == "onehot":
            oh_m = jax.nn.one_hot(obs_point, M, dtype=jnp.float32)  # (O, M)
        if h_kind == "onehot":
            oh_p = jax.nn.one_hot(obs_pose, P, dtype=jnp.float32)  # (O, P)

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
            Jp = optim._proj_jacobian(K, Xc)
            A = -jnp.concatenate([Jp, -Jp @ lie.hat(Xc)], axis=-1)
            B = -(Jp @ Rp[obs_pose])
            wA = w[:, None, None] * A
            ha = jnp.einsum("oik,oil->okl", wA, A).reshape(-1, 36)
            hb = jnp.einsum("oik,oil->okl", w[:, None, None] * B, B).reshape(-1, 9)
            ga = -jnp.einsum("oik,oi->ok", wA, r)
            gb = -jnp.einsum("oik,oi->ok", w[:, None, None] * B, r)
            if h_kind == "scatter":
                Hpp = jnp.zeros((P, 36)).at[obs_pose].add(ha).reshape(P, 6, 6)
                bp = jnp.zeros((P, 6)).at[obs_pose].add(ga)
                Hll = jnp.zeros((M, 9)).at[obs_point].add(hb).reshape(M, 3, 3)
                bl = jnp.zeros((M, 3)).at[obs_point].add(gb)
            elif h_kind == "seg":
                Hpp = jax.ops.segment_sum(ha, obs_pose, P,
                                          indices_are_sorted=True).reshape(P, 6, 6)
                bp = jax.ops.segment_sum(ga, obs_pose, P, indices_are_sorted=True)
                Hll = jax.ops.segment_sum(hb, obs_point, M).reshape(M, 3, 3)
                bl = jax.ops.segment_sum(gb, obs_point, M)
            else:  # onehot
                Hpp = (oh_p.T @ ha).reshape(P, 6, 6)
                bp = oh_p.T @ ga
                Hll = (oh_m.T @ hb).reshape(M, 3, 3)
                bl = oh_m.T @ gb
            Wblk = jnp.einsum("oik,oil->okl", wA, B)  # (O, 6, 3)

            eye3 = jnp.eye(3)
            eye6 = jnp.eye(6)
            Hll_d = Hll + lam * (Hll * eye3) + 1e-6 * eye3
            Hpp_d = Hpp + lam * (Hpp * eye6) + 1e-6 * eye6
            Hll_inv = optim._inv3x3(Hll_d)
            Hll_inv = jnp.where(point_valid[:, None, None], Hll_inv, 0.0)

            if u_kind == "scatter":
                U = jnp.zeros((M, P, 6, 3)).at[obs_point, obs_pose].add(Wblk)
                T = jnp.einsum("mpik,mkl->mpil", U, Hll_inv)
                T2 = T.transpose(1, 2, 0, 3).reshape(P * 6, M * 3)
                U2 = U.transpose(1, 2, 0, 3).reshape(P * 6, M * 3)
                S = -T2 @ U2.T
                rhs = (bp - jnp.einsum("mpik,mk->pi", T, bl)).reshape(P * 6)
                dl_of = lambda dp: jnp.einsum(
                    "mkl,ml->mk", Hll_inv,
                    bl - jnp.einsum("mpik,pi->mk", U, dp))
            else:  # onehot: U via (M,O)@(O,P*18) MXU matmul
                oh_pw = jax.nn.one_hot(obs_pose, P, dtype=jnp.float32)
                WP = (Wblk.reshape(O, 1, 18) * oh_pw[:, :, None]).reshape(O, P * 18)
                U = (oh_m.T @ WP).reshape(M, P, 6, 3)
                T = U if skip_T else jnp.einsum("mpik,mkl->mpil", U, Hll_inv)
                T2 = T.transpose(1, 2, 0, 3).reshape(P * 6, M * 3)
                U2 = U.transpose(1, 2, 0, 3).reshape(P * 6, M * 3)
                S = -T2 @ U2.T
                rhs = (bp - jnp.einsum("mpik,mk->pi", T, bl)).reshape(P * 6)
                dl_of = lambda dp: jnp.einsum(
                    "mkl,ml->mk", Hll_inv,
                    bl - jnp.einsum("mpik,pi->mk", U, dp))

            S = S.reshape(P, 6, P, 6).at[jnp.arange(P), :, jnp.arange(P), :].add(
                Hpp_d).reshape(P * 6, P * 6)
            S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
            S = S + jnp.where(free6, 0.0, 1.0) * jnp.eye(P * 6)
            rhs = jnp.where(free6, rhs, 0.0)

            if solve_kind == "none":
                dp = (rhs * 1e-6).reshape(P, 6)
            elif solve_kind == "lu":
                dp = jnp.linalg.solve(S, rhs).reshape(P, 6)
            else:  # chol
                L = jnp.linalg.cholesky(S)
                y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
                dp = jax.scipy.linalg.solve_triangular(
                    L.T, y, lower=False).reshape(P, 6)

            dl = dl_of(dp)
            dl = jnp.where(point_valid[:, None], dl, 0.0)
            dRp, dtp = lie.se3_exp(dp)
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
            init = (Rp, tp, pts, jnp.asarray(1e-4), cost0)
            (Rp, tp, pts, _, cost), _ = jax.lax.scan(
                body, init, None, length=n_iters)
            return Rp, tp, pts, cost

        R1, t1, pts1, _ = run_pass(lie.so3_project(R), t, points, obs_valid,
                                   True, iters_huber)
        R1 = lie.so3_project(R1)
        s, _, Xc = chi2_of(R1, t1, pts1)
        keep = obs_valid & (s <= CHI2) & (Xc[..., 2] > 1e-6)
        R2, t2, pts2, cost = run_pass(R1, t1, pts1, keep, False, iters_trimmed)
        return lie.so3_project(R2), t2, pts2, cost

    return jax.jit(partial(ba, iters_huber=5, iters_trimmed=5),
                   static_argnames=())


def timeit_pipe(fn, d, n=10):
    out = fn(d["K"], d["R"], d["t"], d["pts"], d["op"], d["oj"], d["uv"],
             d["osig"], d["ovalid"], d["fixed"], d["pvalid"])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(d["K"], d["R"], d["t"], d["pts"], d["op"], d["oj"], d["uv"],
                 d["osig"], d["ovalid"], d["fixed"], d["pvalid"])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def main():
    print("device:", jax.devices()[0])
    P, M, O = 64, 2048, 8192
    d = make(P, M, O, sort=True)
    variants = [
        ("base  (lu, scatterU, scatterH)", dict(solve_kind="lu", u_kind="scatter", h_kind="scatter")),
        ("onehotU+onehotH+lu            ", dict(solve_kind="lu", u_kind="onehot", h_kind="onehot")),
        ("onehotU+onehotH+chol          ", dict(solve_kind="chol", u_kind="onehot", h_kind="onehot")),
        ("onehotU+onehotH+nosolve       ", dict(solve_kind="none", u_kind="onehot", h_kind="onehot")),
        ("onehotU+onehotH+chol+noT      ", dict(solve_kind="chol", u_kind="onehot", h_kind="onehot", skip_T=True)),
    ]
    ref_out = None
    for name, kw in variants:
        fn = build_ba(P, M, O, **kw)
        ms, out = timeit_pipe(fn, d)
        R2, t2, pts2, cost = out
        if ref_out is None:
            ref_out = out
        dR = float(jnp.abs(R2 - ref_out[0]).max())
        print(f"{name}: {ms:7.2f} ms  cost={float(cost):.1f}  maxdR={dR:.2e}")

    # floor: scan with trivial body at same carry sizes
    def floor(R, t, pts):
        def body(c, _):
            R, t, pts = c
            return (R * 0.999 + 0.001, t + 1e-6, pts * 1.000001), None
        (R, t, pts), _ = jax.lax.scan(body, (R, t, pts), None, length=10)
        return R, t, pts
    ffn = jax.jit(floor)
    out = ffn(d["R"], d["t"], d["pts"]); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = ffn(d["R"], d["t"], d["pts"])
    jax.block_until_ready(out)
    print(f"trivial-scan floor: {(time.perf_counter()-t0)/10*1e3:.2f} ms")


if __name__ == "__main__":
    main()
