"""Profile INSIDE the local-BA solve (VERDICT r4 item #3): which op is the
latency? Times the full two-call LBA at the session shape, then isolated
variants of the LM iteration's suspect ops on the real device.

Run: python tools/prof_lba.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from ceres_mono_orb_slam2_tpu.ops import optim, lie


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def make_problem(P=64, M=2048, O=8192, n_free=16, seed=0):
    rng = np.random.default_rng(seed)
    K = jnp.asarray([[718.856, 0, 607.19], [0, 718.856, 185.2], [0, 0, 1]],
                    jnp.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (P, 1, 1))
    t = rng.normal(0, 0.1, (P, 3)).astype(np.float32)
    pts = rng.normal(0, 2.0, (M, 3)).astype(np.float32)
    pts[:, 2] += 10.0
    op = rng.integers(0, n_free + 8, O).astype(np.int32)
    oj = rng.integers(0, M, O).astype(np.int32)
    Xc = (R[op] @ pts[oj][..., None])[..., 0] + t[op]
    uv = (Xc[:, :2] / Xc[:, 2:3]) * np.array([718.856, 718.856]) + np.array(
        [607.19, 185.2])
    uv = (uv + rng.normal(0, 1.0, uv.shape)).astype(np.float32)
    ow = np.ones(O, np.float32)
    ovalid = np.ones(O, bool)
    fixed = np.ones(P, bool)
    fixed[:n_free] = False
    fixed[0] = True
    pvalid = np.ones(M, bool)
    return (K, jnp.asarray(R), jnp.asarray(t), jnp.asarray(pts),
            jnp.asarray(op), jnp.asarray(oj), jnp.asarray(uv),
            jnp.asarray(ow), jnp.asarray(ovalid), jnp.asarray(fixed),
            jnp.asarray(pvalid))


def main():
    print("device:", jax.devices()[0])
    K, R, t, pts, op, oj, uv, ow, ovalid, fixed, pvalid = make_problem()
    P, M, O = R.shape[0], pts.shape[0], op.shape[0]
    print(f"shape P={P} M={M} O={O}")

    ba55 = jax.jit(lambda *a: optim.bundle_adjustment(
        *a, iters_huber=5, iters_trimmed=5))
    ba05 = jax.jit(lambda *a: optim.bundle_adjustment(
        *a, iters_huber=0, iters_trimmed=5))
    args = (K, R, t, pts, op, oj, uv, ow, ovalid, fixed, pvalid)
    ms55 = timeit(ba55, *args)
    ms05 = timeit(ba05, *args)
    print(f"bundle_adjustment 5+5: {ms55:.2f} ms   0+5: {ms05:.2f} ms  "
          f"(total per LBA = {ms55 + ms05:.2f} ms, {(ms55 + ms05) / 15:.2f} ms/LM-iter)")

    # ---- isolated suspects, all at the same shape -------------------------
    free = ~fixed
    delta = jnp.sqrt(5.991)

    def residual_parts(Rp, tp):
        Xc = (Rp[op] @ pts[oj][..., None])[..., 0] + tp[op]
        r = uv - optim._project(K, Xc)
        w = ow
        Jp = optim._proj_jacobian(K, Xc)
        A = -jnp.concatenate([Jp, -Jp @ lie.hat(Xc)], axis=-1)
        B = -(Jp @ Rp[op])
        return w, r, A, B

    w, r, A, B = jax.jit(residual_parts)(R, t)
    wA = w[:, None, None] * A
    Wblk = jnp.einsum("oik,oil->okl", wA, B)

    def f_scatters(wA, B, r, w):
        Hpp = jnp.zeros((P, 6, 6)).at[op].add(jnp.einsum("oik,oil->okl", wA, A))
        Hll = jnp.zeros((M, 3, 3)).at[oj].add(
            jnp.einsum("oik,oil->okl", w[:, None, None] * B, B))
        bp = jnp.zeros((P, 6)).at[op].add(-jnp.einsum("oik,oi->ok", wA, r))
        bl = jnp.zeros((M, 3)).at[oj].add(
            -jnp.einsum("oik,oi->ok", w[:, None, None] * B, r))
        return Hpp, Hll, bp, bl

    print(f"H/b scatter-adds:        {timeit(jax.jit(f_scatters), wA, B, r, w):.3f} ms")

    def f_uscatter(Wblk):
        return jnp.zeros((M, P, 6, 3)).at[oj, op].add(Wblk)

    print(f"U (M,P,6,3) scatter:     {timeit(jax.jit(f_uscatter), Wblk):.3f} ms")

    def f_u_onehot(Wblk):
        oh_p = jax.nn.one_hot(op, P, dtype=Wblk.dtype)  # (O, P)
        oh_m = jax.nn.one_hot(oj, M, dtype=Wblk.dtype)  # (O, M)
        Wf = Wblk.reshape(O, 18)
        WP = Wf[:, None, :] * oh_p[:, :, None]  # (O, P, 18)
        U = jnp.einsum("om,opk->mpk", oh_m, WP)  # (M, P, 18)
        return U.reshape(M, P, 6, 3)

    print(f"U via one-hot matmul:    {timeit(jax.jit(f_u_onehot), Wblk):.3f} ms")

    U = jax.jit(f_uscatter)(Wblk)
    Hll = jnp.zeros((M, 3, 3)).at[oj].add(
        jnp.einsum("oik,oil->okl", w[:, None, None] * B, B))
    Hll_inv = optim._inv3x3(Hll + 1e-3 * jnp.eye(3))

    def f_schur(U, Hll_inv):
        T = jnp.einsum("mpik,mkl->mpil", U, Hll_inv)
        T2 = T.transpose(1, 2, 0, 3).reshape(P * 6, M * 3)
        U2 = U.transpose(1, 2, 0, 3).reshape(P * 6, M * 3)
        return -T2 @ U2.T

    S0 = jax.jit(f_schur)(U, Hll_inv)
    print(f"Schur product:           {timeit(jax.jit(f_schur), U, Hll_inv):.3f} ms")

    Hpp = jnp.zeros((P, 6, 6)).at[op].add(jnp.einsum("oik,oil->okl", wA, A))
    S = S0.reshape(P, 6, P, 6).at[jnp.arange(P), :, jnp.arange(P), :].add(
        Hpp + 0.1 * jnp.eye(6)).reshape(P * 6, P * 6)
    free6 = jnp.repeat(free, 6)
    S = jnp.where(free6[:, None] & free6[None, :], S, 0.0)
    S = S + jnp.where(free6, 0.0, 1.0) * jnp.eye(P * 6)
    rhs = jnp.ones(P * 6)

    def f_lu(S, rhs):
        return jnp.linalg.solve(S, rhs)

    def f_chol(S, rhs):
        L = jnp.linalg.cholesky(S)
        y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

    def f_cg(S, rhs):
        diag = jnp.diagonal(S)
        Minv = 1.0 / diag

        def body(c, _):
            x, rr, p, rz = c
            Sp = S @ p
            alpha = rz / jnp.dot(p, Sp)
            x = x + alpha * p
            rr = rr - alpha * Sp
            z = Minv * rr
            rz2 = jnp.dot(rr, z)
            p = z + (rz2 / rz) * p
            return (x, rr, p, rz2), None

        x0 = jnp.zeros_like(rhs)
        z0 = Minv * rhs
        (x, _, _, _), _ = jax.lax.scan(
            body, (x0, rhs, z0, jnp.dot(rhs, z0)), None, length=25)
        return x

    print(f"384x384 LU solve:        {timeit(jax.jit(f_lu), S, rhs):.3f} ms")
    print(f"384x384 Cholesky solve:  {timeit(jax.jit(f_chol), S, rhs):.3f} ms")
    print(f"384x384 CG-25 solve:     {timeit(jax.jit(f_cg), S, rhs):.3f} ms")

    # error of CG vs LU
    x_lu = jax.jit(f_lu)(S, rhs)
    x_cg = jax.jit(f_cg)(S, rhs)
    print(f"CG rel err vs LU: {float(jnp.linalg.norm(x_cg - x_lu) / jnp.linalg.norm(x_lu)):.2e}")


if __name__ == "__main__":
    main()
