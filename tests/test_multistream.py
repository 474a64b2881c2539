"""Batched multi-stream mode (BASELINE.json 'batched ORB + BA'): batched
results must equal per-stream sequential results (SURVEY §4's prescribed
'distributed test' analogue for a system with no multi-node story)."""

import numpy as np
import jax.numpy as jnp

from ceres_mono_orb_slam2_tpu.ops import optim
from ceres_mono_orb_slam2_tpu.parallel.multistream import make_multistream_local_ba


def _make_problem(rng, P=4, M=120, O=600):
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)
    pts_gt = np.stack([rng.uniform(-3, 3, M), rng.uniform(-2, 2, M), rng.uniform(4, 10, M)], -1)
    R = np.tile(np.eye(3, dtype=np.float32), (P, 1, 1))
    t = np.stack([np.array([0.3 * i, 0, 0], np.float32) for i in range(P)])
    op = rng.integers(0, P, O).astype(np.int32)
    oj = rng.integers(0, M, O).astype(np.int32)
    Xc = np.einsum("oij,oj->oi", R[op], pts_gt[oj]) + t[op]
    uv = np.stack([500 * Xc[:, 0] / Xc[:, 2] + 320, 500 * Xc[:, 1] / Xc[:, 2] + 240], -1)
    uv = (uv + rng.normal(0, 0.4, uv.shape)).astype(np.float32)
    pts0 = (pts_gt + rng.normal(0, 0.1, pts_gt.shape)).astype(np.float32)
    fixed = np.zeros(P, bool)
    fixed[0] = True
    return (K, R, t, pts0, op, oj, uv, np.ones(O, np.float32),
            np.ones(O, bool), fixed, np.ones(M, bool))


def test_batched_local_ba_matches_sequential(rng):
    S = 3
    probs = [_make_problem(np.random.default_rng(100 + s)) for s in range(S)]
    K = jnp.asarray(probs[0][0])

    def stack(i):
        return jnp.asarray(np.stack([p[i] for p in probs]))

    batched = make_multistream_local_ba()
    res_b = batched(K, stack(1), stack(2), stack(3), stack(4), stack(5),
                    stack(6), stack(7), stack(8), stack(9), stack(10))

    for s in range(S):
        p = probs[s]
        res_s = optim.bundle_adjustment(
            K, *[jnp.asarray(x) for x in p[1:]], iters_huber=5, iters_trimmed=10)
        # same optimum: camera centers and point clouds agree closely
        cb = np.einsum("pij,pj->pi", np.asarray(res_b.R[s]).transpose(0, 2, 1),
                       -np.asarray(res_b.t[s]))
        cs = np.einsum("pij,pj->pi", np.asarray(res_s.R).transpose(0, 2, 1),
                       -np.asarray(res_s.t))
        assert np.abs(cb - cs).max() < 5e-3, np.abs(cb - cs).max()
        assert np.abs(np.asarray(res_b.points[s]) - np.asarray(res_s.points)).max() < 2e-2
